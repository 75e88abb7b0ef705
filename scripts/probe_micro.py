"""Micro-time individual matching/pose-opt pieces on the TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

from orb_slam_free_space_carving_tpu.ops import matching
from orb_slam_free_space_carving_tpu.ops.orb import unpack_bits


def timeit(label, fn, n=20):
    t0 = time.perf_counter()
    fn()
    print(f"{label:30s} 1st {time.perf_counter()-t0:7.2f}s", flush=True)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts = np.array(ts) * 1e3
    print(f"{label:30s} med={np.median(ts):8.2f}ms min={ts.min():8.2f}ms",
          flush=True)


rng = np.random.default_rng(0)
d_a = jnp.asarray(rng.integers(0, 255, (1024, 32), np.uint8))
d_b = jnp.asarray(rng.integers(0, 255, (1024, 32), np.uint8))
a_bits = unpack_bits(d_a)
b_bits = unpack_bits(d_b)
dist = jnp.asarray(rng.uniform(0, 256, (1024, 1024)), jnp.float32)
mask = jnp.asarray(rng.uniform(0, 1, (1024, 1024)) < 0.05)
uv_a = jnp.asarray(rng.uniform(0, 640, (1024, 2)), jnp.float32)
uv_b = jnp.asarray(rng.uniform(0, 640, (1024, 2)), jnp.float32)

f_unpack = jax.jit(lambda d: unpack_bits(d))
timeit("unpack_bits", lambda: f_unpack(d_a).block_until_ready())

f_mm = jax.jit(lambda a, b: jnp.dot(a, b.T, preferred_element_type=jnp.float32))
timeit("bf16 matmul 1024x256x1024",
       lambda: f_mm(a_bits, b_bits).block_until_ready())

f_ham = jax.jit(matching.hamming_matrix)
timeit("hamming_matrix", lambda: f_ham(d_a, d_b).block_until_ready())

f_am = jax.jit(lambda d: jnp.argmin(d, axis=1))
timeit("argmin rows", lambda: f_am(dist).block_until_ready())

f_wm = jax.jit(lambda a, b: matching.window_mask(a, b, 15.0))
timeit("window_mask", lambda: f_wm(uv_a, uv_b).block_until_ready())

f_masked = jax.jit(lambda d, m: matching.masked_match(d, m, 100.0, 0.9))
timeit("masked_match(ratio)",
       lambda: jax.block_until_ready(f_masked(dist, mask)))

f_masked2 = jax.jit(lambda d, m: matching.masked_match(d, m, 100.0, None))
timeit("masked_match(no ratio)",
       lambda: jax.block_until_ready(f_masked2(dist, mask)))

idx = jnp.asarray(rng.integers(-1, 1024, (1024,)), jnp.int32)
best = jnp.asarray(rng.uniform(0, 100, (1024,)), jnp.float32)
f_dd = jax.jit(lambda i, b: matching._dedup_targets(i, b, 1024))
timeit("dedup_targets", lambda: f_dd(idx, best).block_until_ready())

onehot = jax.jit(lambda i, d: jnp.where(
    jax.nn.one_hot(i, 1024, dtype=jnp.bool_), 1e9, d))
timeit("one_hot where",
       lambda: onehot(jnp.abs(idx), dist).block_until_ready())

# Pose-opt pieces.
from orb_slam_free_space_carving_tpu.ops import pose_opt
intr = jnp.asarray([517.3, 516.5, 318.6, 255.3, 0, 0, 0, 0, 0], jnp.float32)
pose0 = jnp.asarray([0, 0, 0, 1, 0, 0, 0], jnp.float32)
pts = jnp.asarray(rng.uniform(-2, 2, (1024, 3)), jnp.float32)
uv = jnp.asarray(rng.uniform(0, 480, (1024, 2)), jnp.float32)
is2 = jnp.ones(1024, jnp.float32)
mk = jnp.ones(1024, bool)

f_rj = jax.jit(lambda p: pose_opt._residual_jacobian(p, pts, uv, intr))
timeit("residual_jacobian 1024", lambda: jax.block_until_ready(f_rj(pose0)))

f_gn1 = jax.jit(lambda p: pose_opt._gn_rounds(
    p, pts, uv, is2, mk, intr, chi2_th=5.991, rounds=1, iterations=10,
    robust_last_round=False))
timeit("GN 1 round x10", lambda: jax.block_until_ready(f_gn1(pose0)))

f_gn4 = jax.jit(lambda p: pose_opt._gn_rounds(
    p, pts, uv, is2, mk, intr, chi2_th=5.991, rounds=4, iterations=10,
    robust_last_round=False))
timeit("GN 4 rounds x10", lambda: jax.block_until_ready(f_gn4(pose0)))

# Solve variants inside one GN-like loop body.
H6 = jnp.asarray(rng.normal(size=(6, 6)), jnp.float32)
H6 = H6 @ H6.T + 6 * jnp.eye(6)
b6 = jnp.asarray(rng.normal(size=(6,)), jnp.float32)


def loop40(body):
    def f(h, b):
        def step(_, x):
            return body(h, b + x[:1] * 0)
        return jax.lax.fori_loop(0, 40, step, b)
    return jax.jit(f)


f_lu = loop40(lambda h, b: jnp.linalg.solve(h, b))
timeit("40x solve6 LU", lambda: f_lu(H6, b6).block_until_ready())

f_cho = loop40(lambda h, b: jax.scipy.linalg.cho_solve(
    (jnp.linalg.cholesky(h), True), b))
timeit("40x solve6 chol", lambda: f_cho(H6, b6).block_until_ready())
