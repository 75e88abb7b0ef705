"""Bisect which program construct trips the ~28ms sync-latency floor.

Usage: python scripts/probe_bisect.py MODE
Runs the MODE candidate program once, then times a trivial jit; prints both.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

mode = sys.argv[1]

one = jnp.ones((8, 8), jnp.float32)
f_triv = jax.jit(lambda x: x + 1.0)
f_triv(one).block_until_ready()


def t(label, fn, n=8):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    print(f"{mode:14s} {label:18s} med={np.median(ts)*1e3:8.2f}ms", flush=True)


t("trivial-before", lambda: f_triv(one).block_until_ready())

rng = np.random.default_rng(0)
dist = jnp.asarray(rng.uniform(0, 256, (1024, 1024)), jnp.float32)
mask = jnp.asarray(rng.uniform(0, 1, (1024, 1024)) < 0.05)
idx = jnp.asarray(rng.integers(0, 1024, (1024,)), np.int32)

if mode == "where_argmin":
    f = jax.jit(lambda d, m: jnp.argmin(jnp.where(m, d, 1e9), axis=1))
    f(dist, mask).block_until_ready()
elif mode == "argmin_and_min":
    def g(d, m):
        dd = jnp.where(m, d, 1e9)
        return jnp.argmin(dd, axis=1), jnp.min(dd, axis=1)
    f = jax.jit(g)
    jax.block_until_ready(f(dist, mask))
elif mode == "onehot_bool":
    f = jax.jit(lambda i, d: jnp.where(
        jax.nn.one_hot(i, 1024, dtype=jnp.bool_), 1e9, d))
    f(idx, dist).block_until_ready()
elif mode == "tuple_i32":
    f = jax.jit(lambda d: (jnp.argmin(d, axis=1).astype(jnp.int32),
                           jnp.min(d, axis=1)))
    jax.block_until_ready(f(dist))
elif mode == "scatter_min":
    f = jax.jit(lambda i, d: jnp.full((1024,), 1e9).at[i].min(d[:, 0]))
    f(idx, dist).block_until_ready()
elif mode == "big_io":
    # Just move a few MB back: does a large D2H trip it?
    f = jax.jit(lambda d: d * 2.0)
    np.asarray(f(dist))
elif mode == "none":
    pass
else:
    raise SystemExit(f"unknown mode {mode}")

t("trivial-after", lambda: f_triv(one).block_until_ready())
