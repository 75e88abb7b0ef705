"""Confirm the ~25ms latency floor: trivial op timed repeatedly, interleaved
with a long compile, to see when the floor kicks in."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np


def t(label, fn, n=10):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts = np.array(ts) * 1e3
    print(f"{label:30s} med={np.median(ts):8.2f}ms min={ts.min():8.2f}ms",
          flush=True)


one = jnp.ones((8, 8), jnp.float32)
f_triv = jax.jit(lambda x: x + 1.0)
f_triv(one).block_until_ready()
t("trivial (fresh session)", lambda: f_triv(one).block_until_ready())

# A mid-size program: masked_match WITH ratio (the 73s compile from before,
# now cached) — does merely LOADING/running it trip the floor?
from orb_slam_free_space_carving_tpu.ops import matching
rng = np.random.default_rng(0)
dist = jnp.asarray(rng.uniform(0, 256, (1024, 1024)), jnp.float32)
mask = jnp.asarray(rng.uniform(0, 1, (1024, 1024)) < 0.05)
f_masked = jax.jit(lambda d, m: matching.masked_match(d, m, 100.0, 0.9))
jax.block_until_ready(f_masked(dist, mask))
t("masked_match (cached)", lambda: jax.block_until_ready(f_masked(dist, mask)))

t("trivial (after masked)", lambda: f_triv(one).block_until_ready())

# Back-to-back without sync: amortized?
def chain10():
    for _ in range(10):
        out = f_masked(dist, mask)
    jax.block_until_ready(out)


t("10x masked no-sync chain", chain10, n=5)

def chain10t():
    x = one
    for _ in range(10):
        x = f_triv(x)
    x.block_until_ready()


t("10x trivial no-sync chain", chain10t)
