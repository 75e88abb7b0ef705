"""Characterize the D2H-triggered sync-latency floor: size threshold and
whether it decays over time."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

mode = sys.argv[1] if len(sys.argv) > 1 else "sizes"

one = jnp.ones((8, 8), jnp.float32)
f_triv = jax.jit(lambda x: x + 1.0)
f_triv(one).block_until_ready()


def lat(n=6):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        f_triv(one).block_until_ready()
        ts.append(time.perf_counter() - t0)
    return np.median(ts) * 1e3


if mode == "sizes":
    size_kb = int(sys.argv[2])
    n = size_kb * 256  # f32 elements
    x = jnp.ones((n,), jnp.float32)
    x.block_until_ready()
    print(f"{size_kb:6d}KB before: {lat():7.2f}ms", flush=True)
    _ = np.asarray(x)
    print(f"{size_kb:6d}KB after:  {lat():7.2f}ms", flush=True)
elif mode == "decay":
    x = jnp.ones((1024 * 1024,), jnp.float32)  # 4MB
    x.block_until_ready()
    _ = np.asarray(x)
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < 25:
        print(f"t+{time.perf_counter()-t0:5.1f}s lat={lat(3):7.2f}ms",
              flush=True)
        time.sleep(1.5)
elif mode == "d2h_small_after":
    # Is a small device_get ALSO slow once floored?
    x = jnp.ones((1024 * 1024,), jnp.float32)
    x.block_until_ready()
    _ = np.asarray(x)
    y = jnp.ones((256,), jnp.float32)
    y.block_until_ready()
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        _ = np.asarray(f_triv(one))
        ts.append(time.perf_counter() - t0)
    print(f"small D2H after floor: {np.median(ts)*1e3:7.2f}ms", flush=True)
elif mode == "chunked":
    # Does transferring 4MB as 16 x 256KB avoid the floor?
    xs = [jnp.ones((65536,), jnp.float32) for _ in range(16)]
    jax.block_until_ready(xs)
    print(f"before: {lat():7.2f}ms", flush=True)
    for x in xs:
        _ = np.asarray(x)
    print(f"after 16x256KB: {lat():7.2f}ms", flush=True)
