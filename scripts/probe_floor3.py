"""Floor probe 3: scalar syncs, async copies, decay, and H2D."""

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


def lat(n=6):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        f_triv(one).block_until_ready()
        ts.append(time.perf_counter() - t0)
    return np.median(ts) * 1e3


print(f"{mode:16s} before: {lat():7.2f}ms", flush=True)

f_sum = jax.jit(lambda x: jnp.sum(x))
s = f_sum(one)
s.block_until_ready()

if mode == "scalar_int":
    _ = int(s)
elif mode == "scalar_int_x5":
    for _ in range(5):
        _ = int(f_sum(one))
elif mode == "async_then_int":
    s.copy_to_host_async()
    time.sleep(0.01)
    _ = int(s)
elif mode == "async_only":
    s.copy_to_host_async()
    time.sleep(0.01)
elif mode == "h2d_4mb":
    x = jnp.asarray(np.ones((1024, 1024), np.float32))
    x.block_until_ready()
elif mode == "decay":
    _ = int(s)
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < 20:
        print(f"t+{time.perf_counter()-t0:5.1f}s lat={lat(3):7.2f}ms",
              flush=True)
        time.sleep(1.0)
    raise SystemExit
elif mode == "jnp_scalar_np":
    _ = np.asarray(s)

print(f"{mode:16s} after:  {lat():7.2f}ms", flush=True)
