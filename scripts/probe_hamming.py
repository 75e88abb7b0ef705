"""Probe: Hamming-matrix kernel variants on the real device.

The per-call wall numbers through the TPU tunnel are dominated by the ~2 ms
dispatch floor (BENCH_FUSED_PARTS.json nop = 1.9 ms), so each variant is
timed as K chained iterations inside ONE jitted fori_loop and divided — that
isolates true device time.

Variants:
  bf16    unpack bits -> bf16 matmul (current ops/matching.py)
  int8    unpack bits -> {+1,-1} int8 matmul, hamming = (256 - dot)/2
  xorpop  xor + popcount + reduce (VPU path, no MXU)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

N = M = 1024
K = 50


def bf16_variant(a_u8, b_u8):
    from orb_slam_free_space_carving_tpu.ops.matching import hamming_matrix

    return hamming_matrix(a_u8, b_u8)


def _unpack_pm1(d_u8):
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (d_u8[..., :, None] >> shifts) & jnp.uint8(1)
    bits = bits.reshape(d_u8.shape[:-1] + (256,))
    return (1 - 2 * bits.astype(jnp.int8)).astype(jnp.int8)


def int8_variant(a_u8, b_u8):
    sa = _unpack_pm1(a_u8)
    sb = _unpack_pm1(b_u8)
    dot = jax.lax.dot_general(
        sa, sb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )
    return ((256 - dot) // 2).astype(jnp.float32)


_POP = None


def xorpop_variant(a_u8, b_u8):
    x = jnp.bitwise_xor(a_u8[:, None, :], b_u8[None, :, :])
    # popcount via nibble arithmetic (u8, VPU friendly)
    x = x - ((x >> 1) & 0x55)
    x = (x & 0x33) + ((x >> 2) & 0x33)
    x = (x + (x >> 4)) & 0x0F
    return jnp.sum(x.astype(jnp.int32), axis=-1).astype(jnp.float32)


def time_variant(name, fn, a, b):
    def body(i, carry):
        # rotate input by adding i to keep iterations non-trivially dependent
        out = fn(jnp.bitwise_xor(a, i.astype(jnp.uint8)), b)
        return carry + out[0, 0]

    @jax.jit
    def run():
        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    r = run()
    r.block_until_ready()          # compile + warm
    t0 = time.perf_counter()
    r = run()
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / K
    # single-call wall (includes dispatch floor)
    g = jax.jit(fn)
    g(a, b).block_until_ready()
    t0 = time.perf_counter()
    g(a, b).block_until_ready()
    wall = time.perf_counter() - t0
    print(f"{name:8s}  device={dt*1e3:8.3f} ms/iter   single-call wall={wall*1e3:8.3f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 256, (N, 32), dtype=np.uint8))
    b = jnp.asarray(rng.integers(0, 256, (M, 32), dtype=np.uint8))
    print("platform:", jax.devices()[0].platform, jax.devices()[0].device_kind)
    # correctness cross-check
    r0 = np.asarray(jax.jit(bf16_variant)(a, b))
    r1 = np.asarray(jax.jit(int8_variant)(a, b))
    r2 = np.asarray(jax.jit(xorpop_variant)(a, b))
    print("agree bf16 vs int8:", np.abs(r0 - r1).max(),
          " bf16 vs xorpop:", np.abs(r0 - r2).max())
    for name, fn in [("bf16", bf16_variant), ("int8", int8_variant),
                     ("xorpop", xorpop_variant)]:
        time_variant(name, fn, a, b)


if __name__ == "__main__":
    sys.exit(main())
