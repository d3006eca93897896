"""Channelizer kernel decomposition at the wideband-bench production shape.

The first on-chip wideband measurement (round 5) put the NAIVE channelizer
at ~43 ms per 2^28-sample block — 7x the whole demod chain.  This probe
times the rewritten kernel (kernels/channelizer_pallas.py: capture-packed
block-diag DFT + Karatsuba + in-kernel i8 bridge) and isolates its engines:

  i8        production: packed-word ingest -> int8 bridge out, splits=3
  i8:s2     splits=2 (single-bf16 DFT matrices): isolates the split cost
  f32       f32 plane output (4x the output bytes): isolates the bridge
  i8:k1     taps_per_phase=1 (phase filter degenerates to one multiply):
            full - k1 ~= the VPU phase-filter cost
  xla       the vmapped XLA fallback form, i8 bridge (for contrast)

Usage: python -m tools.wb_probe [channels=2048] [m=32]
       FMTPU_INTERPRET=1 ... (CPU plumbing check at tiny shape)
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from fm_radio_tpu.kernels.channelizer_pallas import channelize_pallas
from fm_radio_tpu.parallel.channelizer import (
    channelize_batch_p,
    make_channelizer_taps,
)

_INTERPRET = os.environ.get("FMTPU_INTERPRET") == "1"


def time_variant(fn, x, st, iters, repeats=3):
    @jax.jit
    def run(x0, st0):
        def body(i, carry):
            st, acc = carry
            xb, st = jax.lax.optimization_barrier((x0, st))
            st, y = fn(st, xb)
            leaf = jax.tree.leaves(y)[0]
            return st, acc + leaf[..., 0, 0].astype(jnp.float32).sum()

        _, acc = jax.lax.fori_loop(0, iters, body, (st0, jnp.float32(0.0)))
        return acc

    float(np.asarray(run(x, st)))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(np.asarray(run(x, st)))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    channels = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    if _INTERPRET:
        channels = min(channels, 4 * m)
    nw = channels // m
    block = (1 << 14) if _INTERPRET else min(1 << 20, (1 << 28) // channels)
    t = m * block
    iters = 2 if _INTERPRET else int(os.environ.get("FMTPU_PROBE_ITERS", "24"))

    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (nw, t, 2)).astype(np.uint8)
    from fm_radio_tpu.utils.transfer import pack_iq_u8

    x = jnp.asarray(pack_iq_u8(u8))
    gb = nw * t * 4 / 1e9
    print(f"# wideband channelizer [W={nw} x m={m} x B={block}] "
          f"input={gb:.2f} GB/pass iters={iters}", flush=True)

    taps16 = jnp.asarray(make_channelizer_taps(m, 16))
    taps1 = jnp.asarray(make_channelizer_taps(m, 1))
    z = jnp.zeros((nw, 15 * m), jnp.float32)
    z1 = jnp.zeros((nw, 0), jnp.float32)

    variants = {
        "i8": lambda st, xb: channelize_pallas(
            taps16, st, xb, m, interpret=_INTERPRET, out="i8", splits=3),
        "i8:s2": lambda st, xb: channelize_pallas(
            taps16, st, xb, m, interpret=_INTERPRET, out="i8", splits=2),
        "f32": lambda st, xb: channelize_pallas(
            taps16, st, xb, m, interpret=_INTERPRET, out="f32", splits=3),
        "i8:k1": lambda st, xb: channelize_pallas(
            taps1, st, xb, m, interpret=_INTERPRET, out="i8", splits=3),
        "xla": lambda st, xb: channelize_batch_p(taps16, st, xb, m, out="i8")
        if _INTERPRET else _xla_i8(taps16, st, xb, m),
    }

    for name, fn in variants.items():
        st = (z1, z1) if name == "i8:k1" else (z, z)
        try:
            dt = time_variant(fn, x, st, iters)
        except Exception as e:
            print(f"{name:8s} FAIL {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
            continue
        rate = nw * t / dt / 1e9
        print(f"{name:8s} {dt * 1e3:8.3f} ms/pass  {rate:6.1f} Gsps",
              flush=True)


def _xla_i8(taps, st, xb, m):
    # force the XLA fallback even on TPU (bypass the kernel gate)
    from fm_radio_tpu.parallel.channelizer import _channelize_xla_p

    st2, y = jax.vmap(
        lambda s0, s1, xw: _channelize_xla_p(taps, (s0, s1), xw, m)
    )(st[0], st[1], xb)
    inv_m = jnp.float32(1.0 / m)
    q8 = lambda p: jnp.clip(jnp.round(p * inv_m) - 1.0, -128.0,
                            127.0).astype(jnp.int8)
    return st2, jnp.stack([q8(y[0]), q8(y[1])])


if __name__ == "__main__":
    main()
