"""int16 inter-stage HBM format for the fused pipeline (cfg.interstage_i16).

The chain's kernels are stream+compute ADDITIVE on this chip (docs/PERF.md
round-3 overlap note), so halving an intermediate's bytes buys its stream
time directly.  The big intermediates and their fixed-point formats:

  fm_demod  [C, B/4]  K1 -> K2   FM_SCALE = 2^15, values in (-0.86, 0.86)
                                 (|wrap(dtheta)| <= pi times the 0.2716
                                 discriminator gain, frontend disc_scale)
  re/im     [C, B/8]  K2 -> K3   IQ_SCALE = 2^14, analytic planes; the LPF
                                 cascade keeps |x| well under 2 for u8-
                                 derived baseband (clip guards the edge)
  theta     [C, B/8]  K2 -> PLL  PH_SCALE = 2^16, cycles in [-0.5, 0.5]
  dt        [C, B/8]  PLL -> K3  PH_SCALE (same domain)

Quantization noise: phases ~2^-17 cycles avg (~-96 dB); planes step 2^-14
(~-85 dB below the +-2 full scale).  Hardware golden gate for the composed
lens: FMTPU_GOLDEN_I16=1 tools/golden_tpu.py.

All converts run IN-KERNEL on tiles already resident in VMEM; Mosaic has no
direct 16-bit <-> f32 cast, so the hop goes through int32 (same as the int8
ingest path).
"""

from __future__ import annotations

import jax.numpy as jnp

FM_SCALE = 32768.0   # fm_demod (front end -> mid-end)
IQ_SCALE = 16384.0   # analytic-signal planes (mid-end -> extract)
PH_SCALE = 65536.0   # phases in cycles (theta / dt)


def q_i16(x, scale: float):
    """f32 -> int16 at the given fixed-point scale (round, saturate)."""
    return jnp.clip(
        jnp.round(x * jnp.float32(scale)), -32767.0, 32767.0
    ).astype(jnp.int16)


def dq_i16(x, scale: float):
    """int16 -> f32 (via int32: Mosaic has no direct 16-bit -> f32 cast)."""
    return x.astype(jnp.int32).astype(jnp.float32) * jnp.float32(1.0 / scale)
