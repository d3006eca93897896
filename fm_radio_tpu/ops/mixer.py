"""Harmonic PLL mixer: y[n] = x[n] * exp(j*2*pi*(dt[n]*harmonic + offset)).

Parity: ``apply_harmonic_pll_scalar`` (``src/dsp/simd/apply_harmonic_pll.cpp:11-24``)
— used to downconvert the 38 kHz L-R band (harmonic=2) and the 57 kHz RDS band
(harmonic=3) using the pilot NCO phase track ``dt`` (in cycles,
``broadcast_fm_demod.cpp:485-531``).

Note: the reference passes the L-R phase-correction ``offset`` (estimated in
radians at ``broadcast_fm_demod.cpp:496-517``) directly into the cycle-domain
phase here; we replicate that behavior exactly for parity.

This is a pure vector op (5-FMA Chebyshev phasor + complex multiply) that XLA
fuses with the following polyphase decimator's input stage.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fm_radio_tpu.ops.cmath import chebyshev_sine, wrap_cycles


def apply_harmonic_pll_p(dt: jnp.ndarray, xp, harmonic: float, offset):
    """Plane-tuple variant: xp = (re, im) f32. Returns (yr, yi)."""
    offset = jnp.asarray(offset, jnp.float32)
    if offset.ndim == 1:
        offset = offset[:, None]
    xr, xi = xp
    dt_sin = dt * jnp.float32(harmonic) + offset
    dt_cos = wrap_cycles(dt_sin + jnp.float32(0.25))
    dt_sin = wrap_cycles(dt_sin)
    c = chebyshev_sine(dt_cos)
    s = chebyshev_sine(dt_sin)
    return xr * c - xi * s, xr * s + xi * c


def apply_harmonic_pll(dt: jnp.ndarray, x: jnp.ndarray, harmonic: float, offset):
    """dt: [C, N] NCO phase in cycles; x: [C, N] complex; offset: scalar or [C]."""
    yr, yi = apply_harmonic_pll_p(dt, (x.real, x.imag), harmonic, offset)
    return jax.lax.complex(yr, yi)
