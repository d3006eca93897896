"""Block-level automatic gain control.

Parity: ``AGC_Filter`` (``src/dsp/agc.h:6-31``): one gain update per block —
measure average power, first-order-track the gain toward
sqrt(target_power / avg_power) with beta = 0.2, then scale the whole block by
the *updated* gain.  Within a block this is fully parallel; only the scalar
gain is carried between blocks.
"""

from __future__ import annotations

import jax.numpy as jnp


def agc_init_state(channels: int) -> jnp.ndarray:
    """Initial gain 0.1 per channel (``agc.h:10``)."""
    return jnp.full((channels,), 0.1, dtype=jnp.float32)


def _agc_gain(gain, avg_power, target_power, beta):
    # Guard: on silence (e.g. the zero warm-up halo of time-shard 0) hold the
    # gain instead of driving it to inf/NaN — the reference never sees zero
    # input so it has no such branch.
    safe_power = jnp.maximum(avg_power, jnp.float32(1e-20))
    target_gain = jnp.sqrt(jnp.float32(target_power) / safe_power)
    return jnp.where(
        avg_power > jnp.float32(1e-12),
        gain + jnp.float32(beta) * (target_gain - gain),
        gain,
    )


def agc_update_gain(
    gain: jnp.ndarray,
    xp,
    target_power: float = 1.0,
    beta: float = 0.2,
) -> jnp.ndarray:
    """Track the gain state WITHOUT applying it (one fused reduction, no
    scaling pass).  Used where the downstream consumer is amplitude-invariant
    — the pilot PLL's phase detector satisfies atan2(g*im, g*re) == atan2(im,
    re) for g > 0, so scaling the pilot is a mathematical no-op there; the
    gain state still evolves exactly as ``AGC_Filter`` (agc.h:6-31) for
    checkpoint/tap parity."""
    xr, xi = xp
    avg_power = jnp.mean(xr * xr + xi * xi, axis=-1)
    return _agc_gain(gain, avg_power, target_power, beta)


def agc_process_p(
    gain: jnp.ndarray,
    xp,
    target_power: float = 1.0,
    beta: float = 0.2,
):
    """Plane-tuple variant: xp = (re, im) f32. Returns (new_gain, (yr, yi))."""
    xr, xi = xp
    avg_power = jnp.mean(xr * xr + xi * xi, axis=-1)
    new_gain = _agc_gain(gain, avg_power, target_power, beta)
    g = new_gain[:, None]
    return new_gain, (xr * g, xi * g)


def agc_process(
    gain: jnp.ndarray,
    x: jnp.ndarray,
    target_power: float = 1.0,
    beta: float = 0.2,
):
    """x: [C, N] complex. Returns (new_gain [C], y [C, N])."""
    avg_power = jnp.mean(x.real**2 + x.imag**2, axis=-1)  # [C]
    new_gain = _agc_gain(gain, avg_power, target_power, beta)
    return new_gain, x * new_gain[:, None]
