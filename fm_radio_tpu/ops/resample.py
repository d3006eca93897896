"""Audio-rate conversion and mixing.

Parity:
  * :func:`linear_resample` — the linear-interpolation rate converter of
    ``Resampled_PCM_Player`` (``src/audio/resampled_pcm_player.cpp:37-54``):
    output i samples input at j = i * M/N with 2-point interpolation.
    Fully vectorized (a gather + lerp — no loop).
  * :func:`mix_sources` — ``AudioMixer::UpdateMixer``
    (``src/audio/audio_mixer.cpp:33-80``): sum of sources scaled by
    gain / log10(10 * n_sources), clamped to [-1, 1].
  * :func:`polyphase_upsample` in ops/fir.py covers the reference's
    (unused) PolyphaseUpsampler.
"""

from __future__ import annotations

import jax.numpy as jnp


def linear_resample(x: jnp.ndarray, n_out: int) -> jnp.ndarray:
    """Resample last-but-one axis (frames) of [..., N, C] to [..., n_out, C]
    with the reference's 2-point linear interpolation and edge-hold."""
    n_in = x.shape[-2]
    step = n_in / n_out
    j = jnp.arange(n_out, dtype=jnp.float32) * jnp.float32(step)
    j0 = jnp.floor(j).astype(jnp.int32)
    j1 = jnp.minimum(j0 + 1, n_in - 1)
    k = (j - j0.astype(jnp.float32))[..., None]
    return x[..., j0, :] * (1.0 - k) + x[..., j1, :] * k


def mix_sources(sources: jnp.ndarray, output_gain: float = 1.0) -> jnp.ndarray:
    """sources: [S, N, C] -> [N, C]: sum with log-of-count scaling + clamp
    (audio_mixer.cpp:61-80)."""
    s = sources.shape[0]
    scale = jnp.float32(output_gain) / jnp.log10(jnp.float32(s * 10.0))
    mixed = jnp.sum(sources, axis=0) * scale
    return jnp.clip(mixed, -1.0, 1.0)
