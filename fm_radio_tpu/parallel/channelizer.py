"""Polyphase FFT filterbank channelizer: wideband IQ -> M station channels.

New component (no reference analogue — the reference tunes one station per
process).  Feeds the multi-channel configs: a wideband front-end capture at
Fs_wide = M * fs_channel is split into M critically-sampled channels, each
centered on k * fs_channel, which then enter the channel-batched demodulator.

TPU mapping: the polyphase partial filters are the same feature-contraction
conv as the decimator (MXU), and the cross-phase DFT is a single batched FFT
along an axis of length M — both dense, both compiler-friendly.

Math (critically sampled DFT filterbank, h = prototype LPF of length M*K):
    y_k[n] = sum_m exp(+j 2 pi k m / M) * (sum_i h[iM + m] x[nM - iM - m])
i.e. polyphase-filter each input phase, then IFFT across phases.  Channel k
is x mixed down by k*Fs/M and LPF'd to Fs/M, times M (FFT scaling).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fm_radio_tpu.ops.design import create_fir_lpf
from fm_radio_tpu.ops.fir import _conv_mxu


def make_channelizer_taps(
    num_channels: int, taps_per_phase: int = 16, rolloff: float = 0.95
) -> np.ndarray:
    """Prototype LPF: cutoff at the channel Nyquist with early roll-off
    (same policy as the decimators, broadcast_fm_demod.cpp:129)."""
    m, k = num_channels, taps_per_phase
    return create_fir_lpf(m * k, rolloff / m)


def channelizer_init_state(num_channels: int, taps_per_phase: int) -> jnp.ndarray:
    """Carried raw-IQ tail of (K-1)*M samples (created on device — complex
    constants cannot cross the axon host boundary, utils/transfer.py)."""
    n = (taps_per_phase - 1) * num_channels
    return jax.jit(lambda: jnp.zeros((n,), jnp.complex64))()


def channelize(taps, state: jnp.ndarray, x: jnp.ndarray, num_channels: int):
    """x: [T] wideband complex64, T divisible by M.  Returns
    (new_state, y [M, T/M] complex64) — channel k centered at +k*Fs/M
    (wrapping: channels above M/2 are negative frequencies).
    """
    m = num_channels
    taps = jnp.asarray(taps, jnp.float32)
    nn = taps.shape[0]
    k = nn // m
    assert nn == m * k and x.shape[-1] % m == 0

    x_pad = jnp.concatenate([state.astype(x.dtype), x], axis=-1)
    new_state = x_pad[-(k - 1) * m :]
    n_frames = x_pad.shape[-1] // m  # N + K - 1
    n_out = n_frames - (k - 1)

    # frames[j, p] = x_pad[j*M + p].  Output n's window is frames rows
    # n..n+K-1 (ends at x_pad[n*M + NN - 1], same streaming convention as
    # polyphase_decimate).  Pairing window sample m = r*M + p with reversed
    # tap taps_rev[m] = h[NN-1-m]:
    #   z_p[n] = sum_r taps_rev[r*M + p] * frames[n+r, p]
    #   y_k[n] = sum_p z_p[n] * exp(-j*2*pi*k*p/M)   (phase twiddle; the
    #            r*M terms vanish mod M since blocks are multiples of M)
    # which equals LPF(x * exp(-j*2*pi*k*t/M)) decimated by M.
    frames = x_pad.reshape(n_frames, m)
    w = taps[::-1].reshape(k, m)  # w[r, p] = taps_rev[r*M + p]
    # per-phase independent conv: out[p, n] = sum_r lanes[p, n+r] * kernel[p, r]
    lanes_r = frames.real.T  # [M, n_frames]
    lanes_i = frames.imag.T
    lanes = jnp.stack([lanes_r, lanes_i], axis=1)  # [M, 2, n_frames]
    kernel = w.T  # [M, K]
    outs = jax.vmap(
        lambda lane, kern: _conv_mxu(lane[:, None, :], kern[None, :])
    )(lanes, kernel)  # [M, 2, n_out]
    z = jax.lax.complex(outs[:, 0, :], outs[:, 1, :])  # [M, n_out]

    y = jnp.fft.fft(z, axis=0)  # DFT across phases -> channels
    return new_state, y.astype(jnp.complex64)


def channelize_batch(taps, state, x, num_channels):
    """Batched wideband inputs: x [W, T] -> y [W, M, T/M]."""
    return jax.vmap(lambda s, xx: channelize(taps, s, xx, num_channels))(state, x)
