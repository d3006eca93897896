"""Feed-forward FIR ops: streaming FIR, polyphase decimator, Hilbert transform.

TPU-first formulation: instead of the reference's per-output SIMD dot products
(``fir_filter.h:90-102``, ``polyphase_filter.h:190-202``), each filter is a
feature-contraction convolution — the polyphase decimator reshapes the padded
input into ``M`` phase lanes and contracts an ``(M, K)`` kernel, which XLA
lowers to an MXU matmul of shape ``(N, M*K)``.  Cross-block continuity is an
explicit carried tail of ``(K-1)*M`` samples (the overlap-save state), which is
also the halo exchanged between time shards.

Semantics parity: identical to ``FIR_Filter::process`` (``fir_filter.h:30-57``),
``PolyphaseDownsampler::process`` (``polyphase_filter.h:36-64``) and
``Hilbert_FIR_Filter::process`` (``hilbert_fir_filter.h:25-46``), including the
head/tail history handling at block boundaries (verified by streaming-vs-oracle
unit tests).

All arrays are ``[C, T]`` (channel-major); taps are real float32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_DN = ("NCH", "OIH", "NCH")


def _conv_mxu(lanes: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """out[b, i] = sum_{p,k} lanes[b, p, i+k] * kernel[p, k].

    lanes: [B, P, W] float32; kernel: [P, K] float32 -> [B, W-K+1] float32.
    """
    out = jax.lax.conv_general_dilated(
        lanes,
        kernel[None, :, :],  # [O=1, I=P, K]
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=_DN,
        preferred_element_type=jnp.float32,
        # Full f32 accumulation on the MXU (bf16x3 passes).  Default precision
        # truncates to bf16, which is far below audio-SNR requirements.
        precision=jax.lax.Precision.HIGHEST,
    )
    return out[:, 0, :]


def _banded_matrix(w: jnp.ndarray, m: int, no: int) -> jnp.ndarray:
    """Banded tap matrix A[j*m + k, j] = w[k] so that a window @ A yields
    ``no`` consecutive decimated-correlation outputs in one MXU matmul."""
    nn = w.shape[0]
    width = (no - 1) * m + nn
    rows = jnp.arange(width)[:, None]
    cols = jnp.arange(no)[None, :]
    k = rows - cols * m
    valid = (k >= 0) & (k < nn)
    return jnp.where(valid, jnp.take(w, jnp.clip(k, 0, nn - 1)), 0.0).astype(
        jnp.float32
    )


def _tile_windows(lanes: jnp.ndarray, m: int, nn: int, no: int, t: int) -> jnp.ndarray:
    """[B, T_pad] -> [B, t, W] overlapping windows, W = no*m + nn - m, with
    window ``i`` starting at sample ``i*no*m``.  Built from two reshapes (the
    overlap is only nn - m samples) — no gather."""
    assert nn - m <= no * m, "tile too small for tap overlap"
    b = lanes.shape[0]
    body_len = t * no * m
    pad = body_len + no * m - lanes.shape[-1]
    if pad > 0:
        lanes = jnp.pad(lanes, ((0, 0), (0, pad)))
    body = lanes[:, :body_len].reshape(b, t, no * m)
    if nn == m:
        return body
    tail = lanes[:, no * m : no * m + body_len].reshape(b, t, no * m)
    return jnp.concatenate([body, tail[:, :, : nn - m]], axis=-1)


def _apply_real_taps(x_pad: jnp.ndarray, w: jnp.ndarray, m: int) -> jnp.ndarray:
    """Decimating correlation y[c, i] = sum_k w[k] * x_pad[c, i*m + k].

    ``x_pad``: [C, T_pad] real or complex; ``w``: [NN] float32 with NN = m*K
    (for m == 1 this is a plain stride-1 FIR).  Complex inputs are split into
    real/imag batch lanes since the taps are real.

    TPU formulation: tiles of ``no`` consecutive outputs are computed as one
    [B*t, W] x [W, no] matmul against a banded tap matrix (W = no*m + nn - m).
    The reference computes each output as an independent SIMD dot product
    (``polyphase_filter.h:190-202``); a direct translation (conv with one
    output feature) lowers to an N=1 matvec that starves the MXU — the banded
    form trades ~(W/NN)x redundant FLOPs for full MXU occupancy and a single
    pass over HBM, which is >5x faster end-to-end.
    """
    nn = w.shape[0]
    assert nn % m == 0
    kp = nn // m
    c, t_pad = x_pad.shape
    assert (t_pad - (kp - 1) * m) % m == 0
    n_out = t_pad // m - kp + 1

    if jnp.iscomplexobj(x_pad):
        lanes = jnp.concatenate([x_pad.real, x_pad.imag], axis=0)
    else:
        lanes = x_pad.astype(jnp.float32)

    if n_out < 16:
        # tiny blocks: plain conv is cheaper than the tiling machinery
        kernel = w.reshape(kp, m).T.astype(jnp.float32)  # [m, K]
        fr = lanes.reshape(lanes.shape[0], t_pad // m, m).transpose(0, 2, 1)
        y = _conv_mxu(fr, kernel)
    else:
        no = max(min(128, n_out), kp - 1)  # tile must cover the tap overlap
        t = -(-n_out // no)  # ceil
        xw = _tile_windows(lanes, m, nn, no, t)  # [B, t, W]
        a = _banded_matrix(w, m, no)  # [W, no]
        y = jnp.einsum(
            "btw,wj->btj",
            xw,
            a,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(lanes.shape[0], t * no)[:, :n_out]

    if jnp.iscomplexobj(x_pad):
        return jax.lax.complex(y[:c], y[c:])
    return y


# ---------------------------------------------------------------------------
# Plain streaming FIR (stride 1)
# ---------------------------------------------------------------------------


def fir_init_state(channels: int, num_taps: int, dtype=jnp.float32) -> jnp.ndarray:
    """Carried history of the last ``num_taps - 1`` input samples, zeros at
    start (``fir_filter.h:24-28``)."""
    return jnp.zeros((channels, num_taps - 1), dtype=dtype)


def fir_filter(taps, state: jnp.ndarray, x: jnp.ndarray):
    """Streaming FIR: y[n] = sum_j h[j] x[n-j] with carried history.

    Returns ``(new_state, y)`` with ``y.shape == x.shape``.
    """
    taps = jnp.asarray(taps, dtype=jnp.float32)
    x_pad = jnp.concatenate([state.astype(x.dtype), x], axis=-1)
    new_state = x_pad[:, -(taps.shape[0] - 1):]
    y = _apply_real_taps(x_pad, taps[::-1], m=1)
    return new_state, y.astype(x.dtype) if not jnp.iscomplexobj(x) else y


# ---------------------------------------------------------------------------
# Polyphase decimator
# ---------------------------------------------------------------------------


def polyphase_init_state(
    channels: int, factor: int, taps_per_phase: int, dtype=jnp.float32
) -> jnp.ndarray:
    """Carried tail of ``(K-1)*M`` input samples (overlap-save state)."""
    return jnp.zeros((channels, (taps_per_phase - 1) * factor), dtype=dtype)


def polyphase_decimate(taps, state: jnp.ndarray, x: jnp.ndarray, factor: int):
    """Decimate-by-``factor`` FIR: computes only every M-th output of the
    underlying NN = M*K tap filter (``polyphase_filter.h:36-64``).

    ``taps``: [NN] natural-order impulse response; ``x``: [C, N*M].
    Returns ``(new_state, y)`` with ``y``: [C, N].  Output sample ``i`` is the
    filter evaluated with its window ending at input sample ``(i+1)*M - 1``,
    exactly like the reference.
    """
    taps = jnp.asarray(taps, dtype=jnp.float32)
    nn = taps.shape[0]
    assert nn % factor == 0, "taps length must be factor * taps_per_phase"
    hist = (nn // factor - 1) * factor
    assert x.shape[-1] % factor == 0
    x_pad = jnp.concatenate([state.astype(x.dtype), x], axis=-1)
    new_state = x_pad[:, x_pad.shape[-1] - hist:]
    y = _apply_real_taps(x_pad, taps[::-1], m=factor)
    return new_state, y


# ---------------------------------------------------------------------------
# Hilbert transform FIR
# ---------------------------------------------------------------------------


def hilbert_init_state(channels: int, num_taps: int) -> jnp.ndarray:
    return jnp.zeros((channels, num_taps - 1), dtype=jnp.float32)


def hilbert_fir(taps, state: jnp.ndarray, x: jnp.ndarray):
    """Analytic-signal generator (``hilbert_fir_filter.h:25-46``).

    Real part: input delayed by (K-1)/2 samples; imag part: Hilbert FIR.
    ``taps`` from :func:`create_fir_hilbert` (odd length K).  Returns
    ``(new_state, y_complex)``.
    """
    taps = jnp.asarray(taps, dtype=jnp.float32)
    k = taps.shape[0]
    m = (k - 1) // 2
    x_pad = jnp.concatenate([state, x], axis=-1)
    new_state = x_pad[:, -(k - 1):]
    im = _apply_real_taps(x_pad, taps[::-1], m=1)
    re = jax.lax.dynamic_slice_in_dim(x_pad, m, x.shape[-1], axis=-1)
    return new_state, jax.lax.complex(re, im)


# ---------------------------------------------------------------------------
# Polyphase upsampler (parity with PolyphaseUpsampler, polyphase_filter.h:90-185;
# unused by the demod chain but part of the reference's public DSP surface)
# ---------------------------------------------------------------------------


def polyphase_upsample_init_state(
    channels: int, taps_per_phase: int, dtype=jnp.float32
) -> jnp.ndarray:
    return jnp.zeros((channels, taps_per_phase - 1), dtype=dtype)


def polyphase_upsample(taps, state: jnp.ndarray, x: jnp.ndarray, factor: int):
    """Interpolate-by-``factor``: zero-stuff then LPF, computed phase-wise.

    ``taps``: [L*K] natural-order LPF impulse response (will be scaled by L
    like the reference's repacking at ``polyphase_filter.h:112-122``).
    Returns ``(new_state, y)`` with y: [C, N*L].
    """
    taps = jnp.asarray(taps, dtype=jnp.float32) * float(factor)
    nn = taps.shape[0]
    assert nn % factor == 0
    k = nn // factor
    x_pad = jnp.concatenate([state.astype(x.dtype), x], axis=-1)  # [C, N+K-1]
    new_state = x_pad[:, -(k - 1):]

    # Phase p of output i uses taps h[p], h[p+L], ... against the last K inputs.
    # y[i*L + p] = sum_q h_rev_p[q] * x_pad[i + q]  (matches the reference's
    # repacked-coefficient apply at polyphase_filter.h:128-185).
    w = taps[::-1]  # reversed full filter
    if jnp.iscomplexobj(x_pad):
        lanes = jnp.concatenate([x_pad.real, x_pad.imag], axis=0)
    else:
        lanes = x_pad.astype(jnp.float32)
    outs = []
    for p in range(factor):
        # phase p of the output uses taps h[u*L + p]; in reversed-tap
        # coordinates that is w[(L-1-p)::L]
        wp = w[factor - 1 - p :: factor]  # [K]
        y_p = _conv_mxu(lanes[:, None, :], wp[None, :])
        outs.append(y_p)
    y = jnp.stack(outs, axis=-1).reshape(lanes.shape[0], -1)  # interleave
    if jnp.iscomplexobj(x_pad):
        c = x.shape[0]
        return new_state, jax.lax.complex(y[:c], y[c:])
    return new_state, y
