"""Pallas polyphase-FFT channelizer: wideband IQ -> M station channels.

One HBM pass for the whole filterbank (parallel/channelizer.py documents the
math).  The XLA form costs ~13 ms per 16M samples because the K shifted
multiply-adds of the phase filter do not fuse (K full passes over the
signal); here they run over a VMEM-resident frames tile (sublane shifts),
the cross-phase DFT is 4 bf16x3 MXU matmuls against the [M, M] twiddle
matrices (no length-M FFT kernels), and the output tiles are written
TRANSPOSED so the channel-major [M, T/M] layout the demodulator wants costs
nothing extra.

Grid: sequential time tiles of the frame view [T/M, M]; the (K-1)-frame
overlap-save tail carries in VMEM scratch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fm_radio_tpu.kernels.frontend_pallas import _dot3, _split_bf16

_TBF = 16  # carried tail rows (frames); requires K-1 <= _TBF


def _chan_core(
    w_ref, wre_ref, wim_ref,
    yre_ref, yim_ref, out_tail_ref,
    bufr_ref, bufi_ref,
    *, n_t: int, n_tt: int, k: int, interp: bool,
):
    # grid is (W, n_tt): time tiles iterate fastest, so the VMEM tail
    # scratch hands off correctly within one capture and is re-seeded from
    # tail_ref at ti == 0 when the grid steps to the next capture
    ti = pl.program_id(1)

    # z[n, p] = sum_r w[r, p] * frames[n + r, p]; window rows start at
    # _TBF - (k-1) + r (static sublane offsets)
    w = w_ref[...]
    base = _TBF - (k - 1)
    zr = bufr_ref[base : base + n_t, :] * w[0:1, :]
    zi = bufi_ref[base : base + n_t, :] * w[0:1, :]
    for r in range(1, k):
        zr = zr + bufr_ref[base + r : base + r + n_t, :] * w[r : r + 1, :]
        zi = zi + bufi_ref[base + r : base + r + n_t, :] * w[r : r + 1, :]

    # DFT across phases on the MXU: y = z @ (W_re + j W_im), complex product
    wre_hi, wre_lo = _split_bf16(wre_ref[...], interp)
    wim_hi, wim_lo = _split_bf16(wim_ref[...], interp)
    zr_hi, zr_lo = _split_bf16(zr, interp)
    zi_hi, zi_lo = _split_bf16(zi, interp)
    y_re = _dot3(zr_hi, zr_lo, wre_hi, wre_lo) - _dot3(zi_hi, zi_lo, wim_hi, wim_lo)
    y_im = _dot3(zr_hi, zr_lo, wim_hi, wim_lo) + _dot3(zi_hi, zi_lo, wre_hi, wre_lo)

    # channel-major output: transpose in VMEM, not as an XLA pass
    yre_ref[...] = y_re.T
    yim_ref[...] = y_im.T

    bufr_ref[: _TBF] = bufr_ref[n_t :]
    bufi_ref[: _TBF] = bufi_ref[n_t :]

    @pl.when(ti == n_tt - 1)
    def _finish():
        out_tail_ref[0] = bufr_ref[: _TBF]
        out_tail_ref[1] = bufi_ref[: _TBF]


def _chan_kernel(
    fr_ref, fi_ref, tail_ref, w_ref, wre_ref, wim_ref,
    yre_ref, yim_ref, out_tail_ref,
    bufr_ref, bufi_ref,
    *, n_t: int, n_tt: int, k: int, interp: bool,
):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        bufr_ref[: _TBF] = tail_ref[0]
        bufi_ref[: _TBF] = tail_ref[1]

    bufr_ref[_TBF:] = fr_ref[...]
    bufi_ref[_TBF:] = fi_ref[...]
    _chan_core(
        w_ref, wre_ref, wim_ref, yre_ref, yim_ref, out_tail_ref,
        bufr_ref, bufi_ref, n_t=n_t, n_tt=n_tt, k=k, interp=interp,
    )


def _chan_kernel_packed(
    fw_ref, tail_ref, w_ref, wre_ref, wim_ref,
    yre_ref, yim_ref, out_tail_ref,
    bufr_ref, bufi_ref,
    *, n_t: int, n_tt: int, k: int, interp: bool,
):
    # packed u8 IQ words (utils/transfer.pack_iq_u8): w = I*256 + Q, exact
    # integers < 2^16; unpack + recenter in-VMEM (wideband captures are the
    # channelizer's largest stream — half the HBM read of planes)
    @pl.when(pl.program_id(1) == 0)
    def _init():
        bufr_ref[: _TBF] = tail_ref[0]
        bufi_ref[: _TBF] = tail_ref[1]

    from fm_radio_tpu.utils.transfer import unpack_iq_words

    bufr_ref[_TBF:], bufi_ref[_TBF:] = unpack_iq_words(fw_ref[...])
    _chan_core(
        w_ref, wre_ref, wim_ref, yre_ref, yim_ref, out_tail_ref,
        bufr_ref, bufi_ref, n_t=n_t, n_tt=n_tt, k=k, interp=interp,
    )


def _chan_vmem_bytes(n_t: int, m: int) -> int:
    """Scoped-VMEM footprint of one grid step (f32): double-buffered packed
    input + two double-buffered [m, n_t] outputs + two scratch rings + the
    [m, m] DFT matrices (single-buffered: constant index map) + tails.
    The lane axis is budgeted at its VMEM-padded width (multiples of 128)."""
    m_pad = -(-m // 128) * 128
    stream = 2 * n_t * m_pad + 2 * 2 * n_t * m_pad  # in (2x) + 2 outs (2x each)
    scratch = 2 * (_TBF + n_t) * m_pad
    consts = 2 * m * m_pad + (5 * _TBF) * m_pad  # DFT pair + tails/taps
    return 4 * (stream + scratch + consts)


def pick_tile_chan(n_frames: int, m: int) -> int | None:
    """Largest power-of-2 time tile in [256, 2048] dividing n_frames whose
    footprint fits the 16 MB scoped-VMEM budget (with margin); None demotes
    to the XLA path — e.g. m=1024, whose DFT matrices alone are ~8 MB."""
    if m % 8 != 0 or m > 1024:
        return None
    budget = 12 << 20
    n_t = 256
    if n_frames % n_t != 0 or _chan_vmem_bytes(n_t, m) > budget:
        return None
    while (n_t * 2 <= 2048 and n_frames % (n_t * 2) == 0
           and _chan_vmem_bytes(n_t * 2, m) <= budget):
        n_t *= 2
    return n_t


def channelize_pallas(taps, state_p, xp, num_channels: int,
                      interpret: bool = False):
    """Drop-in for channelize_p (same contract) on shapes where
    pick_tile_chan allows; returns (state_p', (y_re, y_im) [M, T/M]).

    ``xp`` may be a SINGLE [T] f32 array of packed u8 IQ words
    (utils/transfer.pack_iq_u8) — unpacked + recentered in-VMEM, halving
    the wideband HBM read.

    BATCHED form (the ``fmtpu stations``-at-scale / wideband-bench path): a
    leading capture axis W on both the input ([W, T] packed, or (re, im)
    each [W, T]) and the state ([W, (K-1)*M] planes) runs W independent
    wideband streams through ONE kernel — grid (W, time tiles), the VMEM
    tail scratch re-seeded per capture — and returns [W, M, T/M] outputs
    with [W, (K-1)*M] carried tails."""
    m = num_channels
    taps = jnp.asarray(taps, jnp.float32)
    nn = taps.shape[0]
    k = nn // m
    assert k - 1 <= _TBF, "taps_per_phase too large for the carried tail"
    packed = not isinstance(xp, (tuple, list))
    x0 = xp if packed else xp[0]
    batched = x0.ndim == 2
    if packed:
        xw = xp if batched else xp[None]
    else:
        xr, xi = (xp if batched else (xp[0][None], xp[1][None]))
    nw = (xw if packed else xr).shape[0]
    t = (xw if packed else xr).shape[-1]
    n_frames = t // m
    n_t = pick_tile_chan(n_frames, m)
    assert n_t is not None
    n_tt = n_frames // n_t

    if packed:
        x_in = (xw.reshape(nw, n_frames, m),)
    else:
        x_in = (xr.reshape(nw, n_frames, m), xi.reshape(nw, n_frames, m))
    w = taps[::-1].reshape(k, m)
    w16 = jnp.zeros((_TBF, m), jnp.float32).at[:k].set(w)

    p_idx = np.arange(m)
    ang = -2.0 * np.pi * np.outer(p_idx, p_idx) / m
    w_re = jnp.asarray(np.cos(ang).astype(np.float32))
    w_im = jnp.asarray(np.sin(ang).astype(np.float32))

    sr, si = state_p  # [(K-1)*M] each (or [W, (K-1)*M] batched)
    sr = sr.reshape(nw, k - 1, m)
    si = si.reshape(nw, k - 1, m)
    tail = jnp.zeros((nw, 2, _TBF, m), jnp.float32)
    tail = tail.at[:, 0, _TBF - (k - 1) :].set(sr)
    tail = tail.at[:, 1, _TBF - (k - 1) :].set(si)

    kern = functools.partial(
        _chan_kernel_packed if packed else _chan_kernel,
        n_t=n_t, n_tt=n_tt, k=k, interp=interpret,
    )
    # per-capture constants/tails: None squeezes the capture axis so the
    # kernel body is identical to the single-capture form
    cspec = lambda shape: pl.BlockSpec(
        shape, lambda wi, ti: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    f_spec = pl.BlockSpec((None, n_t, m), lambda wi, ti: (wi, ti, 0),
                          memory_space=pltpu.VMEM)
    tail_spec = pl.BlockSpec((None, 2, _TBF, m), lambda wi, ti: (wi, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    y_spec = pl.BlockSpec((None, m, n_t), lambda wi, ti: (wi, 0, ti),
                          memory_space=pltpu.VMEM)
    y_re, y_im, out_tail = pl.pallas_call(
        kern,
        grid=(nw, n_tt),
        in_specs=[f_spec] * len(x_in) + [
            tail_spec,
            cspec((_TBF, m)),
            cspec((m, m)),
            cspec((m, m)),
        ],
        out_specs=[
            y_spec,
            y_spec,
            tail_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nw, m, n_frames), jnp.float32),
            jax.ShapeDtypeStruct((nw, m, n_frames), jnp.float32),
            jax.ShapeDtypeStruct((nw, 2, _TBF, m), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((_TBF + n_t, m), jnp.float32),
            pltpu.VMEM((_TBF + n_t, m), jnp.float32),
        ],
        interpret=interpret,
    )(*x_in, tail, w16, w_re, w_im)

    new_state = (
        out_tail[:, 0, _TBF - (k - 1) :].reshape(nw, -1),
        out_tail[:, 1, _TBF - (k - 1) :].reshape(nw, -1),
    )
    if not batched:
        return ((new_state[0][0], new_state[1][0]),
                (y_re[0], y_im[0]))
    return new_state, (y_re, y_im)
