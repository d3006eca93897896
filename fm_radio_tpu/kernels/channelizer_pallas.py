"""Pallas polyphase-FFT channelizer: wideband IQ -> M station channels.

One HBM pass for the whole filterbank (parallel/channelizer.py documents the
math).  The XLA form costs ~13 ms per 16M samples because the K shifted
multiply-adds of the phase filter do not fuse (K full passes over the
signal); here they run over VMEM-resident frame tiles (sublane shifts), and
the cross-phase DFT runs on the MXU.

Round-5 structure (the first on-chip wideband measurement showed the naive
per-capture DFT costing ~7x the whole demod chain at m=32):

- CAPTURE PACKING: the DFT matmul of one capture is [n_t, m] x [m, m],
  which pads to 128 lanes on the MXU — at m=32 that wastes 4x the MXU time.
  The kernel therefore stacks q = 128/m INDEPENDENT captures along the lane
  axis and applies ONE dense block-diag(DFT_m x q) [q*m, q*m] matmul: full
  MXU density at any m <= 128, with the batched-capture grid supplying the
  q captures per grid block.
- KARATSUBA complex product: y = z @ (C_re + j C_im) as 3 real dot groups
  (P1 = zr@C_re, P2 = zi@C_im, P3 = (zr+zi)@(C_re+C_im); y_re = P1-P2,
  y_im = P3-P1-P2) instead of 4.
- bf16 SPLIT COUNT: f32 operands split into bf16 (hi, lo) pairs; splits=3
  is the exact-leaning x3 form (hi.hi + hi.lo + lo.hi), splits=2 keeps the
  z split but a single-bf16 DFT matrix — its twiddle quantization adds
  leakage ~-54 dB, BELOW the u8 capture's own quantization floor
  (accuracy-gated; FMTPU_WB_SPLITS lens, process-scoped like the other
  kernel env lenses).
- IN-KERNEL i8 BRIDGE: the production wideband->stations path re-quantizes
  channel planes to the u8 grid for the int8-direct demod front end
  (models/wideband.py).  out="i8" folds the 1/m DFT descale into the DFT
  matrices and writes int8 planes straight from VMEM — 1/4 the output HBM
  bytes and no separate XLA quantize pass over the f32 planes.

Grid: (W/q capture groups, time tiles); the (K-1)-frame overlap-save tails
carry per capture in VMEM scratch, re-seeded at ti==0 per capture group.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fm_radio_tpu.kernels.frontend_pallas import _split_bf16

_TBF = 16  # carried tail rows (frames); requires K-1 <= _TBF

# bf16 split count for the DFT matmuls (see module docstring).  Read ONCE at
# import: the lens is process-scoped — set it before the first jit compile
# (bench.py's subprocess model), flipping it mid-process has no effect.
_SPLITS = int(os.environ.get("FMTPU_WB_SPLITS", "3"))


def _dotk(z_hi, z_lo, c_hi, c_lo, splits: int, interp: bool):
    """bf16-split matmul z @ C at the chosen split count, f32 accumulation."""
    pref = jax.lax.Precision.HIGHEST if interp else jax.lax.Precision.DEFAULT
    dot = functools.partial(jnp.dot, precision=pref,
                            preferred_element_type=jnp.float32)
    if splits >= 3:
        return (dot(z_hi, c_hi) + dot(z_hi, c_lo)) + dot(z_lo, c_hi)
    return dot(z_hi, c_hi) + dot(z_lo, c_hi)


def _chan_core_q(
    w_ref, cre_ref, crelo_ref, cim_ref, cimlo_ref, csum_ref, csumlo_ref,
    y_ref, out_tail_ref,
    bufr_ref, bufi_ref, zr_ref, zi_ref,
    *, n_t: int, n_tt: int, k: int, m: int, q: int, interp: bool,
    out_i8: bool, splits: int,
):
    ti = pl.program_id(1)

    # phase filter per capture: z[n, p] = sum_r w[r, p] * frames[n + r, p];
    # window rows start at _TBF - (k-1) + r (static sublane offsets on the
    # middle axis of the [q, _TBF + n_t, m] scratch ring); results land
    # lane-STACKED in the [n_t, q*m] z scratch for the dense DFT
    w = w_ref[...]
    base = _TBF - (k - 1)
    for qi in range(q):
        zr = bufr_ref[qi, base : base + n_t, :] * w[0:1, :]
        zi = bufi_ref[qi, base : base + n_t, :] * w[0:1, :]
        for r in range(1, k):
            zr = zr + bufr_ref[qi, base + r : base + r + n_t, :] * w[r : r + 1, :]
            zi = zi + bufi_ref[qi, base + r : base + r + n_t, :] * w[r : r + 1, :]
        zr_ref[:, qi * m : (qi + 1) * m] = zr
        zi_ref[:, qi * m : (qi + 1) * m] = zi

    # DFT across phases, all q captures in one dense matmul per term
    # (block-diag DFT), Karatsuba 3-group complex product
    zr = zr_ref[...]
    zi = zi_ref[...]
    zr_hi, zr_lo = _split_bf16(zr, interp)
    zi_hi, zi_lo = _split_bf16(zi, interp)
    zs_hi, zs_lo = _split_bf16(zr + zi, interp)
    p1 = _dotk(zr_hi, zr_lo, cre_ref[...], crelo_ref[...], splits, interp)
    p2 = _dotk(zi_hi, zi_lo, cim_ref[...], cimlo_ref[...], splits, interp)
    p3 = _dotk(zs_hi, zs_lo, csum_ref[...], csumlo_ref[...], splits, interp)
    y_re = p1 - p2
    y_im = (p3 - p1) - p2

    # channel-major output: transpose in VMEM, not as an XLA pass.  i8 out:
    # the DFT matrices carry the 1/m descale, so y is already on the u8
    # grid; round and shift by the demod's i8 ingest convention
    # (split_iq_i8: stored value +1 == centered sample)
    for qi in range(q):
        yre_t = y_re[:, qi * m : (qi + 1) * m].T
        yim_t = y_im[:, qi * m : (qi + 1) * m].T
        if out_i8:
            def q8(v):
                v = jnp.clip(jnp.round(v) - 1.0, -128.0, 127.0)
                return v.astype(jnp.int32).astype(jnp.int8)

            y_ref[0, qi] = q8(yre_t)
            y_ref[1, qi] = q8(yim_t)
        else:
            y_ref[0, qi] = yre_t
            y_ref[1, qi] = yim_t

    bufr_ref[:, : _TBF] = bufr_ref[:, n_t :]
    bufi_ref[:, : _TBF] = bufi_ref[:, n_t :]

    @pl.when(ti == n_tt - 1)
    def _finish():
        out_tail_ref[:, 0] = bufr_ref[:, : _TBF]
        out_tail_ref[:, 1] = bufi_ref[:, : _TBF]


def _chan_kernel(
    fr_ref, fi_ref, tail_ref, w_ref,
    cre_ref, crelo_ref, cim_ref, cimlo_ref, csum_ref, csumlo_ref,
    y_ref, out_tail_ref,
    bufr_ref, bufi_ref, zr_ref, zi_ref,
    **kw,
):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        bufr_ref[:, : _TBF] = tail_ref[:, 0]
        bufi_ref[:, : _TBF] = tail_ref[:, 1]

    bufr_ref[:, _TBF:] = fr_ref[...]
    bufi_ref[:, _TBF:] = fi_ref[...]
    _chan_core_q(
        w_ref, cre_ref, crelo_ref, cim_ref, cimlo_ref, csum_ref, csumlo_ref,
        y_ref, out_tail_ref, bufr_ref, bufi_ref, zr_ref, zi_ref, **kw,
    )


def _chan_kernel_packed(
    fw_ref, tail_ref, w_ref,
    cre_ref, crelo_ref, cim_ref, cimlo_ref, csum_ref, csumlo_ref,
    y_ref, out_tail_ref,
    bufr_ref, bufi_ref, zr_ref, zi_ref,
    **kw,
):
    # packed u8 IQ words (utils/transfer.pack_iq_u8): w = I*256 + Q, exact
    # integers < 2^16; unpack + recenter in-VMEM (wideband captures are the
    # channelizer's largest stream — half the HBM read of planes)
    @pl.when(pl.program_id(1) == 0)
    def _init():
        bufr_ref[:, : _TBF] = tail_ref[:, 0]
        bufi_ref[:, : _TBF] = tail_ref[:, 1]

    from fm_radio_tpu.utils.transfer import unpack_iq_words

    bufr_ref[:, _TBF:], bufi_ref[:, _TBF:] = unpack_iq_words(fw_ref[...])
    _chan_core_q(
        w_ref, cre_ref, crelo_ref, cim_ref, cimlo_ref, csum_ref, csumlo_ref,
        y_ref, out_tail_ref, bufr_ref, bufi_ref, zr_ref, zi_ref, **kw,
    )


def _pack_q(n_captures: int, m: int) -> int:
    """Captures stacked per lane row: the largest divisor of W that keeps
    q*m <= 128 (full-density DFT for m <= 128; q=1 beyond)."""
    q = math.gcd(n_captures, max(1, 128 // m))
    return max(q, 1)


def _chan_vmem_bytes(n_t: int, m: int, q: int) -> int:
    """Scoped-VMEM footprint of one grid step (f32 words): double-buffered
    packed input + one double-buffered [2, q, m, n_t] output + two scratch
    rings + z stacks + the DFT matrices (single-buffered: constant index
    map) + tails.  Lane axis budgeted at its VMEM-padded width."""
    m_pad = -(-m // 128) * 128
    qm_pad = -(-(q * m) // 128) * 128
    stream = 2 * n_t * q * m_pad + 2 * 2 * q * n_t * m_pad
    scratch = 2 * q * (_TBF + n_t) * m_pad + 2 * n_t * qm_pad
    consts = 6 * qm_pad * qm_pad + (5 * _TBF) * q * m_pad
    return 4 * (stream + scratch + consts)


def pick_tile_chan(n_frames: int, m: int, n_captures: int = 1) -> int | None:
    """Largest power-of-2 time tile in [256, 2048] dividing n_frames whose
    footprint fits the 16 MB scoped-VMEM budget (with margin); None demotes
    to the XLA path — e.g. m=1024, whose DFT matrices alone are ~8 MB."""
    if m % 8 != 0 or m > 1024:
        return None
    q = _pack_q(n_captures, m)
    budget = 12 << 20
    n_t = 256
    if n_frames % n_t != 0 or _chan_vmem_bytes(n_t, m, q) > budget:
        return None
    while (n_t * 2 <= 2048 and n_frames % (n_t * 2) == 0
           and _chan_vmem_bytes(n_t * 2, m, q) <= budget):
        n_t *= 2
    return n_t


def channelize_pallas(taps, state_p, xp, num_channels: int,
                      interpret: bool = False, out: str = "f32",
                      splits: int | None = None):
    """Drop-in for channelize_p (same contract) on shapes where
    pick_tile_chan allows.

    ``xp`` may be a SINGLE [T] f32 array of packed u8 IQ words
    (utils/transfer.pack_iq_u8) — unpacked + recentered in-VMEM, halving
    the wideband HBM read.

    BATCHED form (the ``fmtpu stations``-at-scale / wideband-bench path): a
    leading capture axis W on both the input ([W, T] packed, or (re, im)
    each [W, T]) and the state ([W, (K-1)*M] planes) runs W independent
    wideband streams through ONE kernel, with q = 128/m captures packed per
    lane row for MXU density (module docstring).

    ``out="f32"`` returns (state', (y_re, y_im)) [..., M, T/M] f32 planes
    (unscaled, like the XLA form).  ``out="i8"`` (batched only) returns
    (state', y_i8 [2, W, M, T/M] int8): the 1/m-descaled planes on the u8
    grid in the demod's i8 ingest convention — feed ``y_i8.reshape(2, C,
    T/M)`` straight to the int8-direct demod (models/wideband.py).
    """
    m = num_channels
    taps = jnp.asarray(taps, jnp.float32)
    nn = taps.shape[0]
    k = nn // m
    assert k - 1 <= _TBF, "taps_per_phase too large for the carried tail"
    if splits is None:
        splits = _SPLITS
    packed = not isinstance(xp, (tuple, list))
    x0 = xp if packed else xp[0]
    batched = x0.ndim == 2
    if packed:
        xw = xp if batched else xp[None]
        nw, t = xw.shape
    else:
        xr, xi = (xp if batched else (xp[0][None], xp[1][None]))
        nw, t = xr.shape
    assert out == "f32" or (batched and out == "i8"), out
    n_frames = t // m
    n_t = pick_tile_chan(n_frames, m, nw)
    assert n_t is not None
    n_tt = n_frames // n_t
    q = _pack_q(nw, m)

    if packed:
        x_in = (xw.reshape(nw, n_frames, m),)
    else:
        x_in = (xr.reshape(nw, n_frames, m), xi.reshape(nw, n_frames, m))
    w = taps[::-1].reshape(k, m)
    w16 = jnp.zeros((_TBF, m), jnp.float32).at[:k].set(w)

    # block-diag(DFT_m x q) Karatsuba matrices, i8 out folds in the 1/m
    # descale (f32 host-side, split to bf16 (hi, lo) pairs on device)
    p_idx = np.arange(m)
    ang = -2.0 * np.pi * np.outer(p_idx, p_idx) / m
    scale = (1.0 / m) if out == "i8" else 1.0
    eye_q = np.eye(q, dtype=np.float32)
    c_re = np.kron(eye_q, np.cos(ang) * scale).astype(np.float32)
    c_im = np.kron(eye_q, np.sin(ang) * scale).astype(np.float32)
    mats = []
    for c in (c_re, c_im, c_re + c_im):
        hi, lo = _split_bf16(jnp.asarray(c), True)
        mats += [hi, lo]

    sr, si = state_p  # [(K-1)*M] each (or [W, (K-1)*M] batched)
    sr = sr.reshape(nw, k - 1, m)
    si = si.reshape(nw, k - 1, m)
    tail = jnp.zeros((nw, 2, _TBF, m), jnp.float32)
    tail = tail.at[:, 0, _TBF - (k - 1) :].set(sr)
    tail = tail.at[:, 1, _TBF - (k - 1) :].set(si)

    kern = functools.partial(
        _chan_kernel_packed if packed else _chan_kernel,
        n_t=n_t, n_tt=n_tt, k=k, m=m, q=q, interp=interpret,
        out_i8=(out == "i8"), splits=splits,
    )
    qm = q * m
    cspec = lambda shape: pl.BlockSpec(
        shape, lambda wi, ti: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    f_spec = pl.BlockSpec((q, n_t, m), lambda wi, ti: (wi, ti, 0),
                          memory_space=pltpu.VMEM)
    tail_spec = pl.BlockSpec((q, 2, _TBF, m), lambda wi, ti: (wi, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    y_spec = pl.BlockSpec((2, q, m, n_t), lambda wi, ti: (0, wi, 0, ti),
                          memory_space=pltpu.VMEM)
    y, out_tail = pl.pallas_call(
        kern,
        grid=(nw // q, n_tt),
        in_specs=[f_spec] * len(x_in) + [
            tail_spec,
            cspec((_TBF, m)),
        ] + [cspec((qm, qm))] * 6,
        out_specs=[y_spec, tail_spec],
        out_shape=[
            jax.ShapeDtypeStruct(
                (2, nw, m, n_frames),
                jnp.int8 if out == "i8" else jnp.float32),
            jax.ShapeDtypeStruct((nw, 2, _TBF, m), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((q, _TBF + n_t, m), jnp.float32),
            pltpu.VMEM((q, _TBF + n_t, m), jnp.float32),
            pltpu.VMEM((n_t, qm), jnp.float32),
            pltpu.VMEM((n_t, qm), jnp.float32),
        ],
        interpret=interpret,
    )(*x_in, tail, w16, *mats)

    new_state = (
        out_tail[:, 0, _TBF - (k - 1) :].reshape(nw, -1),
        out_tail[:, 1, _TBF - (k - 1) :].reshape(nw, -1),
    )
    if out == "i8":
        return new_state, y
    y_re, y_im = y[0], y[1]
    if not batched:
        return ((new_state[0][0], new_state[1][0]),
                (y_re[0], y_im[0]))
    return new_state, (y_re, y_im)
