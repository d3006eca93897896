"""Pallas polyphase-FFT channelizer: wideband IQ -> M station channels.

One HBM pass for the whole filterbank (parallel/channelizer.py documents the
math).  The layout is the product of three on-chip decompositions
(tools/wb_probe, round 5):

v1 (frames on sublanes, phases on m lanes): every buffer and VPU op is
  128/m-fold lane-PADDED and the phase filter's K=16 SUBLANE-shifted slice
  reads dominate — 35 ms per 2^28-sample block at 2048 stations, 7x the
  whole demod chain.
v2 (flat [rows, 128] frame-packed): full lane density, but the phase
  filter's flat shifts r*m land at sublane offsets 1..4 — sublane-MISALIGNED
  vector ops run ~4x slow on this chip, and 30 of them/tile kept the kernel
  at 34 ms while streams+DFT+output measured 2.3 ms (the k1 probe variant).
v3 (THIS FILE — TRANSPOSED flat): the stream lives as B[s, c] =
  x_flat[128*c + s], i.e. [128 sublanes, cols].  A tap shift of r*m flat
  samples becomes a sublane offset (r*m) % 128 — a MULTIPLE OF m >= 8, so
  every slice is sublane-ALIGNED — plus a lane offset of at most
  _TBF*m/128 + 1 small columns.  The phase filter accumulates in 128-column
  register chunks; the DFT is y_T = C_T @ z_T against transposed block-diag
  twiddle matrices (full MXU density at any m <= 128); and the channel-major
  epilogue needs NO transposes at all: y_T's sublane blocks q'*m..+m ARE the
  per-frame-phase channel rows.

DFT details: Karatsuba 3-group complex product (P1 = C_re^T z_r, P2 =
C_im^T z_i, P3 = (C_re+C_im)^T (z_r+z_i)); bf16 split count per
FMTPU_WB_SPLITS (splits=2 leaves a single-bf16 twiddle whose ~-54 dB
leakage sits below the u8 capture's own quantization floor; process-scoped
env lens, read at import).

Output interleave (channel k's time series interleaves the q = 128/m
frame-phase blocks): Mosaic supports neither strided lane stores nor
stack+minor-reshape (both crash the compiler — measured), so:
  q == 1: direct stores.
  i8 out (production): the interleave IS byte packing — 2/4 consecutive
    output bytes make one i16/i32 word, packed with integer shifts in
    registers and bitcast back to i8 OUTSIDE the kernel (free: same memory
    layout).  For q > 4, groups of 4 -> q/4 word planes, lane-interleaved
    cheaply in XLA by the wrapper.
  f32 out (the oracle path): phase-split planes, one XLA de-interleave
    pass in the wrapper.
The i8 bridge also folds the 1/m DFT descale into the twiddle matrices and
writes int8-convention planes straight from VMEM — 1/4 the output HBM
bytes, no separate XLA quantize pass (models/wideband.py's production
wideband->stations bridge).

Grid: (W captures, time tiles); the 16-frame overlap-save tail carries per
capture in VMEM scratch (transposed: _TBF*m/128 = m/8 columns), re-seeded
at ti == 0.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fm_radio_tpu.kernels.frontend_pallas import _split_bf16

_TBF = 16  # carried tail FRAMES; requires K-1 <= _TBF and m % 8 == 0

# bf16 split count for the DFT matmuls (module docstring).  Read ONCE at
# import: process-scoped — set before the first jit compile (bench.py's
# subprocess model); flipping it mid-process has no effect.
_SPLITS = int(os.environ.get("FMTPU_WB_SPLITS", "3"))


def _chan_core_t(
    mh_ref, ml_ref,
    y_ref, out_tail_ref,
    btr_ref, bti_ref, bs_ref,
    *, n_rows: int, n_tt: int, k: int, m: int, interp: bool,
    out_i8: bool, splits: int, int_input: bool,
):
    ti = pl.program_id(1)
    q = 128 // m
    tl = btr_ref.shape[1] - n_rows  # tail columns (k-adaptive)
    n_c = mh_ref.shape[1]
    pref = jax.lax.Precision.HIGHEST if interp else jax.lax.Precision.DEFAULT
    i8_mode = splits == 1 and int_input
    dot = functools.partial(
        jnp.dot, precision=pref,
        preferred_element_type=jnp.int32 if i8_mode else jnp.float32)

    # ---- FUSED phase filter + DFT on the MXU.  The combined operator
    # y_flat[128j + o] = sum_{p,r} Wdft[p, ch] w[r, p] x_flat[128j + o' ...]
    # is exactly n_c = tl + 1 dense [128, 128] matrices applied to COLUMN-
    # SHIFTED slices of the raw transposed stream:
    #     y_T = sum_c M_c^T @ B[:, c : c + n_rows]
    # (tools/wb_probe history: the separate VPU phase filter cost 31-44 ms
    # at 2048 stations — both sublane-shift layouts are VMEM-pass-bound at
    # ~1 ms per tap pass — while MXU dots of this shape hide almost fully
    # under the input stream).  The u8-derived stream is integer-valued, so
    # the x side is EXACT in a single bf16 (no hi/lo split; the Br+Bi
    # Karatsuba plane is <= 254, still exact); splits only controls the
    # M-side terms (2 = single bf16 M: tap+twiddle quantization ~-54 dB,
    # below the u8 capture floor; 3 = M hi+lo, near-exact).  Non-integer
    # plane inputs (the oracle/test path) force the full x hi/lo form.
    if splits == 1 and int_input:
        # INT8 mode (2x MXU rate): the u8-derived stream is exact int8, M
        # quantized to 1-plane int8 (rel ~2^-8: the same error class as the
        # splits=2 single-bf16 matrices, gated by the same hardware
        # golden).  Karatsuba needs a +-254 sum plane (overflows i8), so
        # the complex product runs as the plain 4 real groups — 4*n_c int8
        # dots = 2*n_c bf16-equivalents vs splits=2's 3*n_c.
        # mh_ref here is int8 [2, n_c, 128, 128] (re, im); ml_ref[0, 0, 0]
        # carries the dequant scale 1/q_M.
        # the ring stores (u8 - 128) so +128 cannot wrap int8; the +1
        # recenter folds into precomputed per-output column sums of the
        # int8 matrices (ml rows 1/2), exactly like the front end's s_row
        rr_ = ii_ = ri_ = ir_ = None
        for c in range(n_c):
            xr8 = btr_ref[:, c : c + n_rows]
            xi8 = bti_ref[:, c : c + n_rows]
            d_rr = dot(mh_ref[0, c], xr8)
            d_ii = dot(mh_ref[1, c], xi8)
            d_ri = dot(mh_ref[1, c], xr8)
            d_ir = dot(mh_ref[0, c], xi8)
            rr_ = d_rr if rr_ is None else rr_ + d_rr
            ii_ = d_ii if ii_ is None else ii_ + d_ii
            ri_ = d_ri if ri_ is None else ri_ + d_ri
            ir_ = d_ir if ir_ is None else ir_ + d_ir
        inv_q = ml_ref[0, 0]
        corr_re = ml_ref[1:2, :].T
        corr_im = ml_ref[2:3, :].T
        y_re = (rr_ - ii_).astype(jnp.float32) * inv_q + corr_re
        y_im = (ri_ + ir_).astype(jnp.float32) * inv_q + corr_im
    else:
        bs_ref[...] = btr_ref[...] + bti_ref[...]
        planes = (btr_ref, bti_ref, bs_ref)
        acc = [None, None, None]
        for c in range(n_c):
            for g in range(3):
                xb = planes[g][:, c : c + n_rows]
                if int_input:
                    terms = dot(mh_ref[g, c], xb.astype(jnp.bfloat16))
                    if splits >= 3:
                        terms = terms + dot(ml_ref[g, c],
                                            xb.astype(jnp.bfloat16))
                else:
                    x_hi, x_lo = _split_bf16(xb, interp)
                    terms = (dot(mh_ref[g, c], x_hi)
                             + dot(mh_ref[g, c], x_lo)
                             + dot(ml_ref[g, c], x_hi))
                acc[g] = terms if acc[g] is None else acc[g] + terms
        p1, p2, p3 = acc
        y_re = p1 - p2
        y_im = (p3 - p1) - p2

    # ---- channel-major epilogue (module docstring): y_T sublane block q'
    # IS [m channels, n_rows] for frame phase q' — aligned slices only
    def q8w(v):
        # u8-grid quantize to the demod's i8 convention, as an int32 byte
        v = jnp.clip(jnp.round(v) - 1.0, -128.0, 127.0)
        return v.astype(jnp.int32) & 255

    for pi, y in enumerate((y_re, y_im)):
        if out_i8 == "ps":
            # PHASE-SPLIT i8 planes [2, q, m, n_rows]: plane q' = samples
            # n ≡ q' (mod q) — the demod's ds4 polyphase ingest consumes
            # these DIRECTLY (kernels/k12_pallas.py::_k12_kernel_ps), so
            # no byte interleave exists ANYWHERE (the word+bitcast path
            # below costs ~20 ms/step in XLA relayouts at 2048 stations)
            for qq in range(q):
                b = q8w(y[qq * m : (qq + 1) * m])
                y_ref[pi, qq] = (b - ((b & 128) << 1)).astype(jnp.int8)
            continue
        if q == 1:
            if out_i8:
                b = q8w(y)
                y_ref[pi, 0] = (b - ((b & 128) << 1)).astype(jnp.int8)
            else:
                y_ref[pi, 0] = y
        elif out_i8:
            step = min(q, 4)  # bytes per packed word (i32: 4; i16 at q=2)
            for g in range(q // step):
                wv = q8w(y[g * step * m : (g * step + 1) * m])
                for b in range(1, step):
                    qb = (g * step + b) * m
                    wv = wv | (q8w(y[qb : qb + m]) << (8 * b))
                if step == 2:
                    # wrap the sign bit back into a signed i16 word
                    wv = wv - ((wv & 0x8000) << 1)
                    y_ref[pi, g] = wv.astype(jnp.int16)
                else:
                    y_ref[pi, g] = wv
        else:
            for qq in range(q):
                y_ref[pi, qq] = y[qq * m : (qq + 1) * m]

    btr_ref[:, :tl] = btr_ref[:, n_rows:]
    bti_ref[:, :tl] = bti_ref[:, n_rows:]

    @pl.when(ti == n_tt - 1)
    def _finish():
        out_tail_ref[0] = btr_ref[:, :tl]
        out_tail_ref[1] = bti_ref[:, :tl]


def _chan_kernel_t(
    fr_ref, fi_ref, tail_ref, mh_ref, ml_ref,
    y_ref, out_tail_ref,
    btr_ref, bti_ref, bs_ref,
    *, n_rows: int, **kw,
):
    tl = btr_ref.shape[1] - n_rows

    @pl.when(pl.program_id(1) == 0)
    def _init():
        btr_ref[:, :tl] = tail_ref[0]
        bti_ref[:, :tl] = tail_ref[1]

    btr_ref[:, tl:] = fr_ref[...].T
    bti_ref[:, tl:] = fi_ref[...].T
    _chan_core_t(
        mh_ref, ml_ref, y_ref, out_tail_ref, btr_ref, bti_ref, bs_ref,
        n_rows=n_rows, **kw,
    )


def _chan_kernel_t_packed(
    fw_ref, tail_ref, mh_ref, ml_ref,
    y_ref, out_tail_ref,
    btr_ref, bti_ref, bs_ref,
    *, n_rows: int, **kw,
):
    # packed u8 IQ words (utils/transfer.pack_iq_u8): w = I*256 + Q, exact
    # integers < 2^16; unpack + recenter in-VMEM (wideband captures are the
    # channelizer's largest stream — half the HBM read of planes)
    tl = btr_ref.shape[1] - n_rows

    @pl.when(pl.program_id(1) == 0)
    def _init():
        btr_ref[:, :tl] = tail_ref[0]
        bti_ref[:, :tl] = tail_ref[1]

    from fm_radio_tpu.utils.transfer import unpack_iq_words

    wr, wi = unpack_iq_words(fw_ref[...])
    if btr_ref.dtype == jnp.int8:
        # int8 M mode: store (u8 - 128) so +128 cannot wrap (the +1 is
        # folded into the matrix column sums); f32->i8 hops through i32
        btr_ref[:, tl:] = (wr.T - 1.0).astype(jnp.int32).astype(jnp.int8)
        bti_ref[:, tl:] = (wi.T - 1.0).astype(jnp.int32).astype(jnp.int8)
    else:
        btr_ref[:, tl:] = wr.T
        bti_ref[:, tl:] = wi.T
    _chan_core_t(
        mh_ref, ml_ref, y_ref, out_tail_ref, btr_ref, bti_ref, bs_ref,
        n_rows=n_rows, **kw,
    )


def _chan_vmem_bytes(n_t: int, m: int, k: int = _TBF) -> int:
    """Scoped-VMEM words of one grid step (f32): double-buffered flat input
    + double-buffered output planes + 2 transposed ring buffers + z stacks
    + the 6 DFT matrices + tails."""
    n_rows = n_t * m // 128
    tl = max(-(-((k - 1) * m) // 128), 1)
    stream = 2 * n_rows * 128 + 2 * 2 * 128 * max(n_rows, n_t // 4)
    rings = 3 * 128 * (tl + n_rows)  # Br, Bi, Br+Bi
    # live value temporaries on the Mosaic stack: 3 Karatsuba accumulators
    # + 2 outputs + bf16 casts — measured: the compiler charges these
    # against the 16 MB scoped budget
    # live value temporaries on the Mosaic stack grow with the shift count
    # (per-(c, group) bf16 operand casts + 3 f32 accumulators + outputs) —
    # sized empirically: the m=128/n_c=17 case measured ~19 MB of stack
    vals = (6 + 2 * (tl + 1)) * 128 * n_rows
    # bf16 M matrices: (hi, lo) x 3 Karatsuba groups x (tl + 1) shifts
    consts_bytes = 2 * 3 * (tl + 1) * 128 * 128 * 2
    return 4 * (stream + rings + vals) + consts_bytes


def pick_tile_chan(n_frames: int, m: int, n_captures: int = 1,
                   k: int = _TBF) -> int | None:
    """Largest frame tile (power-of-2 multiple of 16384/m so the column
    count is a 128 multiple) dividing n_frames within the VMEM budget; None
    demotes to the XLA path (flat kernel: m % 8 == 0 and m <= 128)."""
    if m % 8 != 0 or m > 128:
        return None
    budget = 12 << 20
    n_t = max(256, 16384 // m)
    if n_frames % n_t != 0 or _chan_vmem_bytes(n_t, m, k) > budget:
        return None
    while (n_t * 2 <= 8192 and n_frames % (n_t * 2) == 0
           and _chan_vmem_bytes(n_t * 2, m, k) <= budget):
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
    wideband streams through ONE kernel (grid (W, time tiles)).

    ``out="f32"`` returns (state', (y_re, y_im)) [..., M, T/M] f32 planes
    (unscaled, like the XLA form).  ``out="i8"`` (batched only) returns
    (state', y_i8 [2, W, M, T/M] int8): the 1/m-descaled planes on the u8
    grid in the demod's i8 ingest convention — feed ``y_i8.reshape(2, C,
    T/M)`` straight to the int8-direct demod (models/wideband.py).
    """
    m = num_channels
    # taps must be CONCRETE (the fused M_c matrices are host-precomputed);
    # np.asarray fails loudly on a traced value — callers keep taps as
    # numpy/design-time arrays, never as traced jit arguments
    taps = np.asarray(taps, np.float32)
    nn = taps.shape[0]
    k = nn // m
    assert k - 1 <= _TBF, "taps_per_phase too large for the carried tail"
    if splits is None:
        splits = _SPLITS
    if out == "i8ps":
        assert 128 // m == 4, "phase-split i8 out needs q == 4 (m == 32)"
    packed = not isinstance(xp, (tuple, list))
    x0 = xp if packed else xp[0]
    # packed input may arrive PRE-FLATTENED as [W, T/128, 128] (flat3): the
    # scan-invariant reshape then lives OUTSIDE the jitted loop — XLA does
    # not hoist the [W, T] -> flat view out of a scan body and re-copies
    # ~1 GB per step (measured round 5; same lesson as the round-4 kernel
    # tables)
    flat3 = packed and x0.ndim == 3
    batched = x0.ndim == 2 or flat3
    if packed:
        xw = xp if batched else xp[None]
        nw = xw.shape[0]
        t = (xw.shape[1] * 128) if flat3 else xw.shape[1]
    else:
        xr, xi = (xp if batched else (xp[0][None], xp[1][None]))
        nw, t = xr.shape
    assert out == "f32" or (batched and out in ("i8", "i8ps")), out
    n_frames = t // m
    n_t = pick_tile_chan(n_frames, m, nw, k)
    assert n_t is not None
    n_tt = n_frames // n_t
    q = 128 // m
    n_rows = n_t * m // 128
    tl = max(-(-((k - 1) * m) // 128), 1)  # ceil tail columns, k-adaptive

    # flat-128 views of the input (free reshapes of contiguous data; the
    # flat3 form arrives pre-reshaped — see above)
    if packed:
        x_in = (xw if flat3 else xw.reshape(nw, n_frames * m // 128, 128),)
    else:
        x_in = (xr.reshape(nw, n_frames * m // 128, 128),
                xi.reshape(nw, n_frames * m // 128, 128))
    # fused (phase filter o DFT) operator matrices M_c (kernel comment):
    # M_c[s', o] = sum over taps r with (q'*m + p + u_r) == 128*c + s' of
    # w_rev[r, p] * Wdft[p, ch], where o = q'*m + ch and u_r =
    # (_TBF - (k-1) + r) * m; stored TRANSPOSED ([o, s']) for y_T = M^T B.
    # i8 out folds in the 1/m descale; shipped as bf16 (hi, lo) pairs.
    w = taps[::-1].reshape(k, m)
    p_idx = np.arange(m)
    ang = -2.0 * np.pi * np.outer(p_idx, p_idx) / m
    scale = (1.0 / m) if out in ("i8", "i8ps") else 1.0
    wd_re = (np.cos(ang) * scale).astype(np.float64)  # [p, ch]
    wd_im = (np.sin(ang) * scale).astype(np.float64)
    n_c = tl + 1
    m_re = np.zeros((n_c, 128, 128))
    m_im = np.zeros((n_c, 128, 128))
    base = tl * 128 - (k - 1) * m  # left-pad to whole columns
    for r in range(k):
        for qp in range(q):
            for p in range(m):
                sf = qp * m + p + base + r * m
                c_ix, s_ix = sf // 128, sf % 128
                o0 = qp * m
                m_re[c_ix, s_ix, o0 : o0 + m] += w[r, p] * wd_re[p]
                m_im[c_ix, s_ix, o0 : o0 + m] += w[r, p] * wd_im[p]
    i8_mode = packed and splits == 1
    if i8_mode:
        # 1-plane int8 matrices (global power-of-2 scale; rel ~2^-8, the
        # splits=2 error class) for the 4-group int8 dot path
        mats_np = np.stack([m_re, m_im])  # [2, n_c, 128, 128]
        mats_np = np.swapaxes(mats_np, 2, 3)
        amax = np.abs(mats_np).max()
        q_m = 2.0 ** np.floor(np.log2(127.0 / max(amax, 1e-30)))
        m_i8 = np.clip(np.round(mats_np * q_m), -127, 127).astype(np.int8)
        # +1 recenter corrections (the ring stores u8-128): per output o,
        # S = sum_s Mq[s, o] at int scale -> f32 at 1/q_m
        s_re = m_i8[0].sum(axis=(0, 1)).astype(np.float64) / q_m
        s_im = m_i8[1].sum(axis=(0, 1)).astype(np.float64) / q_m
        aux = np.zeros((3, 128), np.float32)
        aux[0] = 1.0 / q_m
        aux[1] = (s_re - s_im).astype(np.float32)  # corr for y_re
        aux[2] = (s_im + s_re).astype(np.float32)  # corr for y_im
        mats = [jnp.asarray(m_i8), jnp.asarray(aux)]
    else:
        mats_np = np.stack([m_re, m_im, m_re + m_im])  # [3, n_c, 128, 128]
        mats_np = np.swapaxes(mats_np, 2, 3).astype(np.float32)
        m_hi, m_lo = _split_bf16(jnp.asarray(mats_np), True)
        mats = [m_hi, m_lo]

    # carried tail, transposed: B[s, c] = tail_flat[128*c + s]
    sr, si = state_p  # [(K-1)*M] each (or [W, (K-1)*M] batched)
    sr = sr.reshape(nw, -1)
    si = si.reshape(nw, -1)
    tail = jnp.zeros((nw, 2, tl * 128), jnp.float32)
    tail = tail.at[:, 0, tl * 128 - (k - 1) * m :].set(sr)
    tail = tail.at[:, 1, tl * 128 - (k - 1) * m :].set(si)
    tail = jnp.swapaxes(tail.reshape(nw, 2, tl, 128), 2, 3)
    ring_dt = jnp.int8 if i8_mode else jnp.float32
    if i8_mode:
        # ring convention is (u8 - 128): shift the carried tail down too
        tail = (tail - 1.0).astype(jnp.int8)

    kern = functools.partial(
        _chan_kernel_t_packed if packed else _chan_kernel_t,
        n_rows=n_rows, n_tt=n_tt, k=k, m=m, interp=interpret,
        out_i8=("ps" if out == "i8ps" else out == "i8"),
        splits=splits, int_input=packed,
    )
    # output plane structure (module docstring)
    if out == "i8ps":
        n_planes, n_cols = q, n_frames // q
        out_dt = jnp.int8
    elif q == 1:
        n_planes, n_cols = 1, n_frames
        out_dt = jnp.int8 if out == "i8" else jnp.float32
    elif out == "i8":
        step = min(q, 4)
        n_planes, n_cols = q // step, n_frames // q
        out_dt = jnp.int16 if step == 2 else jnp.int32
    else:
        n_planes, n_cols = q, n_frames // q
        out_dt = jnp.float32

    cspec = lambda shape: pl.BlockSpec(
        shape, lambda wi, ti: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    f_spec = pl.BlockSpec((None, n_rows, 128), lambda wi, ti: (wi, ti, 0),
                          memory_space=pltpu.VMEM)
    tail_spec = pl.BlockSpec((None, 2, 128, tl), lambda wi, ti: (wi, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    # output rows are CHANNEL-MAJOR across captures ([2, P, W*m, cols]):
    # block row-index wi selects rows [wi*m, (wi+1)*m) — the demod's
    # [2, C, B] feed needs no W-axis movement at all
    y_spec = pl.BlockSpec((2, n_planes, m, n_rows),
                          lambda wi, ti: (0, 0, wi, ti),
                          memory_space=pltpu.VMEM)
    y, out_tail = pl.pallas_call(
        kern,
        grid=(nw, n_tt),
        in_specs=[f_spec] * len(x_in) + [
            tail_spec,
        ] + [cspec(c.shape) for c in mats],
        out_specs=[y_spec, tail_spec],
        out_shape=[
            jax.ShapeDtypeStruct((2, n_planes, nw * m, n_cols), out_dt),
            jax.ShapeDtypeStruct((nw, 2, 128, tl), ring_dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((128, tl + n_rows), ring_dt),
            pltpu.VMEM((128, tl + n_rows), ring_dt),
            pltpu.VMEM((128, tl + n_rows), jnp.float32),
        ],
        interpret=interpret,
    )(*x_in, tail, *mats)

    ot = jnp.swapaxes(out_tail, 2, 3).astype(jnp.float32)
    if i8_mode:
        ot = ot + 1.0  # undo the ring's -1 storage shift
    ot = ot.reshape(nw, 2, -1)
    new_state = (
        ot[:, 0, tl * 128 - (k - 1) * m :],
        ot[:, 1, tl * 128 - (k - 1) * m :],
    )
    # un-pack the output plane structure (XLA side); rows are C = W*m
    if out == "i8ps":
        return new_state, y  # [2, 4, C, B/4] — the demod's polyphase form
    if q == 1:
        y = y[:, 0].reshape(2, nw, m, n_frames)
    elif out == "i8":
        # words -> bytes: [2, P, C, J] -> [..., step]; byte b of word
        # (g, j) is output sample n = q*j + 4*g + b, so move the plane
        # axis next to the byte axis and merge (j, g, b) -> n.  P == 1
        # (m=32/64): only the minor (J, step) byte-merge remains.
        yb = jax.lax.bitcast_convert_type(y, jnp.int8)
        yb = jnp.moveaxis(yb, 1, 3)  # [2, C, J, P, step]
        y = yb.reshape(2, nw, m, n_frames)
    else:
        # phase-split -> interleave: one XLA pass (oracle path only)
        y = jnp.moveaxis(y, 1, -1).reshape(2, nw, m, n_frames)

    if out == "i8":
        return new_state, y
    y_re, y_im = y[0], y[1]
    if not batched:
        return ((new_state[0][0], new_state[1][0]),
                (y_re[0], y_im[0]))
    return new_state, (y_re, y_im)
