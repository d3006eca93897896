"""Fused front-end kernel: polyphase ds x4 + FM discriminator in ONE pass.

Parity: stages 1-2 of ``Broadcast_FM_Demod::Run_FM_Demodulate``
(``broadcast_fm_demod.cpp:391-398``) — the ds x4 LPF (``polyphase_filter.h:
36-64``) and the quadrature discriminator (``fm_demod.cpp:30-45``).

Why fused: at production block sizes the chain is HBM-bound (~200-400 GB/s
effective on this chip), and the XLA path writes + re-reads the full-rate
``fm_in`` intermediate (~1 GB per 256ch x 1M block each way).  This kernel
streams the baseband planes through VMEM once: in-VMEM banded MXU matmuls
produce the decimated IQ tile, the polynomial atan2 + wrap runs on the VPU,
and only the 4x-decimated ``fm_demod`` real signal ever returns to HBM.

Layout: channels on sublanes, time on lanes.  Grid (channel tiles, time
tiles) with time innermost and sequential; the filter history (the last
TB=128 input samples) and the discriminator's previous phase are carried in
VMEM scratch between time tiles, exactly the overlap-save state of the
unfused ops.

The banded matrix trick (see ops/fir.py::_apply_real_taps) is retuned for
alignment: every sub-matmul reads a 128-aligned [c, 640] window of the
tail-extended buffer, with the tap band placed at row TB - halo + 4j + k so
no unaligned lane shifts are ever emitted.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fm_radio_tpu.kernels.pll_pallas import _atan2

_M = 4          # decimation factor (fm_in stage is always x4)
_NO = 128       # default outputs per banded sub-matmul (see ``no`` params)
_TB = 128       # carried-tail buffer width (lane-aligned); requires nn-_M <= _TB
# aligned window width per sub-matmul is no*_M + _TB (derived per call)


def _band_matrix(taps, no: int = _NO) -> jnp.ndarray:
    """[no*_M+_TB, no] band for y[j] = sum_k w_rev[k] x_buf[TB - halo + 4j + k].

    ``no`` = outputs per banded sub-matmul.  Wider bands (256) halve the
    sub-dot count — the front end is dot-ISSUE-bound (~0.4-0.6 us per small
    straight-line MXU dot, see docs/PERF.md), so fewer/bigger dots win as
    long as the band stays inside VMEM.  Traceable (taps may be a jit-traced
    coefficient array)."""
    taps = jnp.asarray(taps, jnp.float32)
    nn = taps.shape[0]
    halo = nn - _M
    assert halo <= _TB, "filter too long for the carried tail"
    w_rev = taps[::-1]
    rows = jnp.arange(no * _M + _TB)[:, None]
    cols = jnp.arange(no)[None, :]
    k = rows - (_TB - halo + _M * cols)
    valid = (k >= 0) & (k < nn)
    return jnp.where(valid, jnp.take(w_rev, jnp.clip(k, 0, nn - 1)), 0.0)


def _split_bf16(x, interpret: bool = False):
    """bf16x2 split: x ~ hi + lo with hi, lo bf16 (rel err ~2^-16 of lo).

    Backend-dependent rounding, because no single formulation survives both
    compilers (measured, kernel parity tests cover both):
    - Mosaic (real TPU): plain convert-to-bf16-and-back — honored literally.
    - interpret / XLA: the SAME round trip is DELETED by XLA's
      excess-precision folding (lo becomes 0 and every downstream matmul
      silently degrades to plain bf16), so use lax.reduce_precision, which
      XLA cannot fold (Mosaic, in turn, does not implement it)."""
    if interpret:
        hi_f32 = jax.lax.reduce_precision(x, exponent_bits=8, mantissa_bits=7)
        return hi_f32.astype(jnp.bfloat16), (x - hi_f32).astype(jnp.bfloat16)
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(x_hi, x_lo, b_hi, b_lo):
    """bf16x3 matmul (Mosaic has no Precision.HIGH): hi*hi + hi*lo + lo*hi
    with f32 accumulation — relative error ~2^-21, 3 MXU passes instead of
    HIGHEST's 6."""
    f32 = jnp.float32
    return (
        jnp.dot(x_hi, b_hi, preferred_element_type=f32)
        + jnp.dot(x_hi, b_lo, preferred_element_type=f32)
        + jnp.dot(x_lo, b_hi, preferred_element_type=f32)
    )


def quantize_band_int8(band):
    """Two-plane int8 fixed-point split of the band matrix for MXU int8 dots.

    band*q ~ b1 + b2*2^-7 with b1, b2 int8 and q = 2^a the largest power of
    two keeping |band*q| <= 127.  Returns (b1, b2, s_row) where s_row[0, j]
    = sum_r (b1 + b2*2^-7)[r, j] — the +1 input-shift correction at the SAME
    q-scale as the dot outputs (see int8 notes in ``ds4_disc_pallas``).
    Tap error <= 0.5*2^-7 of the max tap (~2^-14.5 relative, ~-89 dB), far
    below the ~83 dB golden audio budget.  Traceable.
    """
    band = jnp.asarray(band, jnp.float32)
    amax = jnp.max(jnp.abs(band))
    q = jnp.exp2(jnp.floor(jnp.log2(127.0 / amax)))
    b1 = jnp.clip(jnp.round(band * q), -127, 127)
    b2 = jnp.clip(jnp.round((band * q - b1) * 128.0), -127, 127)
    s_row = jnp.sum(b1 + b2 * (1.0 / 128.0), axis=0, keepdims=True)
    return b1.astype(jnp.int8), b2.astype(jnp.int8), s_row


def _ds4_disc_core(
    tail_ref, prev_ref, band_refs,
    y_ref, out_tail_ref, out_prev_ref,
    bufr_ref, bufi_ref, carry_ref,
    *, t_blk: int, n_tt: int, scale: float, interp: bool, int_input: bool,
    int8_dots: bool = False, no: int = _NO, out_i16: bool = False,
):
    """Shared body: assumes bufr/bufi[:, _TB:] hold this tile's input planes."""
    ti = pl.program_id(1)
    _w = no * _M + _TB
    n_sub = t_blk // (no * _M)
    n_out = t_blk // _M

    @pl.when(ti == 0)
    def _init():
        bufr_ref[:, :_TB] = tail_ref[0]
        bufi_ref[:, :_TB] = tail_ref[1]
        carry_ref[...] = prev_ref[...]

    if int8_dots:
        # int8 MXU path (2x the bf16 rate on v5e).  x' = x - 1 maps the
        # integer baseband [-127, 128] into int8 range [-128, 127]; the
        # shift is corrected by +s_row (the band column sums) AFTER the dot.
        # The dot outputs are scaled by the quantizer's q — irrelevant,
        # because the only consumer is atan2(fi, fr), which is
        # scale-invariant.  int32 accumulation is exact: <= 128*127*rows
        # where rows = no*_M + _TB (640 at no=128, 1152 at no=256), both
        # well under 2^31; the only approximation is the two-plane tap
        # quantization (~-89 dB, quantize_band_int8).
        assert int_input, "int8 dots require integer-valued input"
        b1_ref, b2_ref, srow_ref = band_refs
        xr8 = (bufr_ref[...] - 1.0).astype(jnp.int8)
        xi8 = (bufi_ref[...] - 1.0).astype(jnp.int8)
        s_row = srow_ref[...]
    else:
        (band_ref,) = band_refs
        b_hi, b_lo = _split_bf16(band_ref[...], interp)
        if int_input:
            # u8-derived baseband (the radio's native format, app.cpp:57-63)
            # is integer-valued in [-127, 128] — EXACT in bf16, so the x-lo
            # plane is identically zero: skip the split and the lo@hi dot
            # (1/3 of the MXU work and most of the VPU split cost).
            xr_hi = bufr_ref[...].astype(jnp.bfloat16)
            xi_hi = bufi_ref[...].astype(jnp.bfloat16)
            xr_lo = xi_lo = None
        else:
            xr_hi, xr_lo = _split_bf16(bufr_ref[...], interp)
            xi_hi, xi_lo = _split_bf16(bufi_ref[...], interp)

    def dot_x8(x8, w0):
        i32, f32 = jnp.int32, jnp.float32
        xw = x8[:, w0 : w0 + _w]
        y1 = jnp.dot(xw, b1_ref[...], preferred_element_type=i32)
        y2 = jnp.dot(xw, b2_ref[...], preferred_element_type=i32)
        return (
            y1.astype(f32) + y2.astype(f32) * jnp.float32(1.0 / 128.0)
        ) + s_row

    def dot_x(x_hi, x_lo, w0):
        if int_input:
            f32 = jnp.float32
            return (
                jnp.dot(x_hi[:, w0 : w0 + _w], b_hi, preferred_element_type=f32)
                + jnp.dot(x_hi[:, w0 : w0 + _w], b_lo, preferred_element_type=f32)
            )
        return _dot3(x_hi[:, w0 : w0 + _w], x_lo[:, w0 : w0 + _w], b_hi, b_lo)

    # decimated IQ tile, built ``no`` outputs at a time from aligned windows
    for s in range(n_sub):
        w0 = s * no * _M
        if int8_dots:
            fr = dot_x8(xr8, w0)
            fi = dot_x8(xi8, w0)
        else:
            fr = dot_x(xr_hi, xr_lo, w0)
            fi = dot_x(xi_hi, xi_lo, w0)
        if s == 0:
            fm_r, fm_i = fr, fi
        else:
            fm_r = jnp.concatenate([fm_r, fr], axis=-1)
            fm_i = jnp.concatenate([fm_i, fi], axis=-1)

    # discriminator: wrap(theta[n] - theta[n-1]) * scale  (fm_demod.cpp:30-45)
    theta = _atan2(fm_i, fm_r)
    prev = jnp.concatenate([carry_ref[:, :1], theta[:, : n_out - 1]], axis=-1)
    d = theta - prev
    pi = jnp.float32(np.pi)
    two_pi = jnp.float32(2.0 * np.pi)
    d = jnp.where(d >= pi, d - two_pi, d)
    d = jnp.where(d <= -pi, d + two_pi, d)
    if out_i16:
        from fm_radio_tpu.kernels.qformat import FM_SCALE, q_i16

        y_ref[...] = q_i16(d * jnp.float32(scale), FM_SCALE)
    else:
        y_ref[...] = d * jnp.float32(scale)

    # carry: last input samples + last phase
    carry_ref[...] = theta[:, n_out - 1 :]
    bufr_ref[:, :_TB] = bufr_ref[:, t_blk:]
    bufi_ref[:, :_TB] = bufi_ref[:, t_blk:]

    @pl.when(ti == n_tt - 1)
    def _finish():
        out_tail_ref[0] = bufr_ref[:, :_TB]
        out_tail_ref[1] = bufi_ref[:, :_TB]
        out_prev_ref[...] = carry_ref[...]


def _ds4_disc_kernel(
    xr_ref, xi_ref, tail_ref, prev_ref, *rest,
    t_blk: int, n_tt: int, scale: float, interp: bool, int_input: bool,
    int8_dots: bool = False, no: int = _NO, out_i16: bool = False,
):
    nb = 3 if int8_dots else 1
    band_refs, out_scratch = rest[:nb], rest[nb:]
    y_ref, out_tail_ref, out_prev_ref, bufr_ref, bufi_ref, carry_ref = out_scratch
    bufr_ref[:, _TB:] = xr_ref[...]
    bufi_ref[:, _TB:] = xi_ref[...]
    _ds4_disc_core(
        tail_ref, prev_ref, band_refs, y_ref, out_tail_ref, out_prev_ref,
        bufr_ref, bufi_ref, carry_ref,
        t_blk=t_blk, n_tt=n_tt, scale=scale, interp=interp,
        int_input=int_input, int8_dots=int8_dots, no=no, out_i16=out_i16,
    )


def _ds4_disc_packed_kernel(
    xw_ref, tail_ref, prev_ref, *rest,
    t_blk: int, n_tt: int, scale: float, interp: bool, int_input: bool,
    int8_dots: bool = False, no: int = _NO, out_i16: bool = False,
):
    # Packed u8 IQ: one f32 word per complex sample, w = I_u8*256 + Q_u8
    # (exact integers < 2^16 — the only dtype the tunneled host boundary
    # moves is f32, and this halves both the transfer and the HBM read).
    from fm_radio_tpu.utils.transfer import unpack_iq_words

    nb = 3 if int8_dots else 1
    band_refs, out_scratch = rest[:nb], rest[nb:]
    y_ref, out_tail_ref, out_prev_ref, bufr_ref, bufi_ref, carry_ref = out_scratch
    bufr_ref[:, _TB:], bufi_ref[:, _TB:] = unpack_iq_words(xw_ref[...])
    _ds4_disc_core(
        tail_ref, prev_ref, band_refs, y_ref, out_tail_ref, out_prev_ref,
        bufr_ref, bufi_ref, carry_ref,
        t_blk=t_blk, n_tt=n_tt, scale=scale, interp=interp,
        int_input=int_input, int8_dots=int8_dots, no=no, out_i16=out_i16,
    )


def _ds4_disc_i8_kernel(
    x8_ref, tail_ref, prev_ref, *rest,
    t_blk: int, n_tt: int, scale: float, interp: bool, int_input: bool,
    int8_dots: bool = False, no: int = _NO, out_i16: bool = False,
):
    # Raw int8 ingest: [2, c_blk, t_blk] planes of (I-128, Q-128)
    # (utils/transfer.split_iq_i8) — HALF the HBM read of packed f32 words
    # and no unpack arithmetic at all; the only VPU work is the i8 -> f32
    # cast chain plus the +1 recentering to the reference's u8-127
    # (app.cpp:57-63).
    from fm_radio_tpu.utils.transfer import i8_planes_to_f32

    nb = 3 if int8_dots else 1
    band_refs, out_scratch = rest[:nb], rest[nb:]
    y_ref, out_tail_ref, out_prev_ref, bufr_ref, bufi_ref, carry_ref = out_scratch
    bufr_ref[:, _TB:], bufi_ref[:, _TB:] = i8_planes_to_f32(x8_ref[...])
    _ds4_disc_core(
        tail_ref, prev_ref, band_refs, y_ref, out_tail_ref, out_prev_ref,
        bufr_ref, bufi_ref, carry_ref,
        t_blk=t_blk, n_tt=n_tt, scale=scale, interp=interp,
        int_input=int_input, int8_dots=int8_dots, no=no, out_i16=out_i16,
    )


def phase_split_band_int8(b1, b2):
    """Rearrange the QUANTIZED flat band ([no*_M+_TB, no] int8 pair) into
    per-phase matrices for the phase-split ingest (kernels/k12_pallas.py):
    the wideband channelizer's natural output is 4 polyphase planes
    x_p[u] = x[4u + p], and the ds4 band dot decomposes phase-by-phase,

        y = sum_d x[w0 + d] band[d]  =  sum_p sum_e x_p[w0/4 + e] band[4e+p]

    Rows are taken from the ALREADY-quantized b1/b2 (same global q scale),
    and per-phase int32 partial sums add exactly, so the phase-split dot is
    BIT-identical to the flat dot.  Each per-phase matrix is left-padded
    with zero rows to 2*_PB rows so every window read is 128-aligned
    (window s reads x_p[:, (s-1)*_PB : (s+1)*_PB]).

    Returns (b1_ps, b2_ps) [4, 2*no, no] int8 (pb = no per-phase window
    half: window step no*_M flat = no per phase).
    """
    nn, no = b1.shape
    e_rows = nn // _M  # 160 at no=128 (_TB/4 tail + no windows)
    assert nn % _M == 0 and e_rows <= 2 * no
    out = []
    for b in (b1, b2):
        b = jnp.asarray(b)
        ps = jnp.zeros((_M, 2 * no, no), b.dtype)
        view = b.reshape(e_rows, _M, no)  # [e, p, o]
        ps = ps.at[:, 2 * no - e_rows :, :].set(jnp.moveaxis(view, 1, 0))
        out.append(ps)
    return tuple(out)


def _i8_phase_tile_body(
    x4_ref, b1ps_ref, b2ps_ref, srow_ref,
    w0_ref, tail4_ref, carry_ref,
    *, t_blk: int, scale: float, no: int = _NO,
):
    """Phase-split twin of ``_i8_direct_tile_body``: consumes [2, 4, c,
    t_blk/4] int8 polyphase planes (the wideband channelizer's native
    output — no word packing, no XLA byte conversion anywhere) and produces
    the BIT-identical fm_demod value (int32 phase partial sums add
    exactly; same quantized band rows, same s_row, same f32 dequant).

    w0_ref: [2, 4, c, 2*_PB] int8 scratch (window-0 assembly per phase);
    tail4_ref: [2, 4, c, _TB // _M] int8 scratch (carried per-phase input
    tails); carry_ref: discriminator phase carry.
    """
    tq = t_blk // _M  # per-phase columns
    n_sub = t_blk // (no * _M)
    n_out = t_blk // _M
    pb = no            # per-phase window half (window step no*_M/4 cols)
    tb4 = _TB // _M

    # window-0 assembly per plane/phase: [zeros | tail (tb4) | first pb new]
    w0_ref[...] = jnp.zeros_like(w0_ref)
    w0_ref[:, :, :, pb - tb4 : pb] = tail4_ref[...]
    w0_ref[:, :, :, pb:] = x4_ref[:, :, :, :pb]

    s_row = srow_ref[...]

    def dot_ps(plane, s):
        y1 = None
        y2 = None
        for p in range(_M):
            if s == 0:
                xwin = w0_ref[plane, p]
            else:
                xwin = x4_ref[plane, p, :, (s - 1) * pb : (s + 1) * pb]
            d1 = jnp.dot(xwin, b1ps_ref[p],
                         preferred_element_type=jnp.int32)
            d2 = jnp.dot(xwin, b2ps_ref[p],
                         preferred_element_type=jnp.int32)
            y1 = d1 if y1 is None else y1 + d1
            y2 = d2 if y2 is None else y2 + d2
        return (
            y1.astype(jnp.float32)
            + y2.astype(jnp.float32) * jnp.float32(1.0 / 128.0)
        ) + s_row

    for s in range(n_sub):
        fr = dot_ps(0, s)
        fi = dot_ps(1, s)
        if s == 0:
            fm_r, fm_i = fr, fi
        else:
            fm_r = jnp.concatenate([fm_r, fr], axis=-1)
            fm_i = jnp.concatenate([fm_i, fi], axis=-1)

    # carry the per-phase input tails for the next tile
    tail4_ref[...] = x4_ref[:, :, :, tq - tb4 :]

    # discriminator: wrap(theta[n] - theta[n-1]) * scale  (fm_demod.cpp:30-45)
    theta = _atan2(fm_i, fm_r)
    prev = jnp.concatenate([carry_ref[:, :1], theta[:, : n_out - 1]], axis=-1)
    d = theta - prev
    pi = jnp.float32(np.pi)
    two_pi = jnp.float32(2.0 * np.pi)
    d = jnp.where(d >= pi, d - two_pi, d)
    d = jnp.where(d <= -pi, d + two_pi, d)
    carry_ref[...] = theta[:, n_out - 1 :]
    return d * jnp.float32(scale)


def _i8_direct_tile_body(
    x8_ref, b1_ref, b2_ref, srow_ref,
    w0r, w0i, tailr, taili, carry_ref,
    *, t_blk: int, scale: float, no: int = _NO,
):
    """One int8-direct ds4+discriminator tile -> the fm_demod VALUE
    [c, t_blk//4] (f32, still in VMEM/registers).  Updates the carried
    tailr/taili (int8 input tails) and carry_ref (discriminator phase) —
    callers init them at ti==0 and emit them at ti==n_tt-1.  Shared between
    the standalone K1 kernel and the fused K1+K2 kernel
    (kernels/k12_pallas.py)."""
    _w = no * _M + _TB
    n_sub = t_blk // (no * _M)
    n_out = t_blk // _M

    # window-0 assembly: [carried tail (_TB) | first no*_M input columns]
    w0r[:, :_TB] = tailr[...]
    w0i[:, :_TB] = taili[...]
    w0r[:, _TB:] = x8_ref[0, :, : no * _M]
    w0i[:, _TB:] = x8_ref[1, :, : no * _M]

    s_row = srow_ref[...]

    def dot8(xwin):
        y1 = jnp.dot(xwin, b1_ref[...], preferred_element_type=jnp.int32)
        y2 = jnp.dot(xwin, b2_ref[...], preferred_element_type=jnp.int32)
        return (
            y1.astype(jnp.float32)
            + y2.astype(jnp.float32) * jnp.float32(1.0 / 128.0)
        ) + s_row

    for s in range(n_sub):
        if s == 0:
            fr, fi = dot8(w0r[...]), dot8(w0i[...])
        else:
            w0 = s * no * _M - _TB
            fr = dot8(x8_ref[0, :, w0 : w0 + _w])
            fi = dot8(x8_ref[1, :, w0 : w0 + _w])
        if s == 0:
            fm_r, fm_i = fr, fi
        else:
            fm_r = jnp.concatenate([fm_r, fr], axis=-1)
            fm_i = jnp.concatenate([fm_i, fi], axis=-1)

    # carry the input tail for the next tile (small int8 copies)
    tailr[...] = x8_ref[0, :, t_blk - _TB :]
    taili[...] = x8_ref[1, :, t_blk - _TB :]

    # discriminator: wrap(theta[n] - theta[n-1]) * scale  (fm_demod.cpp:30-45)
    theta = _atan2(fm_i, fm_r)
    prev = jnp.concatenate([carry_ref[:, :1], theta[:, : n_out - 1]], axis=-1)
    d = theta - prev
    pi = jnp.float32(np.pi)
    two_pi = jnp.float32(2.0 * np.pi)
    d = jnp.where(d >= pi, d - two_pi, d)
    d = jnp.where(d <= -pi, d + two_pi, d)
    carry_ref[...] = theta[:, n_out - 1 :]
    return d * jnp.float32(scale)


def _ds4_disc_i8_direct_kernel(
    x8_ref, tail_ref, prev_ref, b1_ref, b2_ref, srow_ref,
    y_ref, out_tail_ref, out_prev_ref,
    w0r, w0i, tailr, taili, carry_ref,
    *, t_blk: int, n_tt: int, scale: float, no: int = _NO,
    out_i16: bool = False,
):
    """int8-DIRECT front end: band dots read the [2, C, B] int8 input ref's
    aligned windows straight off VMEM — no full-tile unpack/copy at all.

    Round-3 probe finding (tools/frontend_probe.py, i8d/i8x sections, real
    chip): the packed-f32 kernel's critical path is the full-tile VPU
    unpack->scratch copy (~2.8 us/tile, serial with the MXU dots via a WAR
    hazard on the single scratch); this variant measured 3.16 ms vs the
    production kernel's 4.28 ms at 1024ch x 256k (-26%).  Only window 0 of
    each tile needs assembly (carried tail | first no*_M input columns);
    windows s>=1 start at lane offset s*no*_M - _TB, 128-aligned by
    construction.  The +1 recenter of the (I-128, Q-128) planes folds into
    the band's column-sum correction (quantize_band_int8's s_row), so the
    per-input-sample VPU cost is ZERO.  Output values are bit-identical to
    the int8_dots scratch path (same operands, same dot order).
    """
    ti = pl.program_id(1)

    @pl.when(ti == 0)
    def _init():
        tailr[...] = tail_ref[0]
        taili[...] = tail_ref[1]
        carry_ref[...] = prev_ref[...]

    fm = _i8_direct_tile_body(
        x8_ref, b1_ref, b2_ref, srow_ref, w0r, w0i, tailr, taili, carry_ref,
        t_blk=t_blk, scale=scale, no=no,
    )
    if out_i16:
        from fm_radio_tpu.kernels.qformat import FM_SCALE, q_i16

        y_ref[...] = q_i16(fm, FM_SCALE)
    else:
        y_ref[...] = fm

    @pl.when(ti == n_tt - 1)
    def _finish():
        out_tail_ref[0] = tailr[...]
        out_tail_ref[1] = taili[...]
        out_prev_ref[...] = carry_ref[...]


def _ds4_disc_i8_direct(taps, tail_p, prev_theta, x8, fd, fs_out,
                        interpret: bool, no: int, out_i16: bool = False,
                        band_tables=None):
    """pallas_call wrapper for the int8-direct kernel (i8 planes ingest +
    int8 band dots).  Carried tails cross as the f32 state the rest of the
    chain uses; the [C, halo] <-> int8 conversions here are negligible."""
    c, b = x8.shape[1:]
    tiles = pick_tiles(c, b, no, max_t=4096)
    assert tiles is not None, "shape not supported; gate with pick_tiles"
    c_blk, t_blk = tiles
    n_tt = b // t_blk
    _w = no * _M + _TB
    nn = taps.shape[0]
    halo = nn - _M

    pre = (band_tables or {}).get("k1_i8")
    if pre is not None and pre[0].shape == (_w, no):
        b1, b2, s_row = pre  # design-time table (DemodCoeffs.kernel_tables)
    else:
        b1, b2, s_row = quantize_band_int8(_band_matrix(taps, no))
    # f32 tail state holds u8-127 baseband values in [-127, 128]; the
    # kernel's int8 domain is (u8-128) = value - 1 in [-128, 127]
    tail8 = (pack_front_tail(tail_p, c, halo) - 1.0).astype(jnp.int8)
    scale = disc_scale(fd, fs_out)

    kern = functools.partial(
        _ds4_disc_i8_direct_kernel,
        t_blk=t_blk, n_tt=n_tt, scale=scale, no=no, out_i16=out_i16,
    )
    grid = (c // c_blk, n_tt)
    cspec = lambda shape: pl.BlockSpec(shape, lambda ci, ti: (0, 0),
                                       memory_space=pltpu.VMEM)
    y, out_tail, out_prev = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((2, c_blk, t_blk), lambda ci, ti: (0, ci, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c_blk, _TB), lambda ci, ti: (0, ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_blk, 1), lambda ci, ti: (ci, 0),
                         memory_space=pltpu.VMEM),
            cspec((_w, no)), cspec((_w, no)), cspec((1, no)),
        ],
        out_specs=[
            pl.BlockSpec((c_blk, t_blk // _M), lambda ci, ti: (ci, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c_blk, _TB), lambda ci, ti: (0, ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_blk, 1), lambda ci, ti: (ci, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, b // _M),
                                 jnp.int16 if out_i16 else jnp.float32),
            jax.ShapeDtypeStruct((2, c, _TB), jnp.int8),
            jax.ShapeDtypeStruct((c, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((c_blk, _TB + no * _M), jnp.int8),
            pltpu.VMEM((c_blk, _TB + no * _M), jnp.int8),
            pltpu.VMEM((c_blk, _TB), jnp.int8),
            pltpu.VMEM((c_blk, _TB), jnp.int8),
            pltpu.VMEM((c_blk, 1), jnp.float32),
        ],
        interpret=interpret,
    )(x8, tail8, prev_theta[:, None], b1, b2, s_row)

    tail_f = out_tail.astype(jnp.float32) + 1.0
    new_tail = (tail_f[0, :, _TB - halo :], tail_f[1, :, _TB - halo :])
    return new_tail, out_prev[:, 0], y


def pick_tiles(c: int, b: int, no: int = _NO,
               max_t: int = 2048) -> tuple[int, int] | None:
    """(c_blk, t_blk) or None if shapes don't fit the kernel's contract.

    ``FMTPU_FE_TILES=<c_blk>x<t_blk>`` overrides the choice (A/B lens for
    tile-geometry sweeps on the real chip).  ``max_t`` caps the time tile:
    2048 for the f32/packed kernels (two tail-extended f32 scratch buffers
    bound the VMEM budget), 4096 for the int8-direct kernel (int8 input
    blocks are half the bytes and it has no full-tile scratch — measured
    +3.5% full-chain at 128x4096, docs/PERF.md round 3)."""
    if b % (no * _M) != 0:
        return None
    ov = os.environ.get("FMTPU_FE_TILES")
    if ov:
        c_blk, t_blk = (int(v) for v in ov.split("x"))
        if c % c_blk or b % t_blk or t_blk % (no * _M):
            return None
        return c_blk, t_blk
    # default keeps (2 planes x double-buffered input) + scratch + outputs
    # well inside the 16 MB scoped-VMEM budget
    t_blk = no * _M
    while t_blk * 2 <= max_t and b % (t_blk * 2) == 0:
        t_blk *= 2
    c_blk = c if c <= 128 else 128
    if c % c_blk != 0:
        return None
    return c_blk, t_blk


def disc_scale(fd: float, fs_out: float) -> float:
    """FM discriminator gain 1/(2*pi*Fd*Ts)*0.5 (fm_demod.cpp:30-45; the
    *0.5 is compensated by the x2 in the audio mix) — shared with the chain
    megakernel so the formula has one author."""
    return 1.0 / (2.0 * np.pi * fd * (1.0 / fs_out)) * 0.5


def pack_front_tail(tail_p, c: int, halo: int) -> jnp.ndarray:
    """(re, im) carried tails -> the kernel's [2, C, _TB] left-padded form."""
    tail = jnp.zeros((2, c, _TB), jnp.float32)
    tail = tail.at[0, :, _TB - halo :].set(tail_p[0])
    tail = tail.at[1, :, _TB - halo :].set(tail_p[1])
    return tail


def ds4_disc_pallas(
    taps,
    tail_p: tuple[jnp.ndarray, jnp.ndarray],
    prev_theta: jnp.ndarray,
    xp: tuple[jnp.ndarray, jnp.ndarray],
    fd: float,
    fs_out: float,
    interpret: bool = False,
    int_input: bool = False,
    int8_dots: bool = False,
    n_out_sub: int = _NO,
    out_i16: bool = False,
    band_tables=None,
):
    """Fused polyphase-ds4 + FM discriminator.

    taps: [NN] natural-order LPF taps (NN % 4 == 0, NN <= 132);
    tail_p: (re, im) [C, NN-4] carried input tail (overlap-save state);
    prev_theta: [C] carried discriminator phase; xp: (re, im) [C, B] planes.
    Returns ((new_tail_re, new_tail_im), new_prev_theta, fm_demod [C, B/4]).

    Matches polyphase_decimate_p + fm_discriminate_p to ~1e-6 (poly atan2,
    bf16x3 matmuls — both far below the 83 dB golden audio budget).

    ``int_input=True`` asserts the planes are integer-valued in [-256, 256]
    (true for u8-derived baseband, the radio's native input): such values are
    exact in bf16, so the lo compensation of x is skipped (1/3 less MXU, no
    VPU split).  Do NOT set it for non-integer baseband (channelizer output).

    ``xp`` may instead be a SINGLE [C, B] f32 array of packed u8 IQ words
    (``w = I_u8*256 + Q_u8``, see utils/transfer.pack_iq_u8): the kernel
    unpacks and recenters in-VMEM (exact), halving the HBM input read —
    the front end is input-bandwidth-bound.  Packed implies int_input.

    ``xp`` may ALSO be a [2, C, B] **int8** array of (I-128, Q-128) planes
    (utils/transfer.split_iq_i8): half the packed form's HBM bytes again
    (2 B/complex sample, the format floor) and no unpack arithmetic —
    the kernel casts i8 -> f32 and adds 1 (exact).  Implies int_input.

    ``int8_dots=True`` (requires int_input) runs the band matmuls on the
    MXU's int8 path (2x the bf16 rate on v5e): x is shifted by -1 into int8
    range and the taps are quantized to two int8 fixed-point planes
    (quantize_band_int8).  The dequantization SCALE is never applied — the
    kernel's only consumer of the decimated IQ is atan2, which is scale-
    invariant; only the column-sum shift correction is added.  Accuracy cost
    is the ~-89 dB tap quantization, below the golden audio budget.

    ``n_out_sub`` widens the banded sub-matmul (outputs per MXU dot, default
    128).  256 halves the dot count — the front end is dot-issue-bound — at
    the cost of a 4x bigger band matrix in VMEM.  Output-identical.
    """
    no = n_out_sub
    _w = no * _M + _TB
    packed = i8 = False
    if not isinstance(xp, (tuple, list)):
        if xp.ndim == 3:
            # [2, C, B] int8 (I-128, Q-128) planes — utils/transfer.split_iq_i8
            assert xp.dtype == jnp.int8 and xp.shape[0] == 2
            if int8_dots:
                # int8 ingest + int8 MXU dots compose into the DIRECT kernel
                # (no full-tile unpack at all) — the fastest front end
                # measured (docs/PERF.md round 3)
                return _ds4_disc_i8_direct(
                    taps, tail_p, prev_theta, xp, fd, fs_out, interpret, no,
                    out_i16=out_i16, band_tables=band_tables,
                )
            i8 = True
            c, b = xp.shape[1:]
        else:
            packed = True
            xw = xp
            c, b = xw.shape
        int_input = True
    else:
        xr, xi = xp
        c, b = xr.shape
    tiles = pick_tiles(c, b, no)
    assert tiles is not None, "shape not supported; gate with pick_tiles"
    c_blk, t_blk = tiles
    n_tt = b // t_blk

    nn = taps.shape[0]
    halo = nn - _M
    # band stays f32 on the wire (the tunneled backend only transfers f32);
    # the bf16 hi/lo split happens in-kernel (tiny VPU cost on [640, 128]).
    # Prefer the design-time table (DemodCoeffs.kernel_tables) — in-trace
    # construction lands the gathers inside the caller's scan body.
    band = (band_tables or {}).get("k1_band")
    if band is None or band.shape != (_w, no):
        band = _band_matrix(taps, no)
    if int8_dots:
        assert int_input, "int8 dots require integer-valued input"
        pre = (band_tables or {}).get("k1_i8")
        band_in = (pre if pre is not None and pre[0].shape == (_w, no)
                   else quantize_band_int8(band))
        band_specs = [
            pl.BlockSpec((_w, no), lambda ci, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_w, no), lambda ci, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, no), lambda ci, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
    else:
        band_in = (band,)
        band_specs = [
            pl.BlockSpec((_w, no), lambda ci, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ]

    # tail padded left into the TB-wide aligned buffer head
    tail = pack_front_tail(tail_p, c, halo)
    scale = disc_scale(fd, fs_out)

    kern = functools.partial(
        _ds4_disc_i8_kernel if i8
        else _ds4_disc_packed_kernel if packed else _ds4_disc_kernel,
        t_blk=t_blk, n_tt=n_tt, scale=scale,
        interp=interpret, int_input=int_input, int8_dots=int8_dots, no=no,
        out_i16=out_i16,
    )
    grid = (c // c_blk, n_tt)
    if i8:
        x_spec = pl.BlockSpec((2, c_blk, t_blk), lambda ci, ti: (0, ci, ti),
                              memory_space=pltpu.VMEM)
        x_in = (xp,)
    else:
        x_spec = pl.BlockSpec((c_blk, t_blk), lambda ci, ti: (ci, ti),
                              memory_space=pltpu.VMEM)
        x_in = (xw,) if packed else (xr, xi)
    y, out_tail, out_prev = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[x_spec] * len(x_in) + [
            pl.BlockSpec((2, c_blk, _TB), lambda ci, ti: (0, ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_blk, 1), lambda ci, ti: (ci, 0),
                         memory_space=pltpu.VMEM),
        ] + band_specs,
        out_specs=[
            pl.BlockSpec((c_blk, t_blk // _M), lambda ci, ti: (ci, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c_blk, _TB), lambda ci, ti: (0, ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_blk, 1), lambda ci, ti: (ci, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, b // _M),
                                 jnp.int16 if out_i16 else jnp.float32),
            jax.ShapeDtypeStruct((2, c, _TB), jnp.float32),
            jax.ShapeDtypeStruct((c, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((c_blk, _TB + t_blk), jnp.float32),
            pltpu.VMEM((c_blk, _TB + t_blk), jnp.float32),
            pltpu.VMEM((c_blk, 1), jnp.float32),
        ],
        interpret=interpret,
    )(*x_in, tail, prev_theta[:, None], *band_in)

    new_tail = (out_tail[0, :, _TB - halo :], out_tail[1, :, _TB - halo :])
    return new_tail, out_prev[:, 0], y
