"""Engine decomposition of the K1 front-end kernel (ds4 + discriminator).

docs/PERF.md's floor work needs to know WHAT bounds K1 (6.6 ms at round-1
measurement): the MXU band dots, the VPU work (packed-word unpack + poly
atan2), or the HBM input stream.  This probe times four kernel variants at
production shape, each isolating one engine:

  full      the production kernel body (unpack + dots + atan2 + wrap)
  dots      unpack + band dots only (atan2/wrap removed)  -> MXU + unpack
  unpack    unpack + per-word reduction only              -> VPU unpack + DMA
  stream    raw block-sum of the packed words             -> pure input DMA

All variants read the identical packed [C, B] f32 input and write the same
[C, B/4] f32 output (except ``stream``/``unpack``, which write a [C, 128]
stub — their point is the input side).  Timings chain ITERS applications in
one dispatch with a data-dependent carry so the tunnel's 5-30 ms dispatch
latency amortizes, and completion is forced by fetching a dependent scalar
(block_until_ready is unreliable over the tunnel — see bench.py).

Usage: python tools/frontend_probe.py [channels=1024] [block=262144]
       FMTPU_INTERPRET=1 ... (CPU plumbing check at tiny shape)
"""

from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fm_radio_tpu.kernels.frontend_pallas import (
    _TB,
    _band_matrix,
    _split_bf16,
    _dot3,
    quantize_band_int8,
)
from fm_radio_tpu.kernels.pll_pallas import _atan2
from fm_radio_tpu.ops.design import create_fir_lpf
from fm_radio_tpu.utils.transfer import pack_iq_u8, unpack_iq_words

_INTERPRET = os.environ.get("FMTPU_INTERPRET") == "1"
_M = 4


def _variant_kernel(xw_ref, band_refs, y_ref, bufr, bufi,
                    *, t_blk, no, mode, int8, fmt="f32w", xq_ref=None):
    """One time-tile of the front end, variant selected by ``mode``.

    fmt: input encoding —
      f32w  packed f32 words w = I*256 + Q (production round-2 default)
      u8    two int8 planes (I-128, Q-128; xw_ref=I, xq_ref=Q): HALF the
            HBM bytes and NO unpack arithmetic (Mosaic rejects u8->f32, so
            the host stores value-shifted int8 and the kernel adds 1 after
            the i8 -> i32 -> f32 cast chain)
      i16   int16 words w - 32768: half the bytes, same single stream
    """

    def _f(x):  # Mosaic has no direct 8/16-bit -> f32 cast
        return (x.astype(jnp.int32) if x.dtype != jnp.float32 else x
                ).astype(jnp.float32)

    if mode == "stream":
        # pure input DMA: touch every word once, tiny output
        acc = jnp.sum(_f(xw_ref[...]), axis=-1, keepdims=True)
        if xq_ref is not None:
            acc += jnp.sum(_f(xq_ref[...]), axis=-1, keepdims=True)
        y_ref[...] = acc[:, :1] * jnp.ones((1, 128), jnp.float32)
        return
    if fmt == "u8":
        re = _f(xw_ref[...]) + 1.0
        im = _f(xq_ref[...]) + 1.0
    elif fmt == "i16":
        re, im = unpack_iq_words(_f(xw_ref[...]) + 32768.0)
    else:
        re, im = unpack_iq_words(xw_ref[...])
    if mode == "unpack":
        y_ref[...] = (
            jnp.sum(re - im, axis=-1, keepdims=True)[:, :1]
            * jnp.ones((1, 128), jnp.float32)
        )
        return
    bufr[:, _TB:] = re
    bufi[:, _TB:] = im
    _w = no * _M + _TB
    n_sub = t_blk // (no * _M)
    if int8:
        b1, b2, srow = band_refs
        xr8 = (bufr[...] - 1.0).astype(jnp.int8)
        xi8 = (bufi[...] - 1.0).astype(jnp.int8)

        def dot(x8, w0):
            xwin = x8[:, w0 : w0 + _w]
            y1 = jnp.dot(xwin, b1[...], preferred_element_type=jnp.int32)
            y2 = jnp.dot(xwin, b2[...], preferred_element_type=jnp.int32)
            return (
                y1.astype(jnp.float32)
                + y2.astype(jnp.float32) * jnp.float32(1 / 128.0)
                + srow[...]
            )

        parts = [(dot(xr8, s * no * _M), dot(xi8, s * no * _M))
                 for s in range(n_sub)]
    else:
        (band,) = band_refs
        b_hi, b_lo = _split_bf16(band[...], _INTERPRET)
        xr_hi = bufr[...].astype(jnp.bfloat16)
        xi_hi = bufi[...].astype(jnp.bfloat16)

        def dot(x_hi, w0):
            xwin = x_hi[:, w0 : w0 + _w]
            return jnp.dot(xwin, b_hi, preferred_element_type=jnp.float32) + jnp.dot(
                xwin, b_lo, preferred_element_type=jnp.float32
            )

        parts = [(dot(xr_hi, s * no * _M), dot(xi_hi, s * no * _M))
                 for s in range(n_sub)]
    fr = jnp.concatenate([p[0] for p in parts], axis=-1)
    fi = jnp.concatenate([p[1] for p in parts], axis=-1)
    if mode == "dots":
        y_ref[...] = fr + fi
        return
    assert mode == "full"
    theta = _atan2(fi, fr)
    d = theta - jnp.concatenate([theta[:, :1], theta[:, :-1]], axis=-1)
    pi = jnp.float32(np.pi)
    d = jnp.where(d >= pi, d - 2 * pi, d)
    d = jnp.where(d <= -pi, d + 2 * pi, d)
    y_ref[...] = d * jnp.float32(0.123)


def build(c, b, no, mode, int8, c_blk=None, t_blk=None, fmt="f32w",
          tile_major=False, semantics=None):
    taps = jnp.asarray(create_fir_lpf(128 + _M, 0.25), jnp.float32)
    band = _band_matrix(taps, no)
    bands = quantize_band_int8(band) if int8 else (band,)
    _w = no * _M + _TB
    if t_blk is None:
        t_blk = no * _M
        while t_blk * 2 <= 2048 and b % (t_blk * 2) == 0:
            t_blk *= 2
    if c_blk is None:
        c_blk = min(c, 128)
    grid = (c // c_blk, b // t_blk)
    small_out = mode in ("stream", "unpack")
    out_shape = (
        jax.ShapeDtypeStruct((c, 128), jnp.float32)
        if small_out
        else jax.ShapeDtypeStruct((c, b // _M), jnp.float32)
    )
    out_spec = (
        pl.BlockSpec((c_blk, 128), lambda ci, ti: (ci, 0),
                     memory_space=pltpu.VMEM)
        if small_out
        else pl.BlockSpec((c_blk, t_blk // _M), lambda ci, ti: (ci, ti),
                          memory_space=pltpu.VMEM)
    )
    if int8:
        band_specs = [
            pl.BlockSpec((_w, no), lambda ci, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_w, no), lambda ci, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, no), lambda ci, ti: (0, 0), memory_space=pltpu.VMEM),
        ]
    else:
        band_specs = [
            pl.BlockSpec((_w, no), lambda ci, ti: (0, 0), memory_space=pltpu.VMEM)
        ]

    n_x = 2 if fmt == "u8" else 1

    def kern(*refs):
        x_refs = refs[:n_x]
        band_refs = refs[n_x : n_x + len(band_specs)]
        y_ref, bufr, bufi = refs[n_x + len(band_specs) :]
        if tile_major:
            # [1, c_blk, t_blk] block -> materialize the (c_blk, t_blk)
            # tile; _variant_kernel's ref[...] reads work on values too
            x_refs = tuple(r[0] for r in x_refs)
        _variant_kernel(
            x_refs[0], band_refs, y_ref, bufr, bufi,
            t_blk=t_blk, no=no, mode=mode, int8=int8, fmt=fmt,
            xq_ref=x_refs[1] if n_x == 2 else None,
        )

    # tile-major: input pre-arranged [n_tt, C, t_blk] so each grid block is
    # ONE fully-contiguous HBM span (the [C, B] layout fragments a
    # (c_blk, t_blk) block into t_blk*4-byte bursts — the hbm_sweep read
    # benchmark only reaches 489 GB/s on contiguous blocks)
    x_spec = (
        pl.BlockSpec((1, c_blk, t_blk), lambda ci, ti: (ti, ci, 0),
                     memory_space=pltpu.VMEM)
        if tile_major
        else pl.BlockSpec((c_blk, t_blk), lambda ci, ti: (ci, ti),
                          memory_space=pltpu.VMEM)
    )

    extra = {}
    if semantics is not None:
        extra["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=semantics
        )

    def apply(*xs):
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[x_spec] * n_x
            + band_specs,
            out_specs=out_spec,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((c_blk, _TB + t_blk), jnp.float32),
                pltpu.VMEM((c_blk, _TB + t_blk), jnp.float32),
            ],
            interpret=_INTERPRET,
            **extra,
        )(*xs, *bands)

    return apply


def build_dbuf(c, b, no, mode, c_blk=None, t_blk=None):
    """Parity double-buffered scratch variant (packed f32 words).

    Hypothesis (from the additive engine decomposition): the per-tile chain
    is unpack->scratch (VPU, ~2.8 us) then dots<-scratch (MXU, ~0.85 us),
    and the NEXT tile's unpack has a WAR hazard on the SAME scratch, so the
    MXU time adds to the critical path instead of overlapping the next
    unpack.  Alternating two scratch pairs by time-tile parity splits the
    dependency chain in two, letting tile i's dots run under tile i+1's
    unpack: expected dots ~= max(DMA, unpack) ~= stream time."""
    taps = jnp.asarray(create_fir_lpf(128 + _M, 0.25), jnp.float32)
    band = _band_matrix(taps, no)
    _w = no * _M + _TB
    if t_blk is None:
        t_blk = no * _M
        while t_blk * 2 <= 2048 and b % (t_blk * 2) == 0:
            t_blk *= 2
    if c_blk is None:
        c_blk = min(c, 128)
    grid = (c // c_blk, b // t_blk)
    n_sub = t_blk // (no * _M)

    def kern(xw_ref, band_ref, y_ref, bufrA, bufiA, bufrB, bufiB):
        ti = pl.program_id(1)
        re, im = unpack_iq_words(xw_ref[...])
        b_hi, b_lo = _split_bf16(band_ref[...], _INTERPRET)

        def dots(bufr, bufi, other_r, other_i):
            bufr[:, _TB:] = re
            bufi[:, _TB:] = im
            bufr[:, :_TB] = other_r[:, t_blk:]
            bufi[:, :_TB] = other_i[:, t_blk:]
            xr_hi = bufr[...].astype(jnp.bfloat16)
            xi_hi = bufi[...].astype(jnp.bfloat16)

            def dot(x_hi, w0):
                xwin = x_hi[:, w0 : w0 + _w]
                return (
                    jnp.dot(xwin, b_hi, preferred_element_type=jnp.float32)
                    + jnp.dot(xwin, b_lo, preferred_element_type=jnp.float32)
                )

            parts = [(dot(xr_hi, s * no * _M), dot(xi_hi, s * no * _M))
                     for s in range(n_sub)]
            fr = jnp.concatenate([p[0] for p in parts], axis=-1)
            fi = jnp.concatenate([p[1] for p in parts], axis=-1)
            if mode == "dots":
                y_ref[...] = fr + fi
                return
            theta = _atan2(fi, fr)
            d = theta - jnp.concatenate([theta[:, :1], theta[:, :-1]], -1)
            pi = jnp.float32(np.pi)
            d = jnp.where(d >= pi, d - 2 * pi, d)
            d = jnp.where(d <= -pi, d + 2 * pi, d)
            y_ref[...] = d * jnp.float32(0.123)

        @pl.when(ti % 2 == 0)
        def _even():
            dots(bufrA, bufiA, bufrB, bufiB)

        @pl.when(ti % 2 == 1)
        def _odd():
            dots(bufrB, bufiB, bufrA, bufiA)

    def apply(xw):
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((c_blk, t_blk), lambda ci, ti: (ci, ti),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_w, no), lambda ci, ti: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((c_blk, t_blk // _M),
                                   lambda ci, ti: (ci, ti),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((c, b // _M), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((c_blk, _TB + t_blk), jnp.float32)
                for _ in range(4)
            ],
            interpret=_INTERPRET,
        )(xw, band)

    return apply


def build_i8direct(c, b, no, mode, c_blk=None, t_blk=None, noasm=False,
                   semantics=None):
    """int8-direct variant: raw i8 (I-128, Q-128) plane inputs, int8 band
    dots reading the INPUT REF windows directly — no full-tile scratch copy
    at all (only window 0 needs a small [c_blk, _TB + no*_M] assembly with
    the carried tail), and HALF the packed format's HBM bytes.  The +1
    recenter folds into the band's column-sum correction (s_row), so the
    VPU does nothing per input sample; per-step VPU work is only the
    decimated dequant + (mode=full) atan2.  All window offsets
    s*no*_M - _TB + _TB = s*no*_M ... are 128-aligned in lanes."""
    taps = jnp.asarray(create_fir_lpf(128 + _M, 0.25), jnp.float32)
    b1, b2, s_row = quantize_band_int8(_band_matrix(taps, no))
    b1, b2 = np.asarray(b1), np.asarray(b2)
    _w = no * _M + _TB
    w0w = _TB + no * _M  # window-0 assembly width (tail + first sub-window)
    if t_blk is None:
        t_blk = no * _M
        while t_blk * 2 <= 2048 and b % (t_blk * 2) == 0:
            t_blk *= 2
    if c_blk is None:
        c_blk = min(c, 128)
    grid = (c // c_blk, b // t_blk)
    n_sub = t_blk // (no * _M)

    def kern(xr_ref, xi_ref, b1_ref, b2_ref, srow_ref, y_ref,
             w0r, w0i, tr, ti_buf):
        ti = pl.program_id(1)
        if not noasm:
            # window-0 assembly: [carried tail | first no*_M input columns]
            w0r[:, :_TB] = tr[...]
            w0i[:, :_TB] = ti_buf[...]
            w0r[:, _TB:] = xr_ref[:, : no * _M]
            w0i[:, _TB:] = xi_ref[:, : no * _M]

        def dot8(xwin):
            y1 = jnp.dot(xwin, b1_ref[...], preferred_element_type=jnp.int32)
            y2 = jnp.dot(xwin, b2_ref[...], preferred_element_type=jnp.int32)
            return (
                y1.astype(jnp.float32)
                + y2.astype(jnp.float32) * jnp.float32(1 / 128.0)
                + srow_ref[...]
            )

        parts = []
        for s in range(n_sub):
            if s == 0 and not noasm:
                fr, fi = dot8(w0r[...]), dot8(w0i[...])
            else:
                # noasm lens: window 0 reads input[0:_w] (mis-filtered
                # first outputs, identical op shape) — isolates the
                # w0-scratch WAR + assembly cost
                w0 = max(s * no * _M - _TB, 0)
                fr = dot8(xr_ref[:, w0 : w0 + _w])
                fi = dot8(xi_ref[:, w0 : w0 + _w])
            parts.append((fr, fi))
        if not noasm:
            # carry the tail for the next tile (small [c_blk, _TB] copies)
            tr[...] = xr_ref[:, t_blk - _TB :]
            ti_buf[...] = xi_ref[:, t_blk - _TB :]
        fr = jnp.concatenate([p[0] for p in parts], axis=-1)
        fi = jnp.concatenate([p[1] for p in parts], axis=-1)
        if mode == "dots":
            y_ref[...] = fr + fi
            return
        theta = _atan2(fi, fr)
        d = theta - jnp.concatenate([theta[:, :1], theta[:, :-1]], -1)
        pi = jnp.float32(np.pi)
        d = jnp.where(d >= pi, d - 2 * pi, d)
        d = jnp.where(d <= -pi, d + 2 * pi, d)
        y_ref[...] = d * jnp.float32(0.123)

    extra = {}
    if semantics is not None:
        extra["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=semantics
        )

    def apply(xr8, xi8):
        return pl.pallas_call(
            kern,
            grid=grid,
            **extra,
            in_specs=[
                pl.BlockSpec((c_blk, t_blk), lambda ci, ti: (ci, ti),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c_blk, t_blk), lambda ci, ti: (ci, ti),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_w, no), lambda ci, ti: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_w, no), lambda ci, ti: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, no), lambda ci, ti: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((c_blk, t_blk // _M),
                                   lambda ci, ti: (ci, ti),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((c, b // _M), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((c_blk, w0w), jnp.int8),
                pltpu.VMEM((c_blk, w0w), jnp.int8),
                pltpu.VMEM((c_blk, _TB), jnp.int8),
                pltpu.VMEM((c_blk, _TB), jnp.int8),
            ],
            interpret=_INTERPRET,
        )(xr8, xi8, b1, b2, np.asarray(s_row))

    return apply


def build_i8manual(c, b, no=128, mode="dots", c_blk=128, t_blk=4096):
    """MANUAL double-buffered pipeline: the auto-pipeliner never overlaps
    compute with the input stream in ANY probed variant (engines additive
    across geometries, semantics, scratch structures — see docs/PERF.md),
    so this variant bypasses it: grid over channels only, time looped
    inside the kernel with explicit make_async_copy in/out DMAs on 2-slot
    revolving buffers.  If dots ~= stream here, manual pipelining is the
    door to overlap; window-0 filtering is approximated (noasm-style) —
    this is a perf lens, not a correctness path."""
    taps = jnp.asarray(create_fir_lpf(128 + _M, 0.25), jnp.float32)
    b1, b2, s_row = quantize_band_int8(_band_matrix(taps, no))
    _w = no * _M + _TB
    n_tt = b // t_blk
    n_sub = t_blk // (no * _M)
    grid = (c // c_blk,)

    def kern(xr_hbm, xi_hbm, b1_ref, b2_ref, srow_ref, y_hbm,
             bufr, bufi, yb, in_sems, out_sems):
        ci = pl.program_id(0)
        s_row = srow_ref[...]

        def in_dma(slot, ti, hbm, buf, plane):
            return pltpu.make_async_copy(
                hbm.at[pl.ds(ci * c_blk, c_blk), pl.ds(ti * t_blk, t_blk)],
                buf.at[slot],
                in_sems.at[slot, plane],
            )

        def out_dma(slot, ti):
            return pltpu.make_async_copy(
                yb.at[slot],
                y_hbm.at[pl.ds(ci * c_blk, c_blk),
                         pl.ds(ti * (t_blk // _M), t_blk // _M)],
                out_sems.at[slot],
            )

        in_dma(0, 0, xr_hbm, bufr, 0).start()
        in_dma(0, 0, xi_hbm, bufi, 1).start()

        def dot8(xwin):
            y1 = jnp.dot(xwin, b1_ref[...], preferred_element_type=jnp.int32)
            y2 = jnp.dot(xwin, b2_ref[...], preferred_element_type=jnp.int32)
            return (y1.astype(jnp.float32)
                    + y2.astype(jnp.float32) * jnp.float32(1 / 128.0)
                    ) + s_row

        def loop_body(ti, _):
            slot = ti % 2
            nxt = (ti + 1) % 2

            @pl.when(ti + 1 < n_tt)
            def _():
                in_dma(nxt, ti + 1, xr_hbm, bufr, 0).start()
                in_dma(nxt, ti + 1, xi_hbm, bufi, 1).start()

            in_dma(slot, ti, xr_hbm, bufr, 0).wait()
            in_dma(slot, ti, xi_hbm, bufi, 1).wait()

            parts = []
            for s in range(n_sub):
                w0 = max(s * no * _M - _TB, 0)
                fr = dot8(bufr[slot, :, w0 : w0 + _w])
                fi = dot8(bufi[slot, :, w0 : w0 + _w])
                parts.append((fr, fi))
            fr = jnp.concatenate([p[0] for p in parts], -1)
            fi = jnp.concatenate([p[1] for p in parts], -1)
            if mode == "full":
                theta = _atan2(fi, fr)
                d = theta - jnp.concatenate([theta[:, :1], theta[:, :-1]], -1)
                pi = jnp.float32(np.pi)
                d = jnp.where(d >= pi, d - 2 * pi, d)
                d = jnp.where(d <= -pi, d + 2 * pi, d)
                val = d * jnp.float32(0.123)
            else:
                val = fr + fi

            # reuse of this out slot requires its previous copy done
            @pl.when(ti >= 2)
            def _():
                out_dma(slot, ti - 2).wait()

            yb[slot] = val
            out_dma(slot, ti).start()

        jax.lax.fori_loop(0, n_tt, loop_body, None, unroll=False)
        # drain the last two output copies
        @pl.when(n_tt >= 2)
        def _():
            out_dma(n_tt % 2, n_tt - 2).wait()
        out_dma((n_tt - 1) % 2, n_tt - 1).wait()

    def apply(xr8, xi8):
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((_w, no), lambda ci: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_w, no), lambda ci: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, no), lambda ci: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((c, b // _M), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, c_blk, t_blk), jnp.int8),
                pltpu.VMEM((2, c_blk, t_blk), jnp.int8),
                pltpu.VMEM((2, c_blk, t_blk // _M), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 2)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=_INTERPRET,
        )(xr8, xi8, b1, b2, s_row)

    return apply


def time_variant(apply_fn, xw, iters, repeats=3):
    xs = xw if isinstance(xw, tuple) else (xw,)

    @jax.jit
    def run(*x0):
        def body(i, carry):
            *xb, acc = jax.lax.optimization_barrier((*x0, carry))
            y = apply_fn(*xb)
            return acc + y[0, 0]

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(np.asarray(run(*xs)))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(np.asarray(run(*xs)))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    c = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 262144
    sections = os.environ.get("FMTPU_PROBE_SECTIONS", "engines,tiles,ingest")
    secs = set(sections.split(","))
    # default 48: at 16 the tunnel's 5-30 ms per-dispatch latency inflates
    # each pass by ~0.3-1 ms (see docs/PERF.md round-3 measurement note)
    iters = 2 if _INTERPRET else int(os.environ.get("FMTPU_PROBE_ITERS", "48"))
    rng = np.random.default_rng(0)
    iq = rng.integers(0, 256, size=(c, b, 2), dtype=np.uint8)
    xw = jnp.asarray(pack_iq_u8(iq))
    gb_in = c * b * 4 / 1e9
    print(f"# [C={c}, B={b}] packed input = {gb_in:.2f} GB/pass, iters={iters}")

    # 8-bit ingest A/B: the tunnel transports u8/i16 EXACTLY (tested
    # 2026-08-19, all of u8/i8/i16/f16/bf16 round-trip bit-perfectly), so
    # the round-1 "f32-only host boundary" premise behind the packed-f32
    # word format is obsolete.  Raw u8 planes (or i16 words) HALVE the
    # front end's HBM input bytes — K1 is ~74% input DMA.
    if "ingest" in secs:
        xr8 = jnp.asarray((iq[..., 0].astype(np.int16) - 128
                           ).astype(np.int8))
        xi8 = jnp.asarray((iq[..., 1].astype(np.int16) - 128
                           ).astype(np.int8))
        w16 = jnp.asarray(
            (iq[..., 0].astype(np.int32) * 256 + iq[..., 1] - 32768
             ).astype(np.int16))
        for fmt, x_in, bytes_s in (("f32w", xw, 4), ("i16", w16, 2),
                                   ("u8", (xr8, xi8), 2)):
            for mode in ("stream", "full"):
                for c_blk, t_blk in ((128, 2048), (512, 1024), (128, 4096)):
                    if c % c_blk or b % t_blk:
                        continue
                    gb = c * b * bytes_s / 1e9
                    dt = time_variant(
                        build(c, b, 128, mode, False,
                              c_blk=c_blk, t_blk=t_blk, fmt=fmt),
                        x_in, iters)
                    print(f"{mode}:{fmt}:tile={c_blk}x{t_blk:<5d} "
                          f"{dt * 1e3:8.3f} ms/pass   "
                          f"in-stream {gb / dt:6.1f} GB/s", flush=True)
    # tile-major layout x ingest dtype: each grid block one contiguous span
    if "tm" in secs:
        for fmt, bytes_s in (("f32w", 4), ("u8", 2)):
            for mode in ("stream", "full"):
                for c_blk, t_blk in ((128, 2048), (512, 1024), (128, 4096),
                                     (512, 2048), (1024, 1024)):
                    if c % c_blk or b % t_blk:
                        continue
                    n_tt = b // t_blk
                    if fmt == "u8":
                        x_in = tuple(
                            jnp.asarray(np.ascontiguousarray(
                                (iq[..., p].astype(np.int16) - 128)
                                .astype(np.int8)
                                .reshape(c, n_tt, t_blk)
                                .transpose(1, 0, 2)))
                            for p in (0, 1))
                    else:
                        x_in = jnp.asarray(np.ascontiguousarray(
                            np.asarray(xw).reshape(c, n_tt, t_blk)
                            .transpose(1, 0, 2)))
                    gb = c * b * bytes_s / 1e9
                    try:
                        dt = time_variant(
                            build(c, b, 128, mode, False, c_blk=c_blk,
                                  t_blk=t_blk, fmt=fmt, tile_major=True),
                            x_in, iters)
                    except Exception as e:
                        print(f"{mode}:{fmt}:TM:tile={c_blk}x{t_blk} "
                              f"FAIL {type(e).__name__}: {str(e)[:90]}",
                              flush=True)
                        continue
                    print(f"{mode}:{fmt}:TM:tile={c_blk}x{t_blk:<5d} "
                          f"{dt * 1e3:8.3f} ms/pass   "
                          f"in-stream {gb / dt:6.1f} GB/s", flush=True)

    if "engines" in secs:
        for mode in ("stream", "unpack", "dots", "full"):
            for no, int8 in ((128, False), (128, True), (256, False),
                             (256, True)):
                if mode in ("stream", "unpack") and (no != 128 or int8):
                    continue  # no dots in these variants
                dt = time_variant(build(c, b, no, mode, int8), xw, iters)
                tag = f"{mode}:no={no}:{'int8' if int8 else 'bf16x2'}"
                print(
                    f"{tag:28s} {dt * 1e3:8.3f} ms/pass   "
                    f"in-stream {gb_in / dt:6.1f} GB/s"
                )

    # tile-geometry sweep: the HBM sweep's read benchmark hits ~489 GB/s on
    # 2-8 MB blocks while the production [128, 2048] (1 MB) tile streams at
    # ~369 — find the shape that closes the gap (VMEM budget permitting)
    if "tiles" in secs:
        for mode in ("stream", "full"):
            for c_blk, t_blk in ((128, 2048), (128, 4096), (256, 1024),
                                 (256, 2048), (512, 1024), (512, 2048)):
                if c % c_blk or b % t_blk or t_blk % 512:
                    continue
                # scoped VMEM: 2 scratch + 2x double-buffered input + output
                vmem_mb = (
                    2 * c_blk * (_TB + t_blk) + 2 * 2 * c_blk * t_blk
                    + 2 * c_blk * t_blk // 4
                ) * 4 / 1e6
                if vmem_mb > 14.5:
                    continue
                dt = time_variant(
                    build(c, b, 128, mode, False, c_blk=c_blk, t_blk=t_blk),
                    xw, iters,
                )
                print(
                    f"{mode}:tile={c_blk}x{t_blk:<5d} "
                    f"{dt * 1e3:11.3f} ms/pass   "
                    f"in-stream {gb_in / dt:6.1f} GB/s   "
                    f"(~{vmem_mb:.1f} MB VMEM)"
                )

    # parity double-buffered scratch: break the unpack(i+1) -WAR-> dots(i)
    # serialization (see build_dbuf docstring)
    if "dbuf" in secs:
        for mode in ("dots", "full"):
            dt = time_variant(build(c, b, 128, mode, False), xw, iters)
            print(f"{mode}:single-buf             {dt * 1e3:8.3f} ms/pass   "
                  f"in-stream {gb_in / dt:6.1f} GB/s", flush=True)
            dt = time_variant(build_dbuf(c, b, 128, mode), xw, iters)
            print(f"{mode}:double-buf             {dt * 1e3:8.3f} ms/pass   "
                  f"in-stream {gb_in / dt:6.1f} GB/s", flush=True)

    # int8-direct: i8 plane ingest + int8 band dots straight off the input
    # ref (no full-tile scratch, half the HBM bytes — see build_i8direct)
    if "i8d" in secs:
        xr8 = jnp.asarray((iq[..., 0].astype(np.int16) - 128).astype(np.int8))
        xi8 = jnp.asarray((iq[..., 1].astype(np.int16) - 128).astype(np.int8))
        gb8 = c * b * 2 / 1e9
        for mode in ("dots", "full"):
            dt = time_variant(build_i8direct(c, b, 128, mode),
                              (xr8, xi8), iters)
            print(f"{mode}:i8direct               {dt * 1e3:8.3f} ms/pass   "
                  f"in-stream {gb8 / dt:6.1f} GB/s", flush=True)

    # i8direct decomposition: DMA floor, WAR/assembly cost, tile size, and
    # parallel-channel semantics
    if "i8x" in secs:
        xr8 = jnp.asarray((iq[..., 0].astype(np.int16) - 128).astype(np.int8))
        xi8 = jnp.asarray((iq[..., 1].astype(np.int16) - 128).astype(np.int8))
        gb8 = c * b * 2 / 1e9
        dt = time_variant(build(c, b, 128, "stream", False, fmt="u8"),
                          (xr8, xi8), iters)
        print(f"stream:i8                    {dt * 1e3:8.3f} ms/pass   "
              f"in-stream {gb8 / dt:6.1f} GB/s", flush=True)
        for tag, kw in (
            ("dots:i8d:noasm", dict(noasm=True)),
            ("dots:i8d:t4096", dict(t_blk=4096)),
            ("dots:i8d:semP", dict(semantics=("parallel", "arbitrary"))),
            ("dots:i8d:t4096:noasm", dict(t_blk=4096, noasm=True)),
            # scratch-free AND fully-parallel grid: if THIS overlaps DMA
            # with the dots (~stream time), the additive behavior of every
            # scratch-carrying kernel is the 'arbitrary' inner dim
            # disabling Mosaic's cross-iteration overlap
            ("dots:i8d:noasm:semPP",
             dict(noasm=True, semantics=("parallel", "parallel"))),
            ("full:i8d:noasm:semPP",
             dict(noasm=True, semantics=("parallel", "parallel"),
                  mode="full")),
        ):
            try:
                md = kw.pop("mode", "dots")
                dt = time_variant(build_i8direct(c, b, 128, md, **kw),
                                  (xr8, xi8), iters)
            except Exception as e:
                print(f"{tag} FAIL {type(e).__name__}: {str(e)[:90]}",
                      flush=True)
                continue
            print(f"{tag:28s} {dt * 1e3:8.3f} ms/pass   "
                  f"in-stream {gb8 / dt:6.1f} GB/s", flush=True)

    # manual double-buffered DMA pipeline (bypasses the auto-pipeliner)
    if "man" in secs:
        xr8 = jnp.asarray((iq[..., 0].astype(np.int16) - 128).astype(np.int8))
        xi8 = jnp.asarray((iq[..., 1].astype(np.int16) - 128).astype(np.int8))
        gb8 = c * b * 2 / 1e9
        for mode in ("dots", "full"):
            for t_blk in (2048, 4096):
                if b % t_blk:
                    continue
                try:
                    dt = time_variant(
                        build_i8manual(c, b, mode=mode, t_blk=t_blk),
                        (xr8, xi8), iters)
                except Exception as e:
                    print(f"{mode}:i8man:t={t_blk} FAIL "
                          f"{type(e).__name__}: {str(e)[:120]}", flush=True)
                    continue
                print(f"{mode}:i8man:t={t_blk:<5d} "
                      f"{dt * 1e3:8.3f} ms/pass   "
                      f"in-stream {gb8 / dt:6.1f} GB/s", flush=True)

    # grid-dimension semantics: the K1 engines measure ADDITIVE (stream +
    # dots + atan2), i.e. the auto-pipeliner is not overlapping the input
    # DMA with compute.  All production kernels leave dimension_semantics
    # unset (= all-arbitrary); declaring the channel dim PARALLEL tells
    # Mosaic c-tiles are independent — probe whether that recovers overlap.
    if "sem" in secs:
        for sem in (None, ("parallel", "arbitrary")):
            for mode in ("stream", "dots", "full"):
                dt = time_variant(
                    build(c, b, 128, mode, False, semantics=sem), xw, iters)
                tag = f"{mode}:sem={sem and 'P,A' or 'default'}"
                print(f"{tag:28s} {dt * 1e3:8.3f} ms/pass   "
                      f"in-stream {gb_in / dt:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
