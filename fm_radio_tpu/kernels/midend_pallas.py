"""Fused mid-end kernel: ds x2 LPF + de-emphasis + Hilbert + pilot peak IIR
+ pilot phase, in ONE HBM pass.

Parity: stages 3-5 of ``Broadcast_FM_Demod`` — the fm_out decimator
(``broadcast_fm_demod.cpp:400-401``), optional IIR de-emphasis (``:403-406``),
the 65-tap Hilbert FIR (``:408-410``) and the pilot peak filter + AGC power
measurement feeding the PLL (``:418-429``).

Reads fm_demod [C, B/4] once; writes the analytic signal planes fm_out_iq
(re, im) [C, B/8], the pilot phase theta = angle(peak(fm_out_iq))/2pi
(the data-parallel half of the PLL phase detector — the serial PI/NCO loop
stays in kernels/pll_pallas.py), and the pilot power sum for the AGC gain
state.  Everything in between — fm_out, the de-emphasized signal, the peak
filter output — lives only in VMEM.

IIR stages (de-emphasis order 1, peak order 2) are exact: within a tile the
zero-state response is a lower-triangular-Toeplitz matmul of the full
impulse response h = b * g (see ops/iir.py::_iir_toeplitz); the x/y initial
conditions propagate through per-tile responses carried in VMEM scratch —
the grid's time axis is sequential, so no prefix pass is needed.

Layout: channels on sublanes, time on lanes; every matmul window is
128-lane aligned by construction (TB = 128 carried-tail buffers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fm_radio_tpu.kernels.frontend_pallas import _dot3, _split_bf16
from fm_radio_tpu.kernels.pll_pallas import _atan2
from fm_radio_tpu.ops.iir import _companion, _power_stack

_TB = 128   # carried-tail width for ds2 + hilbert buffers
_LI = 128   # IIR Toeplitz sub-chunk (FLOPs/sample = 2*_LI per pass)
_NO = 128   # outputs per banded sub-matmul

# scratch state columns
_DE_X1, _DE_Y1 = 0, 1
_PKR_X1, _PKR_X2, _PKI_X1, _PKI_X2 = 2, 3, 4, 5
_PKR_Y1, _PKR_Y2, _PKI_Y1, _PKI_Y2 = 6, 7, 8, 9
_NSTATE = 10


def _band_m(taps, m: int, n_out: int = _NO) -> jnp.ndarray:
    """[n_out*m + _TB, n_out] aligned band: y[j] = sum_k w_rev[k] buf[TB -
    halo + m*j + k], halo = nn - m.  n_out < _NO is used by the full-chain
    kernel, whose per-tile decimator outputs are sub-128-lane segments."""
    taps = jnp.asarray(taps, jnp.float32)
    nn = taps.shape[0]
    halo = nn - m
    assert halo <= _TB
    w = n_out * m + _TB
    w_rev = taps[::-1]
    rows = jnp.arange(w)[:, None]
    cols = jnp.arange(n_out)[None, :]
    k = rows - (_TB - halo + m * cols)
    valid = (k >= 0) & (k < nn)
    return jnp.where(valid, jnp.take(w_rev, jnp.clip(k, 0, nn - 1)), 0.0)


def _iir_tile_mats(b, a, l: int):
    """Host/trace-side Toeplitz pieces for an exact in-tile IIR (order r,
    ff order ob): T [L, L] (y_zs = x_tile @ T), hm [ob, L] (x-halo rows),
    pm [r, L] (y-state rows) — see ops/iir.py::_iir_toeplitz for the math."""
    b = jnp.asarray(b, jnp.float32)
    a = jnp.asarray(a, jnp.float32)
    r = a.shape[0] - 1
    ob = b.shape[0] - 1
    amat = _companion(a)
    stack = _power_stack(amat, l)          # [L+1, r, r]
    g = stack[:l, 0, 0]                    # [L]
    h = jnp.zeros((l,), jnp.float32)
    for j in range(ob + 1):
        h = h.at[j:].add(b[j] * g[: l - j])
    ii = jnp.arange(l)
    dmat = ii[None, :] - ii[:, None]       # out_col - in_row
    t_mat = jnp.where(dmat >= 0, jnp.take(h, jnp.clip(dmat, 0, l - 1)), 0.0)
    # x-halo: hm[q, i] = sum_{j>q} b[j] g[i + q + 1 - j]
    hm = jnp.zeros((max(ob, 1), l), jnp.float32)
    for q in range(ob):
        for j in range(q + 1, ob + 1):
            k0 = j - q - 1
            hm = hm.at[q].add(
                b[j] * jnp.where(ii - k0 >= 0,
                                 jnp.take(g, jnp.clip(ii - k0, 0, l - 1)), 0.0)
            )
    pm = stack[1 : l + 1, 0, :].T          # [r, L]
    return t_mat, hm, pm


def _col(ref, j):
    return ref[:, j : j + 1]


def _dot4(x_hi, x_lo, b_hi, b_lo):
    """bf16x4: all four hi/lo cross products — the lo@lo term _dot3 drops
    is ~2^-16-relative, and the 19 kHz pilot peak filter (pole 0.9999,
    ~4 Hz bandwidth) COHERENTLY accumulates per-chunk rounding through its
    state recursion with gain ~1/(1-r): with _dot3 the kernel's pilot
    phase drifted ~1e-2 cycles from the f32 ops path (measured on
    hardware); the fourth pass restores f32-grade error.  Used only for
    the two IIR stages — the broadband FIR stages stay at _dot3."""
    f32 = jnp.float32
    return (
        jnp.dot(x_hi, b_hi, preferred_element_type=f32)
        + jnp.dot(x_hi, b_lo, preferred_element_type=f32)
        + jnp.dot(x_lo, b_hi, preferred_element_type=f32)
        + jnp.dot(x_lo, b_lo, preferred_element_type=f32)
    )


def _midend_body(
    x,
    band2_ref, band3_ref, t1_ref, aux1_ref, tp_ref, auxp_ref,
    buf2_ref, buf3_ref, st_ref, acc_ref,
    *, t_blk: int, use_deemph: bool, hilb_delay: int, interp: bool,
):
    """One fm_demod tile ``x`` [c, t_blk] -> (hi_re, hi_im, theta) values
    [c, t_blk//2]; updates the carried buf2/buf3/st/acc scratch refs.
    Shared between the standalone mid-end kernel and the full-chain kernel
    (kernels/chain_pallas.py)."""
    l = t_blk // 2
    n2 = t_blk // (_NO * 2)
    n3 = l // _NO

    buf2_ref[:, _TB:] = x

    # ---- ds x2 ----------------------------------------------------------
    b2_hi, b2_lo = _split_bf16(band2_ref[...], interp)
    x2_hi, x2_lo = _split_bf16(buf2_ref[...], interp)
    w2 = _NO * 2 + _TB
    parts = []
    for s in range(n2):
        w0 = s * _NO * 2
        parts.append(_dot3(x2_hi[:, w0 : w0 + w2], x2_lo[:, w0 : w0 + w2],
                           b2_hi, b2_lo))
    fm_out = parts[0] if n2 == 1 else jnp.concatenate(parts, axis=-1)  # [c, L]

    # ---- de-emphasis (exact order-1 IIR, sub-chunked Toeplitz) -----------
    if use_deemph:
        t1_hi, t1_lo = _split_bf16(t1_ref[...], interp)
        hm1 = aux1_ref[0:1, :]   # [1, LI]
        pm1 = aux1_ref[1:2, :]   # [1, LI]
        parts = []
        for s in range(l // _LI):
            xs = fm_out[:, s * _LI : (s + 1) * _LI]
            f_hi, f_lo = _split_bf16(xs, interp)
            y = _dot4(f_hi, f_lo, t1_hi, t1_lo)
            y = y + _col(st_ref, _DE_X1) * hm1 + _col(st_ref, _DE_Y1) * pm1
            st_ref[:, _DE_X1 : _DE_X1 + 1] = xs[:, _LI - 1 :]
            st_ref[:, _DE_Y1 : _DE_Y1 + 1] = y[:, _LI - 1 :]
            parts.append(y)
        fm_out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, -1)

    buf3_ref[:, _TB:] = fm_out

    # ---- Hilbert: delayed real + 65-tap FIR imag --------------------------
    b3_hi, b3_lo = _split_bf16(band3_ref[...], interp)
    x3_hi, x3_lo = _split_bf16(buf3_ref[...], interp)
    w3 = _NO + _TB
    parts = []
    for s in range(n3):
        w0 = s * _NO
        parts.append(_dot3(x3_hi[:, w0 : w0 + w3], x3_lo[:, w0 : w0 + w3],
                           b3_hi, b3_lo))
    hi_im = parts[0] if n3 == 1 else jnp.concatenate(parts, axis=-1)
    hi_re = buf3_ref[:, _TB - hilb_delay : _TB - hilb_delay + l]

    # ---- pilot peak filter (exact order-2 IIR, sub-chunked Toeplitz) -----
    # Sub-chunks of _LI samples: [c, LI] x [LI, LI] matmuls keep the
    # Toeplitz FLOPs at 2*LI/sample instead of 2*L (4x less at L=512),
    # with the 2-scalar state propagated exactly between sub-chunks.
    tp_hi, tp_lo = _split_bf16(tp_ref[...], interp)
    hm_p = auxp_ref[0:2, :]  # [2, LI]
    pm_p = auxp_ref[2:4, :]  # [2, LI]

    def peak(plane, cx1, cx2, cy1, cy2):
        parts = []
        for s in range(l // _LI):
            xs = plane[:, s * _LI : (s + 1) * _LI]
            p_hi, p_lo = _split_bf16(xs, interp)
            y = _dot4(p_hi, p_lo, tp_hi, tp_lo)
            y = (y + _col(st_ref, cx1) * hm_p[0:1, :]
                 + _col(st_ref, cx2) * hm_p[1:2, :]
                 + _col(st_ref, cy1) * pm_p[0:1, :]
                 + _col(st_ref, cy2) * pm_p[1:2, :])
            st_ref[:, cx2 : cx2 + 1] = xs[:, _LI - 2 : _LI - 1]
            st_ref[:, cx1 : cx1 + 1] = xs[:, _LI - 1 :]
            st_ref[:, cy2 : cy2 + 1] = y[:, _LI - 2 : _LI - 1]
            st_ref[:, cy1 : cy1 + 1] = y[:, _LI - 1 :]
            parts.append(y)
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, -1)

    pk_re = peak(hi_re, _PKR_X1, _PKR_X2, _PKR_Y1, _PKR_Y2)
    pk_im = peak(hi_im, _PKI_X1, _PKI_X2, _PKI_Y1, _PKI_Y2)

    # data-parallel half of the PLL phase detector: angle(pilot) in cycles
    theta = _atan2(pk_im, pk_re) * jnp.float32(1.0 / (2.0 * np.pi))
    # pilot-AGC power accumulation, chunked at the PRODUCTION tile's pilot
    # width (512 = 4096-input-tile / 8) so the accumulation ORDER is
    # tile-width-invariant: a wider tile (FMTPU_K12_T lens) sums the same
    # 512-wide partials in the same stream sequence and agc_pilot stays
    # BIT-identical to the split/4096 path (round-4's 8192 lens was
    # rejected for exactly this order change — docs/PERF.md)
    p = pk_re * pk_re + pk_im * pk_im
    w = p.shape[-1]
    for s0 in range(0, w, 512):
        acc_ref[...] = acc_ref[...] + jnp.sum(
            p[:, s0 : min(s0 + 512, w)], axis=-1, keepdims=True
        )

    # carry the tails forward
    buf2_ref[:, :_TB] = buf2_ref[:, t_blk:]
    buf3_ref[:, :_TB] = buf3_ref[:, l:]
    return hi_re, hi_im, theta


def _midend_kernel(
    x_ref, tail2_ref, htail_ref, st0_ref,
    band2_ref, band3_ref, t1_ref, aux1_ref, tp_ref, auxp_ref,
    re_ref, im_ref, th_ref, out_htail_ref, out_st_ref, out_pow_ref,
    buf2_ref, buf3_ref, st_ref, acc_ref,
    *, t_blk: int, n_tt: int, use_deemph: bool, hilb_delay: int, interp: bool,
    in_i16: bool = False, out_i16: bool = False,
):
    ti = pl.program_id(1)

    @pl.when(ti == 0)
    def _init():
        buf2_ref[:, :_TB] = tail2_ref[...]
        buf3_ref[:, :_TB] = htail_ref[...]
        st_ref[...] = st0_ref[...]
        acc_ref[...] = jnp.zeros_like(acc_ref)

    from fm_radio_tpu.kernels.qformat import (
        FM_SCALE, IQ_SCALE, PH_SCALE, dq_i16, q_i16,
    )

    x = dq_i16(x_ref[...], FM_SCALE) if in_i16 else x_ref[...]
    hi_re, hi_im, theta = _midend_body(
        x,
        band2_ref, band3_ref, t1_ref, aux1_ref, tp_ref, auxp_ref,
        buf2_ref, buf3_ref, st_ref, acc_ref,
        t_blk=t_blk, use_deemph=use_deemph, hilb_delay=hilb_delay,
        interp=interp,
    )
    if out_i16:
        re_ref[...] = q_i16(hi_re, IQ_SCALE)
        im_ref[...] = q_i16(hi_im, IQ_SCALE)
        th_ref[...] = q_i16(theta, PH_SCALE)
    else:
        re_ref[...] = hi_re
        im_ref[...] = hi_im
        th_ref[...] = theta

    @pl.when(ti == n_tt - 1)
    def _finish():
        out_htail_ref[...] = buf3_ref[:, :_TB]
        out_st_ref[...] = st_ref[...]
        out_pow_ref[...] = acc_ref[...]


def pick_tiles_mid(c: int, b4: int) -> tuple[int, int] | None:
    """(c_blk, t_blk) over the fm_demod axis, or None if unsupported."""
    if b4 % (_NO * 2) != 0:
        return None
    t_blk = _NO * 2
    while t_blk * 2 <= 1024 and b4 % (t_blk * 2) == 0:
        t_blk *= 2
    c_blk = c if c <= 128 else 128
    if c % c_blk != 0:
        return None
    return c_blk, t_blk


def mid_iir_params(coeffs, use_deemph: bool, _from_tables: bool = True):
    """IIR Toeplitz tile matrices (t1, aux1, tp, auxp) for the de-emphasis
    and pilot-peak stages — shared with the chain megakernel so the state
    layout has exactly one author.

    Prefers the DESIGN-TIME precomputed coeffs.kernel_tables["mid_iir"]
    (make_coeffs builds it with ``_from_tables=False``): computing these
    inside a traced demod_block put their gathers in the scan body at
    ~0.1 ms/step on TPU (see DemodCoeffs.kernel_tables)."""
    if _from_tables:
        tbl = getattr(coeffs, "kernel_tables", None)
        if tbl and "mid_iir" in tbl:
            return tbl["mid_iir"]
    if use_deemph:
        t1, hm1, pm1 = _iir_tile_mats(coeffs.deemph_b, coeffs.deemph_a, _LI)
        aux1 = jnp.concatenate([hm1, pm1], axis=0)  # [2, LI]
    else:
        t1 = jnp.zeros((_LI, _LI), jnp.float32)
        aux1 = jnp.zeros((2, _LI), jnp.float32)
    tp, hm_p, pm_p = _iir_tile_mats(coeffs.peak_b, coeffs.peak_a, _LI)
    auxp = jnp.concatenate([hm_p, pm_p], axis=0)    # [4, LI]
    return t1, aux1, tp, auxp


def pack_mid_state(state: dict, c: int, halo2: int, k_h: int):
    """Carried mid-end state -> kernel form: ds2 tail + Hilbert tail padded
    into [C, _TB] aligned buffers, IIR scalars as [C, _NSTATE] columns."""
    tail2 = jnp.zeros((c, _TB), jnp.float32).at[:, _TB - halo2 :].set(
        state["ds_fm_out"]
    )
    htail = jnp.zeros((c, _TB), jnp.float32).at[:, _TB - (k_h - 1) :].set(
        state["hilbert"]
    )
    de = state["deemph"]
    pk = state["peak_pilot"]
    st0 = jnp.zeros((c, _NSTATE), jnp.float32)
    st0 = st0.at[:, _DE_X1].set(de["x_hist"][:, 0])
    st0 = st0.at[:, _DE_Y1].set(de["y_hist"][:, 0])
    # peak state: planes stacked [2C, 2] newest-first
    st0 = st0.at[:, _PKR_X1].set(pk["x_hist"][:c, 0])
    st0 = st0.at[:, _PKR_X2].set(pk["x_hist"][:c, 1])
    st0 = st0.at[:, _PKI_X1].set(pk["x_hist"][c:, 0])
    st0 = st0.at[:, _PKI_X2].set(pk["x_hist"][c:, 1])
    st0 = st0.at[:, _PKR_Y1].set(pk["y_hist"][:c, 0])
    st0 = st0.at[:, _PKR_Y2].set(pk["y_hist"][:c, 1])
    st0 = st0.at[:, _PKI_Y1].set(pk["y_hist"][c:, 0])
    st0 = st0.at[:, _PKI_Y2].set(pk["y_hist"][c:, 1])
    return tail2, htail, st0


def unpack_mid_iir_state(out_st: jnp.ndarray):
    """[C, _NSTATE] column state -> (deemph, peak_pilot) state dicts."""
    deemph = {
        "x_hist": out_st[:, _DE_X1 : _DE_X1 + 1],
        "y_hist": out_st[:, _DE_Y1 : _DE_Y1 + 1],
    }
    peak = {
        "x_hist": jnp.concatenate(
            [out_st[:, [_PKR_X1, _PKR_X2]], out_st[:, [_PKI_X1, _PKI_X2]]], axis=0
        ),
        "y_hist": jnp.concatenate(
            [out_st[:, [_PKR_Y1, _PKR_Y2]], out_st[:, [_PKI_Y1, _PKI_Y2]]], axis=0
        ),
    }
    return deemph, peak


def midend_pallas(
    coeffs,
    cfg,
    state: dict,
    fm_demod: jnp.ndarray,
    interpret: bool = False,
    out_i16: bool = False,
):
    """Fused ds x2 + de-emphasis + Hilbert + peak IIR + pilot phase.

    state keys used/updated: ds_fm_out, deemph, hilbert, peak_pilot,
    agc_pilot (gain update from the in-kernel power sum).
    Returns (state', fm_out_iq_p (re, im) [C, B/8], theta_cycles [C, B/8]).

    ``fm_demod`` may be int16 (FM_SCALE fixed point, the front end's
    cfg.interstage_i16 output) — dequantized in-VMEM.  ``out_i16=True``
    emits re/im (IQ_SCALE) and theta (PH_SCALE) as int16 — HALF the
    inter-stage HBM bytes (kernels/qformat.py).
    """
    from fm_radio_tpu.ops.agc import _agc_gain

    c, b4 = fm_demod.shape
    tiles = pick_tiles_mid(c, b4)
    assert tiles is not None
    c_blk, t_blk = tiles
    n_tt = b4 // t_blk
    l = t_blk // 2
    nn2 = coeffs.taps_fm_out.shape[0]
    halo2 = nn2 - 2
    k_h = coeffs.taps_hilbert.shape[0]
    hilb_delay = (k_h - 1) // 2
    use_deemph = bool(cfg.use_deemphasis_filter)

    # design-time precomputed tables (see DemodCoeffs.kernel_tables);
    # fallback construction only for callers with hand-built coeffs
    tbl = getattr(coeffs, "kernel_tables", None) or {}
    band2 = tbl.get("band_fm_out")
    if band2 is None:
        band2 = _band_m(coeffs.taps_fm_out, 2)
    band3 = tbl.get("band_hilbert")
    if band3 is None:
        band3 = _band_m(coeffs.taps_hilbert, 1)
    t1, aux1, tp, auxp = mid_iir_params(coeffs, use_deemph)
    tail2, htail, st0 = pack_mid_state(state, c, halo2, k_h)

    in_i16 = fm_demod.dtype == jnp.int16
    kern = functools.partial(
        _midend_kernel, t_blk=t_blk, n_tt=n_tt, use_deemph=use_deemph,
        hilb_delay=hilb_delay, interp=interpret,
        in_i16=in_i16, out_i16=out_i16,
    )
    grid = (c // c_blk, n_tt)
    b8 = b4 // 2
    cspec = lambda shape: pl.BlockSpec(shape, lambda ci, ti: (0, 0),
                                       memory_space=pltpu.VMEM)
    rowspec = lambda w: pl.BlockSpec((c_blk, w), lambda ci, ti: (ci, 0),
                                     memory_space=pltpu.VMEM)
    (re_p, im_p, theta, out_htail, out_st, out_pow) = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((c_blk, t_blk), lambda ci, ti: (ci, ti),
                         memory_space=pltpu.VMEM),
            rowspec(_TB), rowspec(_TB), rowspec(_NSTATE),
            cspec((_NO * 2 + _TB, _NO)),
            cspec((_NO + _TB, _NO)),
            cspec((_LI, _LI)), cspec((2, _LI)),
            cspec((_LI, _LI)), cspec((4, _LI)),
        ],
        out_specs=[
            pl.BlockSpec((c_blk, l), lambda ci, ti: (ci, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_blk, l), lambda ci, ti: (ci, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_blk, l), lambda ci, ti: (ci, ti),
                         memory_space=pltpu.VMEM),
            rowspec(_TB), rowspec(_NSTATE), rowspec(1),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, b8),
                                 jnp.int16 if out_i16 else jnp.float32),
            jax.ShapeDtypeStruct((c, b8),
                                 jnp.int16 if out_i16 else jnp.float32),
            jax.ShapeDtypeStruct((c, b8),
                                 jnp.int16 if out_i16 else jnp.float32),
            jax.ShapeDtypeStruct((c, _TB), jnp.float32),
            jax.ShapeDtypeStruct((c, _NSTATE), jnp.float32),
            jax.ShapeDtypeStruct((c, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((c_blk, _TB + t_blk), jnp.float32),
            pltpu.VMEM((c_blk, _TB + l), jnp.float32),
            pltpu.VMEM((c_blk, _NSTATE), jnp.float32),
            pltpu.VMEM((c_blk, 1), jnp.float32),
        ],
        interpret=interpret,
    )(fm_demod, tail2, htail, st0, band2, band3, t1, aux1, tp, auxp)

    new_state = dict(state)
    tail_src = fm_demod[:, b4 - halo2 :]
    if in_i16:
        from fm_radio_tpu.kernels.qformat import FM_SCALE as _FS

        tail_src = tail_src.astype(jnp.float32) * jnp.float32(1.0 / _FS)
    new_state["ds_fm_out"] = tail_src
    new_state["hilbert"] = out_htail[:, _TB - (k_h - 1) :]
    new_state["deemph"], new_state["peak_pilot"] = unpack_mid_iir_state(out_st)
    # AGC gain state from the in-kernel power sum (scaling itself is skipped:
    # the PLL phase detector is amplitude-invariant — see models/demod.py)
    avg_power = out_pow[:, 0] / jnp.float32(b8)
    new_state["agc_pilot"] = _agc_gain(state["agc_pilot"], avg_power, 1.0, 0.2)
    return new_state, (re_p, im_p), theta
