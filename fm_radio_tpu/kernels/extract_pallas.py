"""Fused extraction kernel: L+R / L-R / RDS band extraction in ONE HBM pass.

Parity: ``Broadcast_FM_Demod::ExtractComponents`` (``broadcast_fm_demod.cpp:
463-536``) — the L+R ds x4 (Re path), the harmonic-2 mix + ds x4 (L-R), and
the harmonic-3 mix + ds x8 (RDS).

The three unfused stages each re-read the analytic signal fm_out_iq and the
PLL track dt from HBM; this kernel reads them once, evaluates both harmonic
phasors with the reference's Chebyshev polynomial (``chebyshev_sine.h``),
mixes, and runs all five decimating banded matmuls from VMEM.  The mixed
signals (which exist only here) carry their own overlap-save tails in VMEM
scratch across the sequential time grid, emitted at the end as the
``ds_audio_lmr`` / ``ds_rds`` states.

The per-block L-R phase-error estimate (strided arctan2 average,
``broadcast_fm_demod.cpp:496-517``) stays outside: it needs the decimated
L-R IQ, which is an output of this kernel anyway, and runs on arrays 32x
smaller than the input.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fm_radio_tpu.kernels.frontend_pallas import _dot3, _split_bf16
from fm_radio_tpu.kernels.midend_pallas import _band_m, _NO, _TB

# the reference's sin(2*pi*x) polynomial (chebyshev_sine.h:13-46) and cycle
# wrap — single-sourced in ops/cmath, shared with the PLL/BPSK/chain kernels
from fm_radio_tpu.ops.cmath import chebyshev_sine as _cheb_sine
from fm_radio_tpu.ops.cmath import wrap_cycles as _wrapc


def _extract_body(
    xr, xi, dt, off, ba_ref, bm_ref, br_ref,
    blpr_ref, blmr_r_ref, blmr_i_ref, brds_r_ref, brds_i_ref,
    *, t_blk: int, n_out: int, h_lmr: float, h_rds: float, interp: bool,
    rds_acc_ref=None,
):
    """One fm_out_iq tile (xr, xi, dt all [c, t_blk]) -> (lpr, lmr_re,
    lmr_im [c, t_blk//4], rds_re, rds_im [c, t_blk//8]) values; updates the
    5 carried overlap-save buffers.  n_out = outputs per banded sub-matmul
    (128 standalone; t_blk//4 resp. //8 capped at 128 in the full-chain
    kernel, whose tiles are shorter).  Shared with kernels/chain_pallas.py."""
    na = max(t_blk // (n_out * 4), 1)   # audio sub-matmuls (m=4)
    nr = max(t_blk // (n_out * 8), 1)   # rds sub-matmuls (m=8)

    # harmonic phasors (apply_harmonic_pll.cpp:11-24 arithmetic)
    if h_lmr == 2.0 and h_rds == 3.0:
        # standard broadcast-FM harmonics (38k/19k, 57k/19k): evaluate ONE
        # base phasor p1 = e^{j2pi dt} with the Chebyshev polynomial and
        # build p2 = p1^2 (rotated by the per-channel offset phasor, a
        # [c, 1] constant) and p3 = p1^2 * p1 by complex products — 2
        # full-rate polynomial evaluations instead of 4 (~30% of this
        # kernel's VPU work), amplitude error ~2x the polynomial's 3.6e-8.
        c1 = _cheb_sine(_wrapc(dt + jnp.float32(0.25)))
        s1 = _cheb_sine(_wrapc(dt))
        c2r = c1 * c1 - s1 * s1
        s2r = jnp.float32(2.0) * c1 * s1
        co_ = _cheb_sine(_wrapc(off + jnp.float32(0.25)))   # [c, 1]
        so_ = _cheb_sine(_wrapc(off))
        c2 = c2r * co_ - s2r * so_
        s2 = s2r * co_ + c2r * so_
        c3 = c2r * c1 - s2r * s1
        s3 = s2r * c1 + c2r * s1
    else:
        t2 = dt * jnp.float32(h_lmr) + off
        c2 = _cheb_sine(_wrapc(t2 + jnp.float32(0.25)))
        s2 = _cheb_sine(_wrapc(t2))
        t3 = dt * jnp.float32(h_rds)
        c3 = _cheb_sine(_wrapc(t3 + jnp.float32(0.25)))
        s3 = _cheb_sine(_wrapc(t3))

    blpr_ref[:, _TB:] = xr
    blmr_r_ref[:, _TB:] = xr * c2 - xi * s2
    blmr_i_ref[:, _TB:] = xr * s2 + xi * c2
    brds_r_ref[:, _TB:] = xr * c3 - xi * s3
    brds_i_ref[:, _TB:] = xr * s3 + xi * c3

    ba_hi, ba_lo = _split_bf16(ba_ref[...], interp)
    bm_hi, bm_lo = _split_bf16(bm_ref[...], interp)
    br_hi, br_lo = _split_bf16(br_ref[...], interp)

    def dec(buf_ref, b_hi, b_lo, m, n_sub):
        no = min(n_out, t_blk // m)
        w = no * m + _TB
        x_hi, x_lo = _split_bf16(buf_ref[...], interp)
        parts = []
        for s in range(n_sub):
            w0 = s * no * m
            parts.append(_dot3(x_hi[:, w0 : w0 + w], x_lo[:, w0 : w0 + w],
                               b_hi, b_lo))
        return parts[0] if n_sub == 1 else jnp.concatenate(parts, axis=-1)

    lpr = dec(blpr_ref, ba_hi, ba_lo, 4, na)
    lmr_re = dec(blmr_r_ref, bm_hi, bm_lo, 4, na)
    lmr_im = dec(blmr_i_ref, bm_hi, bm_lo, 4, na)
    rds_re = dec(brds_r_ref, br_hi, br_lo, 8, nr)
    rds_im = dec(brds_i_ref, br_hi, br_lo, 8, nr)

    if rds_acc_ref is not None:
        # RDS AGC power measurement fused into this kernel (the values are
        # already in VMEM): the gain update happens in XLA on the [C, 1] sum
        # and the BPSK kernel applies it at ingest — the separate
        # agc_process_p pass over the rds planes (a pure HBM round trip,
        # broadcast_fm_demod.cpp:538-541) disappears.
        rds_acc_ref[...] = rds_acc_ref[...] + jnp.sum(
            rds_re * rds_re + rds_im * rds_im, axis=-1, keepdims=True
        )

    for buf in (blpr_ref, blmr_r_ref, blmr_i_ref, brds_r_ref, brds_i_ref):
        buf[:, :_TB] = buf[:, t_blk:]
    return lpr, lmr_re, lmr_im, rds_re, rds_im


def _extract_kernel(
    re_ref, im_ref, dt_ref, off_ref, tails_ref, ba_ref, bm_ref, br_ref,
    lpr_ref, lmr_re_ref, lmr_im_ref, rds_re_ref, rds_im_ref, out_tails_ref,
    out_pow_ref,
    blpr_ref, blmr_r_ref, blmr_i_ref, brds_r_ref, brds_i_ref, acc_ref,
    *, t_blk: int, n_tt: int, h_lmr: float, h_rds: float, interp: bool,
    iq_i16: bool = False, dt_i16: bool = False,
):
    ti = pl.program_id(1)

    @pl.when(ti == 0)
    def _init():
        blpr_ref[:, :_TB] = tails_ref[0]
        blmr_r_ref[:, :_TB] = tails_ref[1]
        blmr_i_ref[:, :_TB] = tails_ref[2]
        brds_r_ref[:, :_TB] = tails_ref[3]
        brds_i_ref[:, :_TB] = tails_ref[4]
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # int16 inter-stage inputs (kernels/qformat.py): dequant in-VMEM
    from fm_radio_tpu.kernels.qformat import IQ_SCALE, PH_SCALE, dq_i16

    xr = dq_i16(re_ref[...], IQ_SCALE) if iq_i16 else re_ref[...]
    xi = dq_i16(im_ref[...], IQ_SCALE) if iq_i16 else im_ref[...]
    dt = dq_i16(dt_ref[...], PH_SCALE) if dt_i16 else dt_ref[...]
    lpr, lmr_re, lmr_im, rds_re, rds_im = _extract_body(
        xr, xi, dt, off_ref[...],
        ba_ref, bm_ref, br_ref,
        blpr_ref, blmr_r_ref, blmr_i_ref, brds_r_ref, brds_i_ref,
        t_blk=t_blk, n_out=_NO, h_lmr=h_lmr, h_rds=h_rds, interp=interp,
        rds_acc_ref=acc_ref,
    )
    lpr_ref[...] = lpr
    lmr_re_ref[...] = lmr_re
    lmr_im_ref[...] = lmr_im
    rds_re_ref[...] = rds_re
    rds_im_ref[...] = rds_im

    @pl.when(ti == n_tt - 1)
    def _finish():
        out_tails_ref[0] = blpr_ref[:, :_TB]
        out_tails_ref[1] = blmr_r_ref[:, :_TB]
        out_tails_ref[2] = blmr_i_ref[:, :_TB]
        out_tails_ref[3] = brds_r_ref[:, :_TB]
        out_tails_ref[4] = brds_i_ref[:, :_TB]
        out_pow_ref[...] = acc_ref[...]


def pick_tiles_ext(c: int, b8: int) -> tuple[int, int] | None:
    if b8 % (_NO * 8) != 0:
        return None
    # 1024 fits the 5 tail-extended scratch buffers + bf16 splits + 3 input
    # streams inside the 16 MB scoped-VMEM budget (2048 overflows by ~1.8 MB)
    t_blk = _NO * 8
    c_blk = c if c <= 128 else 128
    if c % c_blk != 0:
        return None
    return c_blk, t_blk


def pack_ext_tails(state: dict, c: int, halo_a: int, halo_r: int):
    """Carried decimator tails -> the kernel's [5, C, _TB] plane rows
    (lpr.re, lmr.re, lmr.im, rds.re, rds.im) — shared with the chain
    megakernel.  (lpr.im is carried separately by the chain variant.)"""
    tails = jnp.zeros((5, c, _TB), jnp.float32)
    tails = tails.at[0, :, _TB - halo_a :].set(state["ds_audio_lpr"].real)
    tails = tails.at[1, :, _TB - halo_a :].set(state["ds_audio_lmr"].real)
    tails = tails.at[2, :, _TB - halo_a :].set(state["ds_audio_lmr"].imag)
    tails = tails.at[3, :, _TB - halo_r :].set(state["ds_rds"].real)
    tails = tails.at[4, :, _TB - halo_r :].set(state["ds_rds"].imag)
    return tails


def extract_pallas(
    coeffs,
    cfg,
    state: dict,
    iq_p: tuple[jnp.ndarray, jnp.ndarray],
    dt: jnp.ndarray,
    interpret: bool = False,
):
    """Fused L+R / L-R / RDS extraction.

    Uses/updates state keys ds_audio_lpr, ds_audio_lmr, ds_rds (the
    lmr_phase_err offset is READ here but updated by the caller from the
    decimated L-R IQ, exactly like the unfused path).
    Returns (state', audio_lpr [C, B/32], (lmr_re, lmr_im) [C, B/32],
    (rds_re, rds_im) [C, B/64], rds_pow [C] — the block power sum of the
    decimated RDS signal, measured in-kernel so the RDS AGC
    (broadcast_fm_demod.cpp:538-541) needs no separate pass over the planes).
    """
    xr, xi = iq_p
    c, b8 = xr.shape
    tiles = pick_tiles_ext(c, b8)
    assert tiles is not None
    c_blk, t_blk = tiles
    n_tt = b8 // t_blk
    nn_a = coeffs.taps_audio_lpr.shape[0]
    assert coeffs.taps_audio_lmr.shape[0] == nn_a
    nn_r = coeffs.taps_rds.shape[0]
    halo_a = nn_a - 4
    halo_r = nn_r - 8
    h_lmr = cfg.analog.f_audio_lmr_center / cfg.analog.f_pilot
    h_rds = cfg.analog.f_rds_center / cfg.analog.f_pilot

    # design-time precomputed tables (see DemodCoeffs.kernel_tables):
    # building these HERE put their gathers inside the scan body — the
    # round-3 stage table's entire "in-chain K3 packing" delta (~2 ms/step)
    # was XLA re-gathering these three matrices every block
    tbl = getattr(coeffs, "kernel_tables", None) or {}
    ba = tbl.get("band_audio_lpr")
    if ba is None:
        ba = _band_m(coeffs.taps_audio_lpr, 4)
    bm = tbl.get("band_audio_lmr")
    if bm is None:
        bm = _band_m(coeffs.taps_audio_lmr, 4)
    br = tbl.get("band_rds")
    if br is None:
        br = _band_m(coeffs.taps_rds, 8)

    tails = pack_ext_tails(state, c, halo_a, halo_r)

    iq_i16 = xr.dtype == jnp.int16
    dt_i16 = dt.dtype == jnp.int16
    kern = functools.partial(
        _extract_kernel, t_blk=t_blk, n_tt=n_tt, h_lmr=h_lmr, h_rds=h_rds,
        interp=interpret, iq_i16=iq_i16, dt_i16=dt_i16,
    )
    grid = (c // c_blk, n_tt)
    rowspec = lambda w: pl.BlockSpec((c_blk, w), lambda ci, ti: (ci, 0),
                                     memory_space=pltpu.VMEM)
    tspec = lambda div: pl.BlockSpec((c_blk, t_blk // div),
                                     lambda ci, ti: (ci, ti),
                                     memory_space=pltpu.VMEM)
    (lpr, lmr_re, lmr_im, rds_re, rds_im, out_tails, out_pow) = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            tspec(1), tspec(1), tspec(1),
            rowspec(1),
            pl.BlockSpec((5, c_blk, _TB), lambda ci, ti: (0, ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_NO * 4 + _TB, _NO), lambda ci, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_NO * 4 + _TB, _NO), lambda ci, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_NO * 8 + _TB, _NO), lambda ci, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            tspec(4), tspec(4), tspec(4), tspec(8), tspec(8),
            pl.BlockSpec((5, c_blk, _TB), lambda ci, ti: (0, ci, 0),
                         memory_space=pltpu.VMEM),
            rowspec(1),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, b8 // 4), jnp.float32),
            jax.ShapeDtypeStruct((c, b8 // 4), jnp.float32),
            jax.ShapeDtypeStruct((c, b8 // 4), jnp.float32),
            jax.ShapeDtypeStruct((c, b8 // 8), jnp.float32),
            jax.ShapeDtypeStruct((c, b8 // 8), jnp.float32),
            jax.ShapeDtypeStruct((5, c, _TB), jnp.float32),
            jax.ShapeDtypeStruct((c, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((c_blk, _TB + t_blk), jnp.float32) for _ in range(5)
        ] + [pltpu.VMEM((c_blk, 1), jnp.float32)],
        interpret=interpret,
    )(xr, xi, dt, state["lmr_phase_err"][:, None], tails, ba, bm, br)

    new_state = dict(state)
    xr_t, xi_t = xr[:, b8 - halo_a :], xi[:, b8 - halo_a :]
    if iq_i16:
        from fm_radio_tpu.kernels.qformat import IQ_SCALE as _IS

        inv = jnp.float32(1.0 / _IS)
        xr_t = xr_t.astype(jnp.float32) * inv
        xi_t = xi_t.astype(jnp.float32) * inv
    new_state["ds_audio_lpr"] = jax.lax.complex(xr_t, xi_t)
    new_state["ds_audio_lmr"] = jax.lax.complex(
        out_tails[1, :, _TB - halo_a :], out_tails[2, :, _TB - halo_a :]
    )
    new_state["ds_rds"] = jax.lax.complex(
        out_tails[3, :, _TB - halo_r :], out_tails[4, :, _TB - halo_r :]
    )
    return new_state, lpr, (lmr_re, lmr_im), (rds_re, rds_im), out_pow[:, 0]
