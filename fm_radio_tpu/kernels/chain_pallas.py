"""Full-chain demod megakernel: ds x4 + discriminator + ds x2 + de-emphasis
+ Hilbert + peak IIR + pilot PLL + L+R / L-R / RDS extraction — ONE kernel,
ONE HBM pass over the baseband.

Parity: the entire ``Broadcast_FM_Demod::Process`` compute chain
(``broadcast_fm_demod.cpp:309-328``) except the final audio mix and the BPSK
symbol sync, which run on arrays 32-64x smaller than the input.

Why: the chain is HBM-bandwidth-bound.  The split pipeline (frontend ->
midend -> PLL -> extract kernels) still round-trips fm_demod (B/4), the
analytic planes + pilot phase (3 x B/8) and the PLL track dt (B/8) through
HBM — ~2.7 GB per 256M-sample step on top of the packed input's 1.1 GB.
This kernel keeps ALL of it in VMEM: per time tile it runs the front-end
banded matmuls + discriminator, the mid-end chain, the serial PI+NCO pilot
loop (the same issue-bound VPU loop as kernels/pll_pallas.py, one tile at a
time with the 5-scalar carry in VMEM scratch), and the five extraction
decimators.  Only the packed input and the decimated audio/RDS bands touch
HBM.

Tiling: grid (channel tiles, time tiles), time innermost/sequential.
t_blk = 1024 baseband samples -> fm tile 256 -> iq/theta tile 128 -> audio
segment 32 lanes, RDS segment 16 lanes.  Sub-128-lane output segments are
accumulated into 128-lane HBM blocks revisited across 4 (audio) resp. 8
(RDS) consecutive tiles, written at static lane offsets under ``pl.when``
predicates — full-width DMA with no strided writes.

The split kernels remain both the fallback (odd shapes, taps mode, c % 8
!= 0) and the parity oracles (tests/test_kernels.py).

STATUS (round 5): RETIRED from perf consideration — kept only as the
measured A/B witness.  Measured -44% vs the split path with round-4
kernels (18.7 vs 33.5 Gsps at the f32w lens, docs/PERF.md), and the
round-4 K12 fusion finding removed this kernel's entire motivation: the
inter-kernel producer->consumer HBM traffic it eliminates is largely
HIDDEN on this chip (overlapped with the next kernel's ramp), so the
~2.7 GB/step "saving" in the paragraph above prices at roughly nothing,
while the structural handicaps are real and permanent (the in-kernel
serial PLL pins tiles to 128 lanes vs the split PLL kernel's 2048, and
the 16 MB VMEM budget forces small time tiles).  The verdict would flip
only if BOTH (a) an EXACT lane-parallel PLL formulation existed (the
approximate block-parallel one measured -14% at production channel
counts and changes outputs) and (b) the target chip did not hide
inter-kernel traffic (e.g. a much lower HBM:compute ratio than v5e).
Neither holds; do not invest further here.  The kernel stays compilable
and output-identical (slow-lane parity test) purely so the -44% A/B
remains reproducible; treat any future maintenance burden as a cue to
delete it outright.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fm_radio_tpu.kernels.frontend_pallas import (
    _band_matrix, _ds4_disc_core, disc_scale, pack_front_tail,
)
from fm_radio_tpu.kernels.midend_pallas import (
    _band_m, _midend_body, _LI, _NO, _NSTATE, _TB,
    mid_iir_params, pack_mid_state, unpack_mid_iir_state,
)
from fm_radio_tpu.kernels.extract_pallas import _extract_body, pack_ext_tails
from fm_radio_tpu.kernels.pll_pallas import pll_consts_from_cfg, _wrap
from fm_radio_tpu.models.pilot_pll import PilotPLLState

_PLL_ROWS = 5  # lpf_x1, lpf_y1, integ, nco_t, prev_pe


def _chain_kernel(
    # inputs (x_refs unpacked by the entry wrappers below)
    k1_tail_ref, k1_prev_ref, band1_ref,
    tail2_ref, htail_ref, mid_st0_ref,
    band2_ref, band3_ref, t1_ref, aux1_ref, tp_ref, auxp_ref,
    pll_st0_ref, off_ref, ext_tails_ref, ba_ref, bm_ref, br_ref,
    # outputs
    lpr_ref, lmr_re_ref, lmr_im_ref, rds_re_ref, rds_im_ref,
    out_k1_tail_ref, out_k1_prev_ref,
    out_tail2_ref, out_htail_ref, out_mid_st_ref, out_pow_ref,
    out_pll_st_ref, out_ext_tails_ref, out_imtail_ref,
    # scratch
    bufr_ref, bufi_ref, k1_carry_ref, fm_ref,
    buf2_ref, buf3_ref, mid_st_ref, acc_ref,
    th_t_ref, dt_t_ref, pll_carry_ref,
    blpr_ref, blmr_r_ref, blmr_i_ref, brds_r_ref, brds_i_ref,
    *, t_blk: int, n_tt: int, scale: float, int_input: bool,
    use_deemph: bool, hilb_delay: int, h_lmr: float, h_rds: float,
    interp: bool,
    ts: float, f_center: float, f_gain: float, ki_ts: float, kp: float,
    lpf_b0: float, lpf_a1: float,
    dbg_skip: tuple = (),
):
    ti = pl.program_id(1)
    l4 = t_blk // 4
    l8 = t_blk // 8
    la = t_blk // 32   # audio segment lanes per tile
    lr = t_blk // 64   # rds segment lanes per tile
    fa = 128 // la     # tiles per audio output block
    fr = 128 // lr     # tiles per rds output block

    @pl.when(ti == 0)
    def _init():
        buf2_ref[:, :_TB] = tail2_ref[...]
        buf3_ref[:, :_TB] = htail_ref[...]
        mid_st_ref[...] = mid_st0_ref[...]
        acc_ref[...] = jnp.zeros_like(acc_ref)
        pll_carry_ref[...] = pll_st0_ref[...]
        blpr_ref[:, :_TB] = ext_tails_ref[0]
        blmr_r_ref[:, :_TB] = ext_tails_ref[1]
        blmr_i_ref[:, :_TB] = ext_tails_ref[2]
        brds_r_ref[:, :_TB] = ext_tails_ref[3]
        brds_i_ref[:, :_TB] = ext_tails_ref[4]

    # ---- K1: polyphase ds x4 + FM discriminator -> fm tile in VMEM -------
    _ds4_disc_core(
        k1_tail_ref, k1_prev_ref, (band1_ref,),
        fm_ref, out_k1_tail_ref, out_k1_prev_ref,
        bufr_ref, bufi_ref, k1_carry_ref,
        t_blk=t_blk, n_tt=n_tt, scale=scale, interp=interp,
        int_input=int_input,
    )

    # ---- K2: ds x2 + de-emphasis + Hilbert + peak IIR + pilot phase ------
    if "mid" in dbg_skip:
        z = jnp.zeros((fm_ref.shape[0], l8), jnp.float32)
        hi_re = hi_im = theta = z + fm_ref[:, :l8]
    else:
        hi_re, hi_im, theta = _midend_body(
        fm_ref[...],
        band2_ref, band3_ref, t1_ref, aux1_ref, tp_ref, auxp_ref,
            buf2_ref, buf3_ref, mid_st_ref, acc_ref,
            t_blk=l4, use_deemph=use_deemph, hilb_delay=hilb_delay,
            interp=interp,
        )

    # ---- PLL: serial PI+NCO loop over this tile's pilot phase ------------
    # Same cell as kernels/pll_pallas.py::_pll_kernel; the 5-row carry
    # persists in VMEM scratch across the sequential time grid, so tile
    # boundaries are exact (this IS the sequential reference order).
    skip_pll = "pll" in dbg_skip
    th_t_ref[...] = theta.T          # [l8, c] time-major for the loop
    one = jnp.float32(1.0)
    two_pi = jnp.float32(2.0 * jnp.pi)
    ts_f = jnp.float32(ts)
    f_center_f = jnp.float32(f_center)
    f_gain_f = jnp.float32(f_gain)
    ki_ts_f = jnp.float32(ki_ts)
    kp_f = jnp.float32(kp)
    b0 = jnp.float32(lpf_b0)
    a1 = jnp.float32(lpf_a1)
    carry0 = tuple(pll_carry_ref[pl.ds(k, 1), :] for k in range(_PLL_ROWS))

    def body(i, carry):
        lpf_x1, lpf_y1, integ, nco_t, prev_pe = carry
        lpf_pe = b0 * (prev_pe + lpf_x1) - a1 * lpf_y1
        integ = jnp.clip(integ + ki_ts_f * prev_pe, -one, one)
        pi_err = lpf_pe * kp_f + integ
        control = jnp.clip(pi_err, -one, one)
        t = _wrap(nco_t + ts_f * (f_center_f + control * f_gain_f))
        th = th_t_ref[pl.ds(i, 1), :]
        pe = two_pi * _wrap(th + t)
        dt_t_ref[pl.ds(i, 1), :] = t
        return (prev_pe, lpf_pe, integ, t, pe)

    if skip_pll:
        dt = theta
    else:
        final = jax.lax.fori_loop(0, l8, body, carry0)
        for k in range(_PLL_ROWS):
            pll_carry_ref[pl.ds(k, 1), :] = final[k]
        dt = dt_t_ref[...].T             # back to [c, l8]

    # ---- K3: harmonic mixes + five decimators ----------------------------
    if "ext" in dbg_skip:
        lpr = lmr_re = lmr_im = dt[:, :t_blk // 32]
        rds_re = rds_im = dt[:, :t_blk // 64]
    else:
        lpr, lmr_re, lmr_im, rds_re, rds_im = _extract_body(
        hi_re, hi_im, dt, off_ref[...], ba_ref, bm_ref, br_ref,
            blpr_ref, blmr_r_ref, blmr_i_ref, brds_r_ref, brds_i_ref,
            t_blk=l8, n_out=_NO, h_lmr=h_lmr, h_rds=h_rds, interp=interp,
        )

    # segment writes at static lane offsets into the revisited output blocks
    for j in range(fa):
        def _wa(j=j):
            lpr_ref[:, j * la : (j + 1) * la] = lpr
            lmr_re_ref[:, j * la : (j + 1) * la] = lmr_re
            lmr_im_ref[:, j * la : (j + 1) * la] = lmr_im
        pl.when(ti % fa == j)(_wa)
    for j in range(fr):
        def _wr(j=j):
            rds_re_ref[:, j * lr : (j + 1) * lr] = rds_re
            rds_im_ref[:, j * lr : (j + 1) * lr] = rds_im
        pl.when(ti % fr == j)(_wr)

    @pl.when(ti == n_tt - 1)
    def _finish():
        out_tail2_ref[...] = buf2_ref[:, :_TB]
        out_htail_ref[...] = buf3_ref[:, :_TB]
        out_mid_st_ref[...] = mid_st_ref[...]
        out_pow_ref[...] = acc_ref[...]
        out_pll_st_ref[...] = pll_carry_ref[...]
        out_ext_tails_ref[0] = blpr_ref[:, :_TB]
        out_ext_tails_ref[1] = blmr_r_ref[:, :_TB]
        out_ext_tails_ref[2] = blmr_i_ref[:, :_TB]
        out_ext_tails_ref[3] = brds_r_ref[:, :_TB]
        out_ext_tails_ref[4] = brds_i_ref[:, :_TB]
        out_imtail_ref[...] = hi_im[:, l8 - _TB :]


# refs after the x ref(s): 18 inputs + 14 outputs + 16 scratch; the input
# staging buffers bufr/bufi are scratch[0:2]
_BUFR_POS = 18 + 14


def _chain_kernel_packed(xw_ref, *refs, t_blk, int_input, **kw):
    # packed u8 IQ words (see frontend_pallas._ds4_disc_packed_kernel)
    from fm_radio_tpu.utils.transfer import unpack_iq_words

    re, im = unpack_iq_words(xw_ref[...])
    refs[_BUFR_POS][:, _TB:] = re
    refs[_BUFR_POS + 1][:, _TB:] = im
    _chain_kernel(*refs, t_blk=t_blk, int_input=True, **kw)


def _chain_kernel_planes(xr_ref, xi_ref, *refs, t_blk, int_input, **kw):
    refs[_BUFR_POS][:, _TB:] = xr_ref[...]
    refs[_BUFR_POS + 1][:, _TB:] = xi_ref[...]
    _chain_kernel(*refs, t_blk=t_blk, int_input=int_input, **kw)


def pick_tiles_chain(c: int, b: int, packed: bool = True) -> tuple[int, int] | None:
    """(c_blk, t_blk) or None if the shape doesn't fit the kernel contract:
    b must cover 8 tiles (RDS output-block accumulation), c must tile by a
    multiple of 8 (in-VMEM transposes want full sublane tiles).  Plane input
    streams 2x the bytes of packed — drop to 128-channel tiles to stay
    inside the 16 MB scoped-VMEM budget."""
    t_blk = 1024
    if b % (t_blk * 8) != 0:
        return None
    cap = 256 if packed else 128
    c_blk = c if c <= cap else cap
    if c % c_blk != 0 or c_blk % 8 != 0:
        return None
    return c_blk, t_blk


def demod_chain_pallas(
    coeffs,
    cfg,
    state: dict,
    x,
    interpret: bool = False,
    int_input: bool = False,
    dbg_skip: tuple = (),
):
    """Full-chain fused demodulation (one kernel, one HBM pass).

    x: packed u8-IQ words [C, B] f32 (utils/transfer.pack_iq_u8) or a plane
    tuple (re, im) of f32 [C, B].  Uses/updates ALL the demod state keys the
    front/mid/PLL/extract kernels own; ``lmr_phase_err`` is read here and
    updated by the caller (same contract as extract_pallas).
    Returns (state', audio_lpr [C, B/32], (lmr_re, lmr_im) [C, B/32],
    (rds_re, rds_im) [C, B/64]).
    """
    from fm_radio_tpu.ops.agc import _agc_gain

    packed = not isinstance(x, (tuple, list))
    if packed:
        xw = x
        c, b = xw.shape
        int_input = True
    else:
        xr, xi = x
        c, b = xr.shape
    tiles = pick_tiles_chain(c, b, packed)
    assert tiles is not None, "shape unsupported; gate with pick_tiles_chain"
    c_blk, t_blk = tiles
    n_tt = b // t_blk
    l4 = t_blk // 4
    l8 = t_blk // 8
    la = t_blk // 32
    lr = t_blk // 64

    r = cfg.rates
    # ---- K1 params (shared helpers: frontend_pallas) ---------------------
    nn1 = coeffs.taps_fm_in.shape[0]
    halo1 = nn1 - 4
    tbl = getattr(coeffs, "kernel_tables", None) or {}
    band1 = tbl.get("k1_band")
    if band1 is None or band1.shape[1] != _NO:
        band1 = _band_matrix(coeffs.taps_fm_in)
    k1_tail = pack_front_tail(
        (state["ds_fm_in"].real, state["ds_fm_in"].imag), c, halo1
    )
    scale = disc_scale(cfg.analog.f_wbfm_deviation, float(r.fs_fm_in))

    # ---- K2 params (shared helpers: midend_pallas) -----------------------
    nn2 = coeffs.taps_fm_out.shape[0]
    halo2 = nn2 - 2
    k_h = coeffs.taps_hilbert.shape[0]
    hilb_delay = (k_h - 1) // 2
    use_deemph = bool(cfg.use_deemphasis_filter)
    band2 = tbl.get("band_fm_out")
    if band2 is None:
        band2 = _band_m(coeffs.taps_fm_out, 2)
    band3 = tbl.get("band_hilbert")
    if band3 is None:
        band3 = _band_m(coeffs.taps_hilbert, 1)
    t1, aux1, tp, auxp = mid_iir_params(coeffs, use_deemph)
    tail2, htail, mid_st0 = pack_mid_state(state, c, halo2, k_h)

    # ---- PLL params ------------------------------------------------------
    pst = state["pll"]
    pll_st0 = jnp.stack([pst.lpf_x1, pst.lpf_y1, pst.integ, pst.nco_t, pst.prev_pe])
    pll_consts = pll_consts_from_cfg(cfg)

    # ---- K3 params (as extract_pallas.extract_pallas) --------------------
    nn_a = coeffs.taps_audio_lpr.shape[0]
    assert coeffs.taps_audio_lmr.shape[0] == nn_a
    nn_r = coeffs.taps_rds.shape[0]
    halo_a = nn_a - 4
    halo_r = nn_r - 8
    h_lmr = cfg.analog.f_audio_lmr_center / cfg.analog.f_pilot
    h_rds = cfg.analog.f_rds_center / cfg.analog.f_pilot
    ba = _band_m(coeffs.taps_audio_lpr, 4, la)
    bm = _band_m(coeffs.taps_audio_lmr, 4, la)
    br = _band_m(coeffs.taps_rds, 8, lr)
    ext_tails = pack_ext_tails(state, c, halo_a, halo_r)

    kern = functools.partial(
        _chain_kernel_packed if packed else _chain_kernel_planes,
        t_blk=t_blk, n_tt=n_tt, scale=scale, int_input=int_input,
        use_deemph=use_deemph, hilb_delay=hilb_delay,
        h_lmr=h_lmr, h_rds=h_rds, interp=interpret, dbg_skip=dbg_skip,
        **pll_consts,
    )
    grid = (c // c_blk, n_tt)
    x_spec = pl.BlockSpec((c_blk, t_blk), lambda ci, ti: (ci, ti),
                          memory_space=pltpu.VMEM)
    x_in = (xw,) if packed else (xr, xi)
    cspec = lambda shape: pl.BlockSpec(shape, lambda ci, ti: (0, 0),
                                       memory_space=pltpu.VMEM)
    rowspec = lambda w: pl.BlockSpec((c_blk, w), lambda ci, ti: (ci, 0),
                                     memory_space=pltpu.VMEM)
    # (128 // la) tiles accumulate into one audio output block; same for rds
    fa = 128 // la
    fr = 128 // lr
    aud_spec = pl.BlockSpec((c_blk, 128), lambda ci, ti: (ci, ti // fa),
                            memory_space=pltpu.VMEM)
    rds_spec = pl.BlockSpec((c_blk, 128), lambda ci, ti: (ci, ti // fr),
                            memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[x_spec] * len(x_in) + [
            pl.BlockSpec((2, c_blk, _TB), lambda ci, ti: (0, ci, 0),
                         memory_space=pltpu.VMEM),       # k1 tail
            rowspec(1),                                   # k1 prev
            cspec((_NO * 4 + _TB, _NO)),                  # band1
            rowspec(_TB), rowspec(_TB), rowspec(_NSTATE), # tail2, htail, mid st
            cspec((_NO * 2 + _TB, _NO)),                  # band2
            cspec((_NO + _TB, _NO)),                      # band3
            cspec((_LI, _LI)), cspec((2, _LI)),           # t1, aux1
            cspec((_LI, _LI)), cspec((4, _LI)),           # tp, auxp
            pl.BlockSpec((_PLL_ROWS, c_blk), lambda ci, ti: (0, ci),
                         memory_space=pltpu.VMEM),        # pll st0
            rowspec(1),                                   # off
            pl.BlockSpec((5, c_blk, _TB), lambda ci, ti: (0, ci, 0),
                         memory_space=pltpu.VMEM),        # ext tails
            cspec((la * 4 + _TB, la)),                    # ba
            cspec((la * 4 + _TB, la)),                    # bm
            cspec((lr * 8 + _TB, lr)),                    # br
        ],
        out_specs=[
            aud_spec, aud_spec, aud_spec, rds_spec, rds_spec,
            pl.BlockSpec((2, c_blk, _TB), lambda ci, ti: (0, ci, 0),
                         memory_space=pltpu.VMEM),
            rowspec(1),
            rowspec(_TB), rowspec(_TB), rowspec(_NSTATE), rowspec(1),
            pl.BlockSpec((_PLL_ROWS, c_blk), lambda ci, ti: (0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5, c_blk, _TB), lambda ci, ti: (0, ci, 0),
                         memory_space=pltpu.VMEM),
            rowspec(_TB),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, b // 32), jnp.float32),   # lpr
            jax.ShapeDtypeStruct((c, b // 32), jnp.float32),   # lmr_re
            jax.ShapeDtypeStruct((c, b // 32), jnp.float32),   # lmr_im
            jax.ShapeDtypeStruct((c, b // 64), jnp.float32),   # rds_re
            jax.ShapeDtypeStruct((c, b // 64), jnp.float32),   # rds_im
            jax.ShapeDtypeStruct((2, c, _TB), jnp.float32),    # k1 tail
            jax.ShapeDtypeStruct((c, 1), jnp.float32),         # k1 prev
            jax.ShapeDtypeStruct((c, _TB), jnp.float32),       # tail2
            jax.ShapeDtypeStruct((c, _TB), jnp.float32),       # htail
            jax.ShapeDtypeStruct((c, _NSTATE), jnp.float32),   # mid st
            jax.ShapeDtypeStruct((c, 1), jnp.float32),         # pow
            jax.ShapeDtypeStruct((_PLL_ROWS, c), jnp.float32), # pll st
            jax.ShapeDtypeStruct((5, c, _TB), jnp.float32),    # ext tails
            jax.ShapeDtypeStruct((c, _TB), jnp.float32),       # im tail
        ],
        scratch_shapes=[
            pltpu.VMEM((c_blk, _TB + t_blk), jnp.float32),   # bufr
            pltpu.VMEM((c_blk, _TB + t_blk), jnp.float32),   # bufi
            pltpu.VMEM((c_blk, 1), jnp.float32),             # k1 carry
            pltpu.VMEM((c_blk, l4), jnp.float32),            # fm tile
            pltpu.VMEM((c_blk, _TB + l4), jnp.float32),      # buf2
            pltpu.VMEM((c_blk, _TB + l8), jnp.float32),      # buf3
            pltpu.VMEM((c_blk, _NSTATE), jnp.float32),       # mid st
            pltpu.VMEM((c_blk, 1), jnp.float32),             # acc
            pltpu.VMEM((l8, c_blk), jnp.float32),            # theta.T
            pltpu.VMEM((l8, c_blk), jnp.float32),            # dt.T
            pltpu.VMEM((_PLL_ROWS, c_blk), jnp.float32),     # pll carry
            pltpu.VMEM((c_blk, _TB + l8), jnp.float32),      # blpr
            pltpu.VMEM((c_blk, _TB + l8), jnp.float32),      # blmr_r
            pltpu.VMEM((c_blk, _TB + l8), jnp.float32),      # blmr_i
            pltpu.VMEM((c_blk, _TB + l8), jnp.float32),      # brds_r
            pltpu.VMEM((c_blk, _TB + l8), jnp.float32),      # brds_i
        ],
        interpret=interpret,
    )(
        *x_in, k1_tail, state["disc_prev_theta"][:, None], band1,
        tail2, htail, mid_st0, band2, band3, t1, aux1, tp, auxp,
        pll_st0, state["lmr_phase_err"][:, None], ext_tails, ba, bm, br,
    )
    (lpr, lmr_re, lmr_im, rds_re, rds_im,
     out_k1_tail, out_k1_prev, out_tail2, out_htail, out_mid_st, out_pow,
     out_pll_st, out_ext_tails, out_imtail) = outs

    new_state = dict(state)
    new_state["ds_fm_in"] = jax.lax.complex(
        out_k1_tail[0, :, _TB - halo1 :], out_k1_tail[1, :, _TB - halo1 :]
    )
    new_state["disc_prev_theta"] = out_k1_prev[:, 0]
    new_state["ds_fm_out"] = out_tail2[:, _TB - halo2 :]
    new_state["hilbert"] = out_htail[:, _TB - (k_h - 1) :]
    new_state["deemph"], new_state["peak_pilot"] = unpack_mid_iir_state(
        out_mid_st
    )
    avg_power = out_pow[:, 0] / jnp.float32(b // 8)
    new_state["agc_pilot"] = _agc_gain(state["agc_pilot"], avg_power, 1.0, 0.2)
    new_state["pll"] = PilotPLLState(
        lpf_x1=out_pll_st[0], lpf_y1=out_pll_st[1], integ=out_pll_st[2],
        nco_t=out_pll_st[3], prev_pe=out_pll_st[4],
    )
    new_state["ds_audio_lpr"] = jax.lax.complex(
        out_ext_tails[0, :, _TB - halo_a :], out_imtail[:, _TB - halo_a :]
    )
    new_state["ds_audio_lmr"] = jax.lax.complex(
        out_ext_tails[1, :, _TB - halo_a :], out_ext_tails[2, :, _TB - halo_a :]
    )
    new_state["ds_rds"] = jax.lax.complex(
        out_ext_tails[3, :, _TB - halo_r :], out_ext_tails[4, :, _TB - halo_r :]
    )
    return new_state, lpr, (lmr_re, lmr_im), (rds_re, rds_im)
