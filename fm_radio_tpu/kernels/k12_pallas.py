"""Fused K1+K2 kernel: int8-direct ds4 + discriminator + ds2 + de-emphasis
+ Hilbert + pilot peak IIR + pilot phase — ONE kernel, ONE HBM pass.

Parity: ``Run_FM_Demodulate`` + ``LockOntoPilot``'s data-parallel half
(``broadcast_fm_demod.cpp:391-429``), i.e. the composition of
``kernels/frontend_pallas.py`` (K1) and ``kernels/midend_pallas.py`` (K2).

Why fuse exactly these two (round-4 roofline, docs/PERF.md): the split
pipeline writes ``fm_demod`` [C, B/4] f32 to HBM (K1) and immediately reads
it back (K2) — 0.54 GB/2^28-sample block of pure producer→consumer traffic,
~1.05 ms at the measured 504 GB/s stream rate.  Both kernels already use
the SAME grid (128-channel blocks × sequential time tiles) and the same
input-domain tile (4096 input samples → 1024 fm_demod samples — exactly
K2's production tile), so the fusion changes NO tile boundaries: every
sub-matmul, IIR sub-chunk and carried tail is identical to the split path,
and the outputs are bit-identical.  The PLL and K3 stay separate for
structural reasons the megakernel experiment established: the serial PLL
wants 2048-lane channel tiles (incompatible with the 128-row dot tiles),
and K3's five tail-extended scratch buffers don't share VMEM with K1+K2's
working set at production tile sizes.

The per-body code has exactly one author: the K1 tile body is
``frontend_pallas._i8_direct_tile_body`` and the K2 tile body is
``midend_pallas._midend_body`` — this module only composes them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fm_radio_tpu.kernels.frontend_pallas import (
    _M,
    _TB as _FTB,
    _band_matrix,
    _i8_direct_tile_body,
    _i8_phase_tile_body,
    disc_scale,
    pack_front_tail,
    phase_split_band_int8,
    quantize_band_int8,
)
from fm_radio_tpu.kernels.midend_pallas import (
    _NO,
    _NSTATE,
    _TB,
    _band_m,
    _midend_body,
    mid_iir_params,
    pack_mid_state,
    unpack_mid_iir_state,
)


def _k12_kernel(
    x8_ref, k1tail_ref, prev_ref, tail2_ref, htail_ref, st0_ref,
    b1_ref, b2_ref, srow_ref,
    band2_ref, band3_ref, t1_ref, aux1_ref, tp_ref, auxp_ref,
    re_ref, im_ref, th_ref,
    out_k1tail_ref, out_prev_ref, out_tail2_ref, out_htail_ref,
    out_st_ref, out_pow_ref,
    w0r, w0i, tailr, taili, carry_ref,
    buf2_ref, buf3_ref, st_ref, acc_ref,
    *, t_blk: int, n_tt: int, scale: float, no: int,
    use_deemph: bool, hilb_delay: int, interp: bool,
):
    ti = pl.program_id(1)

    @pl.when(ti == 0)
    def _init():
        tailr[...] = k1tail_ref[0]
        taili[...] = k1tail_ref[1]
        carry_ref[...] = prev_ref[...]
        buf2_ref[:, :_TB] = tail2_ref[...]
        buf3_ref[:, :_TB] = htail_ref[...]
        st_ref[...] = st0_ref[...]
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # ---- K1 tile: int8-direct ds4 + discriminator -> fm_demod in VMEM ----
    fm = _i8_direct_tile_body(
        x8_ref, b1_ref, b2_ref, srow_ref, w0r, w0i, tailr, taili, carry_ref,
        t_blk=t_blk, scale=scale, no=no,
    )

    # ---- K2 tile on the in-VMEM value (identical tile boundaries) --------
    hi_re, hi_im, theta = _midend_body(
        fm,
        band2_ref, band3_ref, t1_ref, aux1_ref, tp_ref, auxp_ref,
        buf2_ref, buf3_ref, st_ref, acc_ref,
        t_blk=t_blk // _M, use_deemph=use_deemph, hilb_delay=hilb_delay,
        interp=interp,
    )
    re_ref[...] = hi_re
    im_ref[...] = hi_im
    th_ref[...] = theta

    @pl.when(ti == n_tt - 1)
    def _finish():
        out_k1tail_ref[0] = tailr[...]
        out_k1tail_ref[1] = taili[...]
        out_prev_ref[...] = carry_ref[...]
        out_tail2_ref[...] = buf2_ref[:, :_TB]
        out_htail_ref[...] = buf3_ref[:, :_TB]
        out_st_ref[...] = st_ref[...]
        out_pow_ref[...] = acc_ref[...]


def _k12_kernel_ps(
    x4_ref, k1tail4_ref, prev_ref, tail2_ref, htail_ref, st0_ref,
    b1ps_ref, b2ps_ref, srow_ref,
    band2_ref, band3_ref, t1_ref, aux1_ref, tp_ref, auxp_ref,
    re_ref, im_ref, th_ref,
    out_k1tail4_ref, out_prev_ref, out_tail2_ref, out_htail_ref,
    out_st_ref, out_pow_ref,
    w04_ref, tail4_ref, carry_ref,
    buf2_ref, buf3_ref, st_ref, acc_ref,
    *, t_blk: int, n_tt: int, scale: float, no: int,
    use_deemph: bool, hilb_delay: int, interp: bool,
):
    """Phase-split twin of ``_k12_kernel``: the K1 stage consumes [2, 4, c,
    t_blk/4] int8 POLYPHASE planes (the wideband channelizer's native
    output) via ``_i8_phase_tile_body`` — BIT-identical fm_demod, and the
    ~20 ms/step XLA word->byte conversion between the channelizer and the
    demod disappears entirely (docs/PERF.md round-5 wideband record).  The
    K2 half and everything downstream are the shared bodies unchanged."""
    ti = pl.program_id(1)

    @pl.when(ti == 0)
    def _init():
        tail4_ref[...] = k1tail4_ref[...]
        carry_ref[...] = prev_ref[...]
        buf2_ref[:, :_TB] = tail2_ref[...]
        buf3_ref[:, :_TB] = htail_ref[...]
        st_ref[...] = st0_ref[...]
        acc_ref[...] = jnp.zeros_like(acc_ref)

    fm = _i8_phase_tile_body(
        x4_ref, b1ps_ref, b2ps_ref, srow_ref, w04_ref, tail4_ref, carry_ref,
        t_blk=t_blk, scale=scale, no=no,
    )

    hi_re, hi_im, theta = _midend_body(
        fm,
        band2_ref, band3_ref, t1_ref, aux1_ref, tp_ref, auxp_ref,
        buf2_ref, buf3_ref, st_ref, acc_ref,
        t_blk=t_blk // _M, use_deemph=use_deemph, hilb_delay=hilb_delay,
        interp=interp,
    )
    re_ref[...] = hi_re
    im_ref[...] = hi_im
    th_ref[...] = theta

    @pl.when(ti == n_tt - 1)
    def _finish():
        out_k1tail4_ref[...] = tail4_ref[...]
        out_prev_ref[...] = carry_ref[...]
        out_tail2_ref[...] = buf2_ref[:, :_TB]
        out_htail_ref[...] = buf3_ref[:, :_TB]
        out_st_ref[...] = st_ref[...]
        out_pow_ref[...] = acc_ref[...]


def pick_tiles_k12(c: int, b: int, no: int = _NO) -> tuple[int, int] | None:
    """(c_blk, t_blk) over the INPUT (baseband) axis, or None.

    t_blk must give the K2 part at least one full ds2 sub-matmul
    (t_blk/4 >= _NO*2 -> t_blk >= 1024); 4096 is the production tile
    (identical to the split kernels', so outputs stay bit-identical).
    FMTPU_K12_T caps it differently (A/B lens; NOTE a different tile
    width changes the in-kernel pilot-AGC power accumulation ORDER across
    tiles — the IIR Toeplitz state handoff itself is exact at any width,
    but agc_pilot becomes only numerically equal, not bit-identical, to
    the split path; that is why the lens is excluded from the hardware
    bench record — docs/PERF.md, commit 455649d.  Process-scoped: the
    env var is read at trace time, so it must be set before the first
    jit compile in the process, as bench.py's subprocess model does)."""
    import os

    max_t = int(os.environ.get("FMTPU_K12_T", "4096"))
    if b % (no * _M) != 0:
        return None
    t_blk = no * _M * 2  # 1024 at no=128: the minimum fusable input tile
    while t_blk * 2 <= max_t and b % (t_blk * 2) == 0:
        t_blk *= 2
    if b % t_blk != 0 or (t_blk // _M) % (_NO * 2) != 0:
        return None
    c_blk = c if c <= 128 else 128
    if c % c_blk != 0:
        return None
    return c_blk, t_blk


def k12_pallas(
    coeffs,
    cfg,
    state: dict,
    x8: jnp.ndarray,
    interpret: bool = False,
):
    """Fused front+mid end on [2, C, B] int8 planes — or, PHASE-SPLIT, on
    [2, 4, C, B/4] int8 polyphase planes (x_p[u] = x[4u+p]: the wideband
    channelizer's native output; _k12_kernel_ps docstring).  Outputs are
    BIT-identical between the two forms.

    Uses/updates state keys: ds_fm_in, disc_prev_theta, ds_fm_out, deemph,
    hilbert, peak_pilot, agc_pilot — exactly the union of the two split
    kernels.  Returns (state', (re, im) [C, B/8], theta_cycles [C, B/8]).
    """
    from fm_radio_tpu.ops.agc import _agc_gain

    phase_split = x8.ndim == 4
    if phase_split:
        c, b = x8.shape[2], x8.shape[3] * _M
    else:
        c, b = x8.shape[1:]
    no = cfg.frontend_band_no
    tiles = pick_tiles_k12(c, b, no)
    assert tiles is not None
    c_blk, t_blk = tiles
    n_tt = b // t_blk
    _w = no * _M + _TB

    nn1 = coeffs.taps_fm_in.shape[0]
    halo1 = nn1 - _M
    nn2 = coeffs.taps_fm_out.shape[0]
    halo2 = nn2 - 2
    k_h = coeffs.taps_hilbert.shape[0]
    hilb_delay = (k_h - 1) // 2
    use_deemph = bool(cfg.use_deemphasis_filter)
    scale = disc_scale(cfg.analog.f_wbfm_deviation, float(cfg.rates.fs_fm_in))

    tbl = getattr(coeffs, "kernel_tables", None) or {}
    pre = tbl.get("k1_i8")
    if pre is not None and pre[0].shape == (_w, no):
        b1, b2, s_row = pre
    else:
        b1, b2, s_row = quantize_band_int8(_band_matrix(coeffs.taps_fm_in, no))
    band2 = tbl.get("band_fm_out")
    if band2 is None:
        band2 = _band_m(coeffs.taps_fm_out, 2)
    band3 = tbl.get("band_hilbert")
    if band3 is None:
        band3 = _band_m(coeffs.taps_hilbert, 1)
    t1, aux1, tp, auxp = mid_iir_params(coeffs, use_deemph)

    tail8 = (
        pack_front_tail(
            (state["ds_fm_in"].real, state["ds_fm_in"].imag), c, halo1
        )
        - 1.0
    ).astype(jnp.int8)
    tail2, htail, st0 = pack_mid_state(state, c, halo2, k_h)

    grid = (c // c_blk, n_tt)
    b8 = b // (2 * _M)
    l_out = t_blk // (2 * _M)
    cspec = lambda shape: pl.BlockSpec(shape, lambda ci, ti: (0, 0),
                                       memory_space=pltpu.VMEM)
    rowspec = lambda w: pl.BlockSpec((c_blk, w), lambda ci, ti: (ci, 0),
                                     memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((c_blk, l_out), lambda ci, ti: (ci, ti),
                         memory_space=pltpu.VMEM)

    if phase_split:
        # per-phase re-arrangement of the SAME quantized band rows
        # (bit-identical int32 accumulation — phase_split_band_int8) and
        # per-phase carried input tails [2, 4, C, _TB/4]
        b1ps, b2ps = phase_split_band_int8(b1, b2)
        tb4 = _FTB // _M
        tail4 = jnp.moveaxis(
            tail8.reshape(2, c, tb4, _M), 3, 1)  # [2, 4, c, 32]
        kern = functools.partial(
            _k12_kernel_ps, t_blk=t_blk, n_tt=n_tt, scale=scale, no=no,
            use_deemph=use_deemph, hilb_delay=hilb_delay, interp=interpret,
        )
        in_arrays = (x8, tail4)
        in_specs_head = [
            pl.BlockSpec((2, _M, c_blk, t_blk // _M),
                         lambda ci, ti: (0, 0, ci, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, _M, c_blk, tb4), lambda ci, ti: (0, 0, ci, 0),
                         memory_space=pltpu.VMEM),
        ]
        cspec3 = lambda shape: pl.BlockSpec(
            shape, lambda ci, ti: tuple(0 for _ in shape),
            memory_space=pltpu.VMEM)
        band_specs = [cspec3((_M, 2 * no, no)), cspec3((_M, 2 * no, no)),
                      cspec((1, no))]
        band_arrays = (b1ps, b2ps, s_row)
        k1tail_spec = pl.BlockSpec((2, _M, c_blk, tb4),
                                   lambda ci, ti: (0, 0, ci, 0),
                                   memory_space=pltpu.VMEM)
        k1tail_shape = jax.ShapeDtypeStruct((2, _M, c, tb4), jnp.int8)
        k1_scratch = [
            pltpu.VMEM((2, _M, c_blk, 2 * no), jnp.int8),   # w0 per phase
            pltpu.VMEM((2, _M, c_blk, tb4), jnp.int8),      # carried tails
        ]
    else:
        kern = functools.partial(
            _k12_kernel, t_blk=t_blk, n_tt=n_tt, scale=scale, no=no,
            use_deemph=use_deemph, hilb_delay=hilb_delay, interp=interpret,
        )
        in_arrays = (x8, tail8)
        in_specs_head = [
            pl.BlockSpec((2, c_blk, t_blk), lambda ci, ti: (0, ci, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c_blk, _TB), lambda ci, ti: (0, ci, 0),
                         memory_space=pltpu.VMEM),
        ]
        band_specs = [cspec((_w, no)), cspec((_w, no)), cspec((1, no))]
        band_arrays = (b1, b2, s_row)
        k1tail_spec = pl.BlockSpec((2, c_blk, _TB),
                                   lambda ci, ti: (0, ci, 0),
                                   memory_space=pltpu.VMEM)
        k1tail_shape = jax.ShapeDtypeStruct((2, c, _TB), jnp.int8)
        k1_scratch = [
            pltpu.VMEM((c_blk, _TB + no * _M), jnp.int8),
            pltpu.VMEM((c_blk, _TB + no * _M), jnp.int8),
            pltpu.VMEM((c_blk, _TB), jnp.int8),
            pltpu.VMEM((c_blk, _TB), jnp.int8),
        ]

    (re_p, im_p, theta, out_k1tail, out_prev, out_tail2, out_htail,
     out_st, out_pow) = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs_head + [
            rowspec(1), rowspec(_TB), rowspec(_TB), rowspec(_NSTATE),
        ] + band_specs + [
            cspec((_NO * 2 + _TB, _NO)),
            cspec((_NO + _TB, _NO)),
            cspec(t1.shape), cspec(aux1.shape),
            cspec(tp.shape), cspec(auxp.shape),
        ],
        out_specs=[
            ospec, ospec, ospec,
            k1tail_spec,
            rowspec(1), rowspec(_TB), rowspec(_TB), rowspec(_NSTATE),
            rowspec(1),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, b8), jnp.float32),
            jax.ShapeDtypeStruct((c, b8), jnp.float32),
            jax.ShapeDtypeStruct((c, b8), jnp.float32),
            k1tail_shape,
            jax.ShapeDtypeStruct((c, 1), jnp.float32),
            jax.ShapeDtypeStruct((c, _TB), jnp.float32),
            jax.ShapeDtypeStruct((c, _TB), jnp.float32),
            jax.ShapeDtypeStruct((c, _NSTATE), jnp.float32),
            jax.ShapeDtypeStruct((c, 1), jnp.float32),
        ],
        scratch_shapes=k1_scratch + [
            pltpu.VMEM((c_blk, 1), jnp.float32),
            pltpu.VMEM((c_blk, _TB + t_blk // _M), jnp.float32),
            pltpu.VMEM((c_blk, _TB + t_blk // (2 * _M)), jnp.float32),
            pltpu.VMEM((c_blk, _NSTATE), jnp.float32),
            pltpu.VMEM((c_blk, 1), jnp.float32),
        ],
        interpret=interpret,
    )(*in_arrays, state["disc_prev_theta"][:, None], tail2, htail, st0,
      *band_arrays, band2, band3, t1, aux1, tp, auxp)

    new_state = dict(state)
    if phase_split:
        # per-phase tails -> flat [2, c, _TB] interleaved order
        out_k1tail = jnp.moveaxis(out_k1tail, 1, 3).reshape(2, c, _TB)
    tail_f = out_k1tail.astype(jnp.float32) + 1.0
    new_state["ds_fm_in"] = jax.lax.complex(
        tail_f[0, :, _TB - halo1 :], tail_f[1, :, _TB - halo1 :]
    )
    new_state["disc_prev_theta"] = out_prev[:, 0]
    new_state["ds_fm_out"] = out_tail2[:, _TB - halo2 :]
    new_state["hilbert"] = out_htail[:, _TB - (k_h - 1) :]
    new_state["deemph"], new_state["peak_pilot"] = unpack_mid_iir_state(out_st)
    avg_power = out_pow[:, 0] / jnp.float32(b8)
    new_state["agc_pilot"] = _agc_gain(state["agc_pilot"], avg_power, 1.0, 0.2)
    return new_state, (re_p, im_p), theta
