"""Pallas kernel for the BPSK symbol synchroniser.

Same recurrence as :func:`fm_radio_tpu.models.bpsk.bpsk_sync_scan`
(parity: ``bpsk_synchroniser.cpp:94-186``) as one fused VPU loop: carrier PLL,
zero-crossing detector with cooldown, TED ramp clock, integrate-&-dump — a
14-row register carry per channel tile, samples streamed from VMEM.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fm_radio_tpu.models.bpsk import BPSKState
from fm_radio_tpu.kernels.pll_pallas import _atan2, _cheb, _wrap

_ROWS = 14  # see _pack_state


def _pack_state(s: BPSKState) -> jnp.ndarray:
    return jnp.stack(
        [
            s.pll_lpf_x1, s.pll_lpf_y1, s.pll_integ, s.pll_nco_t, s.pll_prev_pe,
            s.zcd_prev_q, s.cooldown.astype(jnp.float32),
            s.ted_lpf_x1, s.ted_lpf_y1, s.ted_integ, s.ted_prev_pe, s.ted_ramp,
            jnp.real(s.int_dump), jnp.imag(s.int_dump),
        ]
    )


def _unpack_state(st: jnp.ndarray) -> BPSKState:
    return BPSKState(
        pll_lpf_x1=st[0], pll_lpf_y1=st[1], pll_integ=st[2], pll_nco_t=st[3],
        pll_prev_pe=st[4], zcd_prev_q=st[5], cooldown=st[6].astype(jnp.int32),
        ted_lpf_x1=st[7], ted_lpf_y1=st[8], ted_integ=st[9], ted_prev_pe=st[10],
        ted_ramp=st[11], int_dump=jax.lax.complex(st[12], st[13]),
    )


def _bpsk_kernel(
    x_re_ref, x_im_ref, st_ref, *refs,
    n_steps: int, n_chunks: int, ts: float, pll_ki_ts: float, pll_kp: float, pll_f_gain: float,
    pll_lpf_b0: float, pll_lpf_a1: float, ted_ki_ts: float, ted_kp: float,
    ted_f_center: float, ted_f_gain: float, ted_lpf_b0: float, ted_lpf_a1: float,
    int_dump_kts: float, zcd_cooldown: float, channel_major: bool = False,
    apply_gain: bool = False,
):
    if apply_gain:
        gain_ref, *refs = refs
    (pred_ref, sym_re_ref, valid_ref, out_st_ref,
     carry_ref, xr_t_ref, xi_t_ref, pr_t_ref, sy_t_ref, va_t_ref) = refs
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    half_pi = jnp.float32(jnp.pi / 2.0)
    ts_f = jnp.float32(ts)

    it = pl.program_id(1)

    @pl.when(it == 0)
    def _init():
        carry_ref[...] = st_ref[...]

    carry0 = tuple(carry_ref[pl.ds(k, 1), :] for k in range(_ROWS))

    # fused RDS AGC ingest: gain [1, ct] per channel, measured by the extract
    # kernel and updated in XLA — scaling here replaces the agc_process_p HBM
    # round trip over the rds planes (broadcast_fm_demod.cpp:538-541).  The
    # multiply is the exact same f32 op the separate pass performed, so the
    # loop's arithmetic is bit-identical GIVEN the same gain; the gain itself
    # comes from the extract kernel's per-tile power reduction, whose
    # summation order differs from the unfused XLA mean (numerically equal
    # at ~2e-4, not last-ulp identical — docs/PERF.md caveat).
    g_row = gain_ref[...] if apply_gain else None

    if channel_major:
        # HBM blocks stay [C, nc] (the producers' native layout, same trick
        # as the PLL kernel): the flips to/from the loop's time-major form
        # happen in VMEM instead of costing FOUR full XLA transpose passes
        # over HBM ([C, N] x 2 inputs + 3 outputs at bench scale).
        if apply_gain:
            xr_t_ref[...] = x_re_ref[...].T * g_row
            xi_t_ref[...] = x_im_ref[...].T * g_row
        else:
            xr_t_ref[...] = x_re_ref[...].T
            xi_t_ref[...] = x_im_ref[...].T
        src_re, src_im = xr_t_ref, xi_t_ref
        dst_p, dst_s, dst_v = pr_t_ref, sy_t_ref, va_t_ref
        g_row = None  # already applied on the whole chunk
    else:
        src_re, src_im = x_re_ref, x_im_ref
        dst_p, dst_s, dst_v = pred_ref, sym_re_ref, valid_ref

    def body(i, carry):
        (p_x1, p_y1, p_int, p_t, p_pe, zq, cool,
         t_x1, t_y1, t_int, t_pe, ramp, id_re, id_im) = carry

        # carrier PLL PI + NCO
        p_lpf = jnp.float32(pll_lpf_b0) * (p_pe + p_x1) - jnp.float32(pll_lpf_a1) * p_y1
        p_int2 = jnp.clip(p_int + jnp.float32(pll_ki_ts) * p_pe, -one, one)
        pi_pll = p_lpf * jnp.float32(pll_kp) + p_int2
        control = jnp.clip(pi_pll, -one, one)
        t = _wrap(p_t + ts_f * (control * jnp.float32(pll_f_gain)))
        c = _cheb(_wrap(t + jnp.float32(0.25)))
        s = _cheb(t)
        xr = src_re[pl.ds(i, 1), :]
        xi = src_im[pl.ds(i, 1), :]
        if g_row is not None:   # non-channel-major fused-AGC path
            xr = xr * g_row
            xi = xi * g_row
        iq_re = xr * c - xi * s
        iq_im = xr * s + xi * c

        # zero-crossing detector + cooldown
        raw_zcd = (iq_im * zq) < zero
        fire_zcd = raw_zcd & (cool == zero)
        cool2 = jnp.where(
            fire_zcd, jnp.float32(zcd_cooldown), jnp.maximum(cool - one, zero)
        )
        timing = jnp.float32(2.0) * ramp
        timing_err = jnp.where(timing > one, timing - jnp.float32(2.0), timing)
        t_pe2 = jnp.where(fire_zcd, timing_err, t_pe)

        # TED PI
        t_lpf = jnp.float32(ted_lpf_b0) * (t_pe2 + t_x1) - jnp.float32(ted_lpf_a1) * t_y1
        t_int2 = jnp.clip(t_int + jnp.float32(ted_ki_ts) * t_pe2, -one, one)
        pi_ted = jnp.float32(ted_kp) * t_lpf + t_int2

        # integrate & dump
        id_re2 = id_re + jnp.float32(int_dump_kts) * iq_re
        id_im2 = id_im + jnp.float32(int_dump_kts) * iq_im

        # TED ramp clock
        tctl = jnp.clip(-pi_ted, -one, one)
        tfreq = jnp.float32(ted_f_center) + tctl * jnp.float32(ted_f_gain)
        v = ramp + ts_f * tfreq
        offset = ts_f * tfreq * jnp.float32(0.5)
        fire_ted = v >= (one - offset)
        ramp2 = jnp.where(fire_ted, zero, v)

        # dump
        sym_phase = _atan2(id_im2, id_re2)
        est_pe = jnp.where(sym_phase > zero, half_pi - sym_phase, -half_pi - sym_phase)
        norm_pe = est_pe / half_pi
        p_pe2 = jnp.where(fire_ted, norm_pe, p_pe)

        fire_f = fire_ted.astype(jnp.float32)
        dst_p[pl.ds(i, 1), :] = id_im2 * fire_f
        dst_s[pl.ds(i, 1), :] = id_re2 * fire_f
        dst_v[pl.ds(i, 1), :] = fire_f

        id_re3 = jnp.where(fire_ted, zero, id_re2)
        id_im3 = jnp.where(fire_ted, zero, id_im2)

        return (p_pe, p_lpf, p_int2, t, p_pe2, iq_im, cool2,
                t_pe2, t_lpf, t_int2, t_pe2, ramp2, id_re3, id_im3)

    final = jax.lax.fori_loop(0, n_steps, body, carry0)
    if channel_major:
        pred_ref[...] = pr_t_ref[...].T
        sym_re_ref[...] = sy_t_ref[...].T
        valid_ref[...] = va_t_ref[...].T
    for k in range(_ROWS):
        carry_ref[pl.ds(k, 1), :] = final[k]

    @pl.when(it == n_chunks - 1)
    def _finish():
        out_st_ref[...] = carry_ref[...]


def bpsk_consts_from_cfg(cfg) -> dict:
    """Static kernel constants from the hashable DemodConfig."""
    from fm_radio_tpu.ops.design import create_iir_single_pole_lpf

    b = cfg.bpsk
    fs = b.f_sample_rate
    ts = 1.0 / fs
    ted_b, ted_a = create_iir_single_pole_lpf(b.ted_max_freq_offset / (fs / 2.0))
    pll_b, pll_a = create_iir_single_pole_lpf(b.pll_max_freq_offset / (fs / 2.0))
    k = b.f_symbol_rate / fs
    area = 0.5 * b.samples_per_symbol
    return dict(
        ts=ts,
        pll_ki_ts=b.pll_integrator_gain * ts * k,
        pll_kp=b.pll_proportional_gain,
        pll_f_gain=b.pll_max_freq_offset,
        pll_lpf_b0=float(pll_b[0]),
        pll_lpf_a1=float(pll_a[1]),
        ted_ki_ts=b.ted_integrator_gain * ts * k,
        ted_kp=b.ted_proportional_gain,
        ted_f_center=b.f_symbol_rate,
        ted_f_gain=b.ted_max_freq_offset,
        ted_lpf_b0=float(ted_b[0]),
        ted_lpf_a1=float(ted_a[1]),
        int_dump_kts=1.0 / area,
        zcd_cooldown=float(b.zcd_cooldown),
    )


def bpsk_sync_pallas(cfg, state: BPSKState, x: jnp.ndarray, interpret: bool = False,
                     gain: jnp.ndarray | None = None):
    """Drop-in for bpsk_sync_scan's production outputs.

    x: [C, N] complex64 or a plane tuple (re, im) of f32 [C, N].
    ``gain`` [C] (optional): per-channel RDS AGC gain applied to x at ingest
    in-VMEM (the fused replacement for the agc_process_p pass — the f32
    multiply is identical, so outputs are bit-exact vs pre-scaled input).
    Returns (state', outs) with outs keys sym / pred / valid (the iq debug
    tap is scan-path only).
    """
    from fm_radio_tpu.kernels.pll_pallas import pick_time_chunk

    xr, xi = x if isinstance(x, tuple) else (x.real, x.imag)
    c, n = xr.shape
    # channel tile: whole array up to the cap, else the largest power-of-2
    # divisor (gcd with the cap) — any c works; narrow gcds are slow but
    # correct (the auto gate in models/demod.py keeps such shapes on the
    # scan path).  Cap 2048 (= the PLL kernel's): the serial time is
    # (c/ct) * n * step-latency and the step is lane-FLAT to 2048 (measured
    # round 4: full-chain 39,536 vs 35,757 Msps at the old 512 cap, +10.6%
    # — docs/PERF.md).  FMTPU_BPSK_CT is the A/B lens on the cap.
    # Process-scoped: read at trace time inside a jit-cached path, so it
    # must be set before the first compile in the process (bench.py runs
    # each lens in a fresh subprocess for exactly this reason); flipping it
    # mid-process silently measures the stale configuration.
    import os

    cap = int(os.environ.get("FMTPU_BPSK_CT", "2048"))
    ct = c if c <= cap else math.gcd(c, cap)
    nc = pick_time_chunk(n, ct)
    n_chunks = n // nc

    channel_major = ct % 8 == 0  # in-VMEM transpose wants full sublane tiles
    st = _pack_state(state)

    kern = functools.partial(
        _bpsk_kernel, n_steps=nc, n_chunks=n_chunks,
        channel_major=channel_major, apply_gain=gain is not None,
        **bpsk_consts_from_cfg(cfg)
    )
    grid = (c // ct, n_chunks)
    if channel_major:
        io_spec = pl.BlockSpec((ct, nc), lambda j, i: (j, i),
                               memory_space=pltpu.VMEM)
        io_shape = jax.ShapeDtypeStruct((c, n), jnp.float32)
        t_scratch = pltpu.VMEM((nc, ct), jnp.float32)
        x_re, x_im = xr, xi
    else:
        io_spec = pl.BlockSpec((nc, ct), lambda j, i: (i, j),
                               memory_space=pltpu.VMEM)
        io_shape = jax.ShapeDtypeStruct((n, c), jnp.float32)
        t_scratch = pltpu.VMEM((8, 128), jnp.float32)
        x_re, x_im = xr.T, xi.T
    in_specs = [
        io_spec,
        io_spec,
        pl.BlockSpec((_ROWS, ct), lambda j, i: (0, j), memory_space=pltpu.VMEM),
    ]
    operands = [x_re, x_im, st]
    if gain is not None:
        in_specs.append(
            pl.BlockSpec((1, ct), lambda j, i: (0, j), memory_space=pltpu.VMEM)
        )
        operands.append(gain[None, :])
    pred_t, sym_re_t, valid_t, out_st = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            io_spec,
            io_spec,
            io_spec,
            pl.BlockSpec((_ROWS, ct), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            io_shape,
            io_shape,
            io_shape,
            jax.ShapeDtypeStruct((_ROWS, c), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((_ROWS, ct), jnp.float32)]
        + [t_scratch] * 5,
        interpret=interpret,
    )(*operands)

    if channel_major:
        pred, sym_re, valid = pred_t, sym_re_t, valid_t
    else:
        pred, sym_re, valid = pred_t.T, sym_re_t.T, valid_t.T
    outs = {
        "sym": jax.lax.complex(sym_re, pred),
        "pred": pred,
        "valid": valid > 0.5,
    }
    return _unpack_state(out_st), outs
