"""Pallas kernel for the 19 kHz pilot PLL.

Same recurrence as :func:`fm_radio_tpu.models.pilot_pll.pilot_pll_scan`
(parity: ``broadcast_fm_demod.cpp:418-456``), but the whole 8192-step loop is
ONE kernel: the 5-scalar-per-channel carry lives in vector registers, the
pilot samples stream from VMEM, and each step is a single fused VPU program
(Chebyshev phasor + complex multiply + atan2).  Channels ride the lane axis —
a [1, C] row per step — so throughput is flat in C up to the lane width and
scales with channel tiles beyond it.

Grid: one program per channel tile (``ct`` lanes).  Loop constants enter as
Python floats (static), so a config change recompiles — same policy as the
jit-static ``DemodConfig``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fm_radio_tpu.models.pilot_pll import PilotPLLParams, PilotPLLState

_STATE_ROWS = 5  # lpf_x1, lpf_y1, integ, nco_t, prev_pe


# the reference's 6-coefficient sin(2*pi*x) polynomial and cycle wrap,
# single-sourced in ops/cmath (pure jnp — traces fine under Mosaic); bpsk_
# and chain_pallas import these names from here
from fm_radio_tpu.ops.cmath import chebyshev_sine as _cheb  # noqa: E402
from fm_radio_tpu.ops.cmath import wrap_cycles as _wrap  # noqa: E402


# atan(r)/r as a degree-8 polynomial in s = r^2 on [0, 1]; max f32 error
# 1.1e-7 rad (Chebyshev-node least squares).  Pallas TPU has no atan2
# primitive, so we build it: range-reduce via min/max + quadrant fixup.
_ATAN_C = (
    0.9999999916871788, -0.3333312973773711, 0.19993671634515528,
    -0.14211695469412014, 0.10672057031714136, -0.07570506873136391,
    0.04347725565574077, -0.016555949161686706, 0.0029729183139991255,
)


def _atan2(y, x):
    """Four-quadrant arctangent on the VPU (matches C atan2 conventions:
    atan2(0, -1) = +pi, atan2(0, 0) = 0)."""
    pi = jnp.float32(jnp.pi)
    half_pi = jnp.float32(jnp.pi / 2.0)
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    mx = jnp.maximum(ax, ay)
    mn = jnp.minimum(ax, ay)
    r = mn / jnp.maximum(mx, jnp.float32(1e-37))
    s = r * r
    p = jnp.float32(_ATAN_C[-1])
    for c in _ATAN_C[-2::-1]:
        p = p * s + jnp.float32(c)
    a = p * r
    a = jnp.where(ay > ax, half_pi - a, a)
    a = jnp.where(x < 0.0, pi - a, a)
    return jnp.where(y < 0.0, -a, a)


def pick_time_chunk(n: int, ct: int, budget_elems: int = 1 << 18) -> int:
    """Largest power-of-2 divisor of n with chunk*ct_padded <= budget_elems
    (1 MB of f32 per VMEM buffer by default) — keeps the streamed blocks well
    inside VMEM regardless of total block size.  The lane axis is budgeted at
    its VMEM-padded width (multiples of 128), not the logical ct."""
    ct_pad = -(-ct // 128) * 128
    nc = 1
    while nc < n and (nc * 2) * ct_pad <= budget_elems and n % (nc * 2) == 0:
        nc *= 2
    return nc


def _pll_kernel(
    theta_ref, st_ref, dt_ref, out_st_ref, carry_ref, th_t_ref, dt_t_ref,
    *, n_steps: int, n_chunks: int, ts: float, f_center: float, f_gain: float,
    ki_ts: float, kp: float, lpf_b0: float, lpf_a1: float,
    channel_major: bool = False, io_i16: bool = False,
):
    """Serial PI+NCO loop over precomputed pilot phase angles.

    The reference rotates the pilot by the NCO phasor and measures
    atan2(Im, Re) of the product (broadcast_fm_demod.cpp:430-456).  Since
    atan2(x * e^{j2pi t}) = wrap_pi(angle(x) + 2pi t), the angle(x) part is
    data-parallel and computed OUTSIDE the kernel; the serial chain keeps
    only the loop filter + NCO + one wrap — ~3x shorter critical path per
    step than the direct Chebyshev-phasor + in-loop-atan2 translation, and
    one f32 stream instead of two.
    """
    one = jnp.float32(1.0)
    two_pi = jnp.float32(2.0 * jnp.pi)
    ts_f = jnp.float32(ts)
    f_center_f = jnp.float32(f_center)
    f_gain_f = jnp.float32(f_gain)
    ki_ts_f = jnp.float32(ki_ts)
    kp_f = jnp.float32(kp)
    b0 = jnp.float32(lpf_b0)
    a1 = jnp.float32(lpf_a1)

    it = pl.program_id(1)

    @pl.when(it == 0)
    def _init():
        carry_ref[...] = st_ref[...]

    carry0 = tuple(carry_ref[pl.ds(k, 1), :] for k in range(_STATE_ROWS))

    if io_i16:
        # int16 inter-stage format (kernels/qformat.py): theta arrives and
        # dt leaves as PH_SCALE fixed point — half the HBM stream bytes
        from fm_radio_tpu.kernels.qformat import PH_SCALE, dq_i16

    if channel_major:
        # HBM blocks stay [C, nc] (the producers' native layout); the flips
        # to/from the loop's [nc, C] layout happen in VMEM on the transpose
        # unit instead of costing two full XLA transpose passes over HBM.
        th = theta_ref[...]
        th_t_ref[...] = (dq_i16(th, PH_SCALE) if io_i16 else th).T  # [nc, ct]
        src, dst = th_t_ref, dt_t_ref
    else:
        assert not io_i16, "i16 PLL IO requires the channel-major layout"
        src, dst = theta_ref, dt_ref

    def body(i, carry):
        lpf_x1, lpf_y1, integ, nco_t, prev_pe = carry
        lpf_pe = b0 * (prev_pe + lpf_x1) - a1 * lpf_y1
        integ = jnp.clip(integ + ki_ts_f * prev_pe, -one, one)
        pi_err = lpf_pe * kp_f + integ
        control = jnp.clip(pi_err, -one, one)
        t = _wrap(nco_t + ts_f * (f_center_f + control * f_gain_f))
        th = src[pl.ds(i, 1), :]
        pe = two_pi * _wrap(th + t)
        dst[pl.ds(i, 1), :] = t
        return (prev_pe, lpf_pe, integ, t, pe)

    final = jax.lax.fori_loop(0, n_steps, body, carry0)
    if channel_major:
        if io_i16:
            from fm_radio_tpu.kernels.qformat import PH_SCALE, q_i16

            dt_ref[...] = q_i16(dt_t_ref[...].T, PH_SCALE)
        else:
            dt_ref[...] = dt_t_ref[...].T  # [nc, ct] -> [ct, nc]
    for k in range(_STATE_ROWS):
        carry_ref[pl.ds(k, 1), :] = final[k]

    @pl.when(it == n_chunks - 1)
    def _finish():
        out_st_ref[...] = carry_ref[...]


def pll_consts_from_cfg(cfg) -> dict:
    """Loop constants as Python floats (host-side, cfg-derived — usable as
    static kernel parameters inside a traced demod_block)."""
    from fm_radio_tpu.ops.design import create_iir_single_pole_lpf

    r = cfg.rates
    ts = 1.0 / float(r.fs_fm_out)
    k_lpf = cfg.analog.f_pilot_deviation / (r.fs_fm_out / 2.0)
    lpf_b, lpf_a = create_iir_single_pole_lpf(k_lpf)
    return dict(
        ts=ts,
        f_center=-float(cfg.analog.f_pilot),
        f_gain=-float(cfg.analog.f_pilot_deviation),
        ki_ts=cfg.pilot_pll_integrator_gain * ts,
        kp=cfg.pilot_pll_proportional_gain,
        lpf_b0=float(lpf_b[0]),
        lpf_a1=float(lpf_a[1]),
    )


def pilot_pll_pallas(cfg, state: PilotPLLState, pilot: jnp.ndarray,
                     interpret: bool = False):
    """Drop-in for pilot_pll_scan's production output (traceable: all kernel
    constants are static, derived from the hashable cfg).

    pilot: [C, N] complex64 or a plane tuple (re, im) of f32 [C, N].
    Returns (state', dt [C, N] f32).
    (The debug taps pll/raw_pe/pi_pe are only produced by the scan path.)

    With ``cfg.pll_time_chunks > 1`` the block's serial loop is split into G
    time chunks that ride the LANE axis (C*G lanes in one kernel pass) — see
    :func:`_pilot_pll_chunked`.
    """
    pr, pi = pilot if isinstance(pilot, tuple) else (pilot.real, pilot.imag)
    # data-parallel part of the phase detector: angle(pilot) in cycles
    theta_cn = jnp.arctan2(pi, pr) * jnp.float32(1.0 / (2.0 * jnp.pi))  # [C, N]
    return pilot_pll_pallas_theta(cfg, state, theta_cn, interpret=interpret)


def pilot_pll_pallas_theta(cfg, state: PilotPLLState, theta_cn: jnp.ndarray,
                           interpret: bool = False):
    """PLL loop over a PRECOMPUTED pilot phase (cycles).  Entry point for the
    fused mid-end kernel (kernels/midend_pallas.py), which already emits
    angle(pilot)/2pi — skips one full arctan2 pass over HBM."""
    c, n = theta_cn.shape
    g = int(getattr(cfg, "pll_time_chunks", 1))
    if g > 1 and n % g == 0 and n // g > int(getattr(cfg, "pll_chunk_warmup", 4096)):
        if theta_cn.dtype == jnp.int16:
            # the chunked variant is an opt-in low-channel lens: take the
            # simple XLA dequant rather than threading i16 through it
            from fm_radio_tpu.kernels.qformat import PH_SCALE, dq_i16

            theta_cn = dq_i16(theta_cn, PH_SCALE)
        return _pilot_pll_chunked(cfg, state, theta_cn, interpret=interpret)

    return _pilot_pll_run(cfg, state, theta_cn, interpret=interpret)


def _pilot_pll_run(cfg, state: PilotPLLState, theta_cn: jnp.ndarray,
                   interpret: bool = False):
    """Sequential kernel over the whole time axis (exact reference order).

    HBM layout is channel-major [C, N] end to end (the native layout of the
    producing/consuming kernels); the flips to the loop's time-major form
    happen in VMEM inside the kernel — no XLA transpose passes."""
    c, n = theta_cn.shape
    # channel tile: whole array up to 2048 lanes, else the largest
    # power-of-two divisor of c (gcd with 2048) — any c works, unlike a
    # fixed 2048 tile which rejected e.g. 2560 (= 5*512)
    ct = c if c <= 2048 else math.gcd(c, 2048)
    nc = pick_time_chunk(n, ct)
    n_chunks = n // nc
    channel_major = ct % 8 == 0  # in-VMEM transpose wants full sublane tiles
    io_i16 = theta_cn.dtype == jnp.int16
    if io_i16 and not channel_major:
        # odd channel tiles: dequant in XLA and run the f32 kernel (the i16
        # format is a production-shape fast path, not a requirement)
        from fm_radio_tpu.kernels.qformat import PH_SCALE, dq_i16

        theta_cn = dq_i16(theta_cn, PH_SCALE)
        io_i16 = False

    st = jnp.stack(
        [state.lpf_x1, state.lpf_y1, state.integ, state.nco_t, state.prev_pe]
    )  # [5, C]

    kern = functools.partial(
        _pll_kernel, n_steps=nc, n_chunks=n_chunks,
        channel_major=channel_major, io_i16=io_i16,
        **pll_consts_from_cfg(cfg)
    )
    # time chunks innermost: the VMEM carry scratch threads loop state from
    # chunk to chunk while theta/dt blocks stream through double-buffered VMEM
    grid = (c // ct, n_chunks)
    if channel_major:
        io_spec = pl.BlockSpec((ct, nc), lambda j, i: (j, i),
                               memory_space=pltpu.VMEM)
        io_shape = jax.ShapeDtypeStruct(
            (c, n), jnp.int16 if io_i16 else jnp.float32)
        t_scratch = pltpu.VMEM((nc, ct), jnp.float32)
    else:
        io_spec = pl.BlockSpec((nc, ct), lambda j, i: (i, j),
                               memory_space=pltpu.VMEM)
        io_shape = jax.ShapeDtypeStruct((n, c), jnp.float32)
        t_scratch = pltpu.VMEM((8, 128), jnp.float32)
    theta = theta_cn if channel_major else theta_cn.T

    dt_io, out_st = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            io_spec,
            pl.BlockSpec(
                (_STATE_ROWS, ct), lambda j, i: (0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            io_spec,
            pl.BlockSpec(
                (_STATE_ROWS, ct), lambda j, i: (0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            io_shape,
            jax.ShapeDtypeStruct((_STATE_ROWS, c), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((_STATE_ROWS, ct), jnp.float32), t_scratch, t_scratch
        ],
        interpret=interpret,
    )(theta, st)

    new_state = PilotPLLState(
        lpf_x1=out_st[0], lpf_y1=out_st[1], integ=out_st[2],
        nco_t=out_st[3], prev_pe=out_st[4],
    )
    return new_state, (dt_io if channel_major else dt_io.T)


def _pilot_pll_chunked(cfg, state: PilotPLLState, theta_cn: jnp.ndarray,
                       interpret: bool = False):
    """Block-parallel PLL (SURVEY.md §7 "the hard parts"): the N-step serial
    loop is split into G time chunks processed SIMULTANEOUSLY as extra lanes
    of one kernel pass (C*G lanes, N/G + W steps).

    Soundness: the pilot PLL is an *observer* of a strong 19 kHz tone — every
    locked state tracks the same NCO phase trajectory, so a chunk that starts
    from an approximate state converges to the sequential dt within the
    warm-up W (loop bandwidth ~100 Hz at Fs=128 kHz: phase re-acquires in
    ~1-2k samples).  Chunk 0 starts from the TRUE carried state with no
    warm-up (bit-exact stream head); chunks 1..G-1 start from the replicated
    entry state (already near lock in streaming steady state) and their first
    W outputs are discarded in favor of the left chunk's tail.  The block's
    carried-out state comes from the last chunk, so the next block continues
    from a locked state exactly as the sequential path would.

    Cost: (N/G + W) serial steps instead of N, at G-fold lane width.  The
    VPU step is issue-bound above ~256 lanes, so this pays off when C*G
    stays within a couple of vector registers — i.e. it is a LOW-channel-
    count accelerator (single-station CLI demod: C=1, G=8 -> ~6x fewer
    serial cycles), not a batch-throughput one.

    Accuracy: chunk 0 is exact; later chunks agree with the sequential dt to
    ~3e-3 cycles rms (the loops see identical inputs from slightly different
    states; the difference decays with the proportional time constant
    1/(2*pi*f_dev*Kp) ~ 20k samples, longer than a chunk).  RDS hard
    decisions are unchanged; audio differs from the sequential path at the
    -35 dB level — a scanning/monitoring trade, which is why the default is
    pll_time_chunks=1 (exact).
    """
    c, n = theta_cn.shape
    g = int(cfg.pll_time_chunks)
    w = int(cfg.pll_chunk_warmup)
    l = n // g
    assert n % g == 0 and w < l

    # chunk g input: theta[gL - W : gL + L] (chunk 0: [0 : L + W], no warmup)
    starts = [max(gg * l - w, 0) for gg in range(g)]
    xw = jnp.stack(
        [jax.lax.dynamic_slice_in_dim(theta_cn, s, l + w, axis=1) for s in starts]
    )  # [G, C, L+W]
    xw = xw.reshape(g * c, l + w)

    # Initial states: chunk 0 true; chunks 1..G-1 replicate the entry state
    # (loop-filter + integrator carry the frequency information) but seed the
    # NCO phase FROM THE SIGNAL: a locked loop satisfies t = -theta (mod 1),
    # so nco_t = -theta[start] - ts*f_center makes the first phase error ~
    # loop-noise sized instead of uniformly random.  With the proportional
    # time constant at 1/(2*pi*f_dev*Kp) ~ 20k samples, seeding is what makes
    # a short warm-up sufficient.
    consts = pll_consts_from_cfg(cfg)
    st_rows = jnp.stack(
        [state.lpf_x1, state.lpf_y1, state.integ, state.nco_t, state.prev_pe]
    )  # [5, C]
    st_all = jnp.tile(st_rows, (1, g))  # [5, G*C] (chunk-major lanes)
    seed_t = jnp.concatenate(
        [state.nco_t[None, :]]
        + [
            (-theta_cn[:, s] - jnp.float32(consts["ts"] * consts["f_center"]))[None, :]
            for s in starts[1:]
        ],
        axis=0,
    ).reshape(-1)  # [G*C] chunk-major
    seed_t = seed_t - jnp.round(seed_t)
    st_all = st_all.at[3, :].set(seed_t)
    # NOTE: the integrator (frequency memory) is deliberately NOT re-seeded
    # from a local frequency estimate: any estimate error becomes a
    # *persistent* frequency offset (the integrator time constant is far
    # longer than a chunk), i.e. a phase ramp.  The replicated entry
    # integrator is correct by continuity — the pilot frequency drifts far
    # slower than one block.

    cg = g * c
    # same any-lane-count tiling as _pilot_pll_run (gcd with 2048, e.g.
    # c=2560,g=2 -> ct=2048 would NOT divide; gcd gives 1024)
    ct = cg if cg <= 2048 else math.gcd(cg, 2048)
    # pick_time_chunk returns a divisor of its n, so L+W splits exactly
    nc = pick_time_chunk(l + w, ct)
    steps = l + w
    n_chunks = steps // nc

    kern = functools.partial(
        _pll_kernel, n_steps=nc, n_chunks=n_chunks, **pll_consts_from_cfg(cfg)
    )
    dt_t, out_st = pl.pallas_call(
        kern,
        grid=(cg // ct, n_chunks),
        in_specs=[
            pl.BlockSpec((nc, ct), lambda j, i: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (_STATE_ROWS, ct), lambda j, i: (0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((nc, ct), lambda j, i: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (_STATE_ROWS, ct), lambda j, i: (0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((steps, cg), jnp.float32),
            jax.ShapeDtypeStruct((_STATE_ROWS, cg), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((_STATE_ROWS, ct), jnp.float32),
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.VMEM((8, 128), jnp.float32),
        ],
        interpret=interpret,
    )(xw.T, st_all)

    dt_all = dt_t.T.reshape(g, c, steps)  # chunk-major
    # keep the payload [gL, gL+L) of each chunk: offset gL - start into its dt
    kept = [
        jax.lax.dynamic_slice_in_dim(dt_all[gg], gg * l - starts[gg], l, axis=1)
        for gg in range(g)
    ]
    dt = jnp.concatenate(kept, axis=1)  # [C, N]

    # carried-out state: the LAST chunk's state — its input ends exactly at
    # sample N (steps == L+W, see above), so this is the stream carry.
    fin = out_st[:, (g - 1) * c :]
    new_state = PilotPLLState(
        lpf_x1=fin[0], lpf_y1=fin[1], integ=fin[2], nco_t=fin[3], prev_pe=fin[4]
    )
    return new_state, dt
