"""Cumulative-prefix timing of demod_block: where does the time go?

Default mode probes the PRODUCTION fused-kernel pipeline (frontend / midend /
PLL / extract); ``--unfused`` probes the XLA-op fallback path stage by stage.
Each prefix is timed inside a scanned multi-block dispatch (the only reliable
measurement over the tunnel: per-dispatch latency is 5-30 ms and variable,
so only deltas between prefixes at n_blocks amortization are trustworthy).
Completion probes: the fused path consumes ONE element per kernel output
(pallas_call is opaque to XLA — O(1) probes force the kernel without adding
full-reduction passes to the deltas); the unfused path keeps FULL sums
(XLA ops are partially DCE-able, anything less corrupts the deltas).

Usage: python tools/chain_probe.py [channels] [block] [n_blocks] [--unfused]
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from fm_radio_tpu.config import DemodConfig
from fm_radio_tpu.models.demod import demod_block, demod_init_state, make_coeffs
from fm_radio_tpu.ops.agc import agc_process_p
from fm_radio_tpu.ops.discriminator import fm_discriminate_p
from fm_radio_tpu.ops.fir import hilbert_fir_p, polyphase_decimate, polyphase_decimate_p
from fm_radio_tpu.ops.iir import iir_filter_planes
from fm_radio_tpu.ops.mixer import apply_harmonic_pll_p


def _stream3_pallas(xr, xi, dt):
    """Stream-only stand-in for K3: reads the 3 planes in K3's exact tiling
    ((128, 1024) blocks, channel grid major), emits a tiny (c, 128) result."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c, b8 = xr.shape
    c_blk, t_blk = (c if c <= 128 else 128), 1024

    def kern(xr_ref, xi_ref, dt_ref, y_ref):
        acc = (jnp.sum(xr_ref[...], -1, keepdims=True)
               + jnp.sum(xi_ref[...], -1, keepdims=True)
               + jnp.sum(dt_ref[...], -1, keepdims=True))
        y_ref[...] = acc[:, :1] * jnp.ones((1, 128), jnp.float32)

    tspec = pl.BlockSpec((c_blk, t_blk), lambda ci, ti: (ci, ti),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern, grid=(c // c_blk, b8 // t_blk),
        in_specs=[tspec, tspec, tspec],
        out_specs=pl.BlockSpec((c_blk, 128), lambda ci, ti: (ci, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, 128), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(xr, xi, dt)


def _probe(*arrays):
    """O(1) completion probe: pallas_call is opaque to XLA, so consuming ONE
    element of each output forces the whole kernel without adding the full-
    reduction passes that used to inflate each stage's delta by ~0.3-0.5 ms
    (the unfused path still needs full sums — XLA ops DCE partially)."""
    return sum(a[..., 0, 0].astype(jnp.float32).reshape(()) for a in arrays)


def fused_prefix(cfg, coeffs, state, x, upto: int, k3iso: str = ""):
    """Production kernels, stages 0..upto.

    ``k3iso`` (with upto=3) isolates pieces of the K3 stage delta — the
    round-3 open question was ~1.7 ms of "inter-kernel packing" charged to
    K3 in-chain vs its standalone probe (VERDICT r3 item 2):
      "glue"    pack_ext_tails + state glue only, NO kernel (full-sum probe:
                XLA would DCE an O(1)-probed pack down to one element)
      "twice"   extract_pallas twice; (twice - normal) = the marginal cost
                of a second in-chain K3 whose producers ran 2 dispatches ago
      "barrier" optimization_barrier on (iq_p, dt) before the kernel —
                decouples K3 from its producers in XLA's scheduler
      "stream3" replace K3 with a stream-only kernel (same inputs, same
                tiling, tiny output): is the premium in the READ path?
      "preread" stream3 THEN the real K3 (order forced by a barrier): does
                pre-touching the planes move the premium off K3?
    """
    from fm_radio_tpu.kernels.extract_pallas import (
        extract_pallas, pack_ext_tails,
    )
    from fm_radio_tpu.kernels.frontend_pallas import ds4_disc_pallas
    from fm_radio_tpu.kernels.midend_pallas import midend_pallas
    from fm_radio_tpu.kernels.pll_pallas import pilot_pll_pallas_theta

    st = dict(state)
    # x: [2, C, B] int8 planes (production ingest), [C, B] packed f32
    # words, or [2, C, B] f32 planes
    if x.ndim == 3 and x.dtype != jnp.int8:
        xin = (x[0], x[1])
    else:
        xin = x
    tail, prev, fm_demod = ds4_disc_pallas(
        coeffs.taps_fm_in, (st["ds_fm_in"].real, st["ds_fm_in"].imag),
        st["disc_prev_theta"], xin,
        cfg.analog.f_wbfm_deviation, float(cfg.rates.fs_fm_in),
        int_input=bool(cfg.assume_integer_input),
        int8_dots=bool(cfg.frontend_int8),
        band_tables=getattr(coeffs, "kernel_tables", None))
    st["ds_fm_in"] = jax.lax.complex(*tail)
    st["disc_prev_theta"] = prev
    if upto == 0:
        return st, _probe(fm_demod)
    st2, iq_p, theta = midend_pallas(coeffs, cfg, st, fm_demod)
    for k in ("ds_fm_out", "deemph", "hilbert", "peak_pilot", "agc_pilot"):
        st[k] = st2[k]
    if upto == 1:
        return st, _probe(iq_p[0], iq_p[1], theta)
    st["pll"], dt = pilot_pll_pallas_theta(cfg, st["pll"], theta)
    if upto == 2:
        return st, _probe(dt, iq_p[0], iq_p[1])
    if upto == 3 and k3iso == "glue":
        c = iq_p[0].shape[0]
        halo_a = coeffs.taps_audio_lpr.shape[0] - 4
        halo_r = coeffs.taps_rds.shape[0] - 8
        tails = pack_ext_tails(st, c, halo_a, halo_r)
        return st, jnp.sum(tails) + _probe(dt, iq_p[0], iq_p[1])
    if upto == 3 and k3iso in ("stream3", "preread"):
        y = _stream3_pallas(iq_p[0], iq_p[1], dt)
        if k3iso == "stream3":
            return st, _probe(y, dt, iq_p[0], iq_p[1])
        iq0, iq1, dtb, yb = jax.lax.optimization_barrier(
            (iq_p[0], iq_p[1], dt, y))  # forces stream3 BEFORE the real K3
        iq_p, dt = (iq0, iq1), dtb
    if upto == 3 and k3iso == "barrier":
        iq_p = jax.lax.optimization_barrier(iq_p)
        dt = jax.lax.optimization_barrier(dt)
    st3, lpr, lmr, rds, rds_pow = extract_pallas(coeffs, cfg, st, iq_p, dt)
    for k in ("ds_audio_lpr", "ds_audio_lmr", "ds_rds"):
        st[k] = st3[k]
    if upto == 3 and k3iso == "twice":
        st4, lpr2, lmr2, rds2, _pow2 = extract_pallas(coeffs, cfg, st, iq_p, dt)
        return st, _probe(lpr, lmr[1], rds[0], rds[1],
                          lpr2, lmr2[1], rds2[0], rds2[1])
    if upto == 3:
        return st, _probe(lpr, lmr[1], rds[0], rds[1])
    # stage 4: the post-extract glue — fused RDS AGC (gain from the extract
    # kernel's in-kernel power sum, applied at BPSK ingest) + BPSK kernel,
    # exactly the production path in models/demod.py
    from fm_radio_tpu.kernels.bpsk_pallas import bpsk_sync_pallas
    from fm_radio_tpu.ops.agc import _agc_gain

    st["agc_rds"] = _agc_gain(
        st["agc_rds"], rds_pow / jnp.float32(rds[0].shape[-1]),
        cfg.bpsk.agc_target_power, 0.2,
    )
    st["bpsk"], bpsk_outs = bpsk_sync_pallas(
        cfg, st["bpsk"], rds, gain=st["agc_rds"],
        interpret=jax.default_backend() != "tpu")
    return st, _probe(lpr, lmr[1], bpsk_outs["pred"],
                      bpsk_outs["valid"].astype(jnp.float32))


FUSED_STAGES = [
    "K1 ds4+disc kernel",
    "+ K2 ds2/deemph/hilbert/peak/theta",
    "+ PLL serial kernel",
    "+ K3 LPR/LMR/RDS extract",
    "+ RDS AGC + BPSK kernel",
]


def chain_prefix(cfg, coeffs, state, xp, upto: int):
    """Unfused XLA ops, stages 1..upto of demod_block."""
    r = cfg.rates
    st = dict(state)
    probe = xp[0][0, -1] + xp[1][0, -1]
    k = 0

    def done():
        return st, probe

    k += 1  # 1: ds_fm_in
    if upto < k:
        return done()
    st["ds_fm_in"], fm_in_p = polyphase_decimate_p(
        coeffs.taps_fm_in, st["ds_fm_in"], xp, r.ds_fm_in
    )
    probe = jnp.sum(fm_in_p[0]) + jnp.sum(fm_in_p[1])

    k += 1  # 2: discriminator
    if upto < k:
        return done()
    st["disc_prev_theta"], fm_demod = fm_discriminate_p(
        st["disc_prev_theta"], fm_in_p, cfg.analog.f_wbfm_deviation, float(r.fs_fm_in)
    )
    probe = jnp.sum(fm_demod)

    k += 1  # 3: ds_fm_out
    if upto < k:
        return done()
    st["ds_fm_out"], fm_out = polyphase_decimate(
        coeffs.taps_fm_out, st["ds_fm_out"], fm_demod, r.ds_fm_out
    )
    probe = jnp.sum(fm_out)

    k += 1  # 4: hilbert
    if upto < k:
        return done()
    st["hilbert"], fm_out_iq_p = hilbert_fir_p(
        coeffs.taps_hilbert, st["hilbert"], fm_out
    )
    probe = jnp.sum(fm_out_iq_p[0]) + jnp.sum(fm_out_iq_p[1])

    k += 1  # 5: peak IIR + AGC
    if upto < k:
        return done()
    st["peak_pilot"], pilot_p = iir_filter_planes(
        coeffs.peak_b, coeffs.peak_a, st["peak_pilot"], fm_out_iq_p
    )
    st["agc_pilot"], pilot_p = agc_process_p(st["agc_pilot"], pilot_p, target_power=1.0)
    probe = jnp.sum(pilot_p[0]) + jnp.sum(pilot_p[1])

    k += 1  # 6: pilot PLL (pallas)
    if upto < k:
        return done()
    from fm_radio_tpu.kernels.pll_pallas import pilot_pll_pallas

    st["pll"], dt = pilot_pll_pallas(cfg, st["pll"], pilot_p)
    probe = jnp.sum(dt)

    k += 1  # 7: LPR decimate
    if upto < k:
        return done()
    st["ds_audio_lpr"], audio_lpr = polyphase_decimate_p(
        coeffs.taps_audio_lpr, st["ds_audio_lpr"], fm_out_iq_p, r.ds_audio,
        imag_out=False,
    )
    probe = probe + jnp.sum(audio_lpr)

    k += 1  # 8: LMR mix + decimate + phase corr
    if upto < k:
        return done()
    h_lmr = cfg.analog.f_audio_lmr_center / cfg.analog.f_pilot
    mixed_lmr_p = apply_harmonic_pll_p(dt, fm_out_iq_p, h_lmr, st["lmr_phase_err"])
    st["ds_audio_lmr"], tmp_lmr_p = polyphase_decimate_p(
        coeffs.taps_audio_lmr, st["ds_audio_lmr"], mixed_lmr_p, r.ds_audio
    )
    stride = cfg.audio_lmr_phase_read_stride
    vr = tmp_lmr_p[0][:, ::stride]
    vi = tmp_lmr_p[1][:, ::stride]
    phase = jnp.arctan2(vi, vr)
    half_pi = jnp.float32(jnp.pi / 2.0)
    est = jnp.where(phase > 0.0, half_pi - phase, -half_pi - phase)
    avg = jnp.mean(est, axis=-1)
    new_off = st["lmr_phase_err"] + jnp.float32(cfg.audio_lmr_phase_beta) * avg
    st["lmr_phase_err"] = jnp.fmod(new_off, jnp.float32(2.0 * jnp.pi))
    probe = probe + jnp.sum(tmp_lmr_p[1])

    k += 1  # 9: RDS mix + decimate
    if upto < k:
        return done()
    h_rds = cfg.analog.f_rds_center / cfg.analog.f_pilot
    mixed_rds_p = apply_harmonic_pll_p(dt, fm_out_iq_p, h_rds, 0.0)
    st["ds_rds"], rds_p = polyphase_decimate_p(
        coeffs.taps_rds, st["ds_rds"], mixed_rds_p, r.ds_rds
    )
    probe = probe + jnp.sum(rds_p[0]) + jnp.sum(rds_p[1])

    k += 1  # 10: RDS AGC + BPSK
    if upto < k:
        return done()
    st["agc_rds"], rds_agc_p = agc_process_p(
        st["agc_rds"], rds_p, target_power=cfg.bpsk.agc_target_power
    )
    from fm_radio_tpu.kernels.bpsk_pallas import bpsk_sync_pallas

    st["bpsk"], bpsk_outs = bpsk_sync_pallas(cfg, st["bpsk"], rds_agc_p)
    probe = probe + jnp.sum(bpsk_outs["pred"])

    return st, probe


UNFUSED_STAGES = [
    "nothing (scan overhead)",
    "ds x4 c64 (fm_in)",
    "+ discriminator",
    "+ ds x2 f32 (fm_out)",
    "+ hilbert 65",
    "+ peak IIR + AGC",
    "+ pilot PLL pallas",
    "+ LPR ds x4",
    "+ LMR mix + ds x4 + phase",
    "+ RDS mix + ds x8",
    "+ RDS AGC + BPSK pallas",
]


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    unfused = "--unfused" in sys.argv
    # default = the round-3 production ingest (int8 planes + int8-direct
    # front end, exactly the bench config); --packed probes the round-2
    # packed-word bf16x2 lens, --planes the (re, im) f32-plane fallback
    planes = "--planes" in sys.argv or unfused
    packed = "--packed" in sys.argv
    channels = int(args[0]) if len(args) > 0 else 256
    block = int(args[1]) if len(args) > 1 else 1 << 20
    n_blocks = int(args[2]) if len(args) > 2 else 8

    cfg = DemodConfig(assume_integer_input=not planes,
                      frontend_int8=not (planes or packed))
    coeffs = make_coeffs(cfg)
    state = demod_init_state(cfg, channels)

    rng = np.random.default_rng(0)
    phase = np.cumsum(
        rng.standard_normal((channels, block)).astype(np.float32) * 0.5, axis=-1
    )
    if planes:
        xp = np.stack(
            [100.0 * np.cos(phase), 100.0 * np.sin(phase)]
        ).astype(np.float32)
        x = jnp.asarray(xp)
    else:
        from fm_radio_tpu.utils.transfer import pack_iq_u8, split_iq_i8

        iq_u8 = np.stack(
            [np.round(100.0 * np.cos(phase) + 127.0),
             np.round(100.0 * np.sin(phase) + 127.0)],
            axis=-1,
        ).astype(np.uint8)
        x = jnp.asarray(pack_iq_u8(iq_u8) if packed else split_iq_i8(iq_u8))

    def timed(fn, *args):
        out = fn(*args)
        float(np.asarray(out))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(*args)
            float(np.asarray(out))
            best = min(best, time.perf_counter() - t0)
        return best / n_blocks

    print(f"channels={channels} block={block} n_blocks={n_blocks} "
          f"device={jax.devices()[0].device_kind} "
          f"mode={'unfused' if unfused else 'fused'} "
          f"ingest={'planes' if planes else 'packed' if packed else 'i8'}")

    stages = UNFUSED_STAGES if unfused else FUSED_STAGES
    prefix = chain_prefix if unfused else fused_prefix
    k3iso = "--k3iso" in sys.argv

    def timed_prefix(upto, iso=""):
        @jax.jit
        def run(state, x):
            def step(st, _):
                if unfused:
                    st, probe = prefix(cfg, coeffs, st, (x[0], x[1]), upto)
                else:
                    st, probe = prefix(cfg, coeffs, st, x, upto, k3iso=iso)
                return st, probe
            st, probes = jax.lax.scan(step, state, None, length=n_blocks)
            return jnp.sum(probes)

        return timed(run, state, x)

    k3only = "--k3only" in sys.argv  # just stages 2, 3 + iso variants
    prev = 0.0
    t3 = t2 = 0.0
    for upto, name in enumerate(stages):
        if k3only and upto not in (2, 3):
            continue
        dt = timed_prefix(upto)
        print(f"{name:36s} {dt*1e3:9.2f} ms/block   (delta {1e3*(dt-prev):+8.2f} ms)")
        if upto == 2:
            t2 = dt
        if upto == 3:
            t3 = dt
        prev = dt

    if k3iso and not unfused:
        # K3-delta isolation (VERDICT r3 item 2): where does the in-chain K3
        # stage pay over its standalone probe?
        for iso, expl in (
            ("glue", "pack_ext_tails + state glue, NO kernel"),
            ("barrier", "K3 behind an optimization_barrier"),
            ("twice", "K3 x2 (delta = marginal 2nd in-chain K3)"),
            ("stream3", "stream-only K3 stand-in (read path only)"),
            ("preread", "stream3 THEN K3 (premium mobility test)"),
        ):
            dt = timed_prefix(3, iso)
            base = t3 if iso == "twice" else t2
            print(f"k3iso:{iso:28s} {dt*1e3:9.2f} ms/block   "
                  f"(delta {1e3*(dt-base):+8.2f} ms)  [{expl}]")

    if k3only:
        return

    @jax.jit
    def run_full(state, x):
        def step(st, _):
            st, outs = demod_block(cfg, coeffs, st, x)
            return st, (jnp.sum(outs["audio"]), jnp.sum(outs["rds_pred"]))
        st, probes = jax.lax.scan(step, state, None, length=n_blocks)
        return sum(jnp.sum(p) for p in probes)

    dt = timed(run_full, state, x)
    print(f"{'full demod_block (+mix, probes)':36s} {dt*1e3:9.2f} ms/block")
    msps = channels * block / dt / 1e6
    print(f"=> {msps:.0f} Msps aggregate")


if __name__ == "__main__":
    main()
