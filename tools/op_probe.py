"""Trustworthy per-op steady-state timing: each op runs inside a 32-step
lax.scan (carry = op state, fresh input slices) so dispatch/tunnel latency
amortizes and XLA cannot constant-fold the inputs.

Usage: python tools/op_probe.py [channels]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from fm_radio_tpu.config import DemodConfig
from fm_radio_tpu.models.bpsk import bpsk_init_state
from fm_radio_tpu.models.demod import demod_init_state, make_coeffs
from fm_radio_tpu.models.pilot_pll import pilot_pll_init_state
from fm_radio_tpu.ops.agc import agc_init_state, agc_process
from fm_radio_tpu.ops.discriminator import fm_discriminate
from fm_radio_tpu.ops.fir import hilbert_fir, polyphase_decimate
from fm_radio_tpu.ops.iir import iir_filter_complex, iir_init_state
from fm_radio_tpu.ops.mixer import apply_harmonic_pll
from fm_radio_tpu.utils.transfer import device_put_complex, init_on_device

REPS = 32


def bench_scanned(name, op, state, xs):
    """op(state, x) -> (state, y). xs: [REPS, ...] distinct inputs."""

    @jax.jit
    def run(state, xs):
        def step(st, x):
            st, y = op(st, x)
            if isinstance(y, dict):
                y = y["pred"]
            if isinstance(y, tuple):
                y = y[0]
            probe = jnp.sum(jnp.abs(y)) if jnp.iscomplexobj(y) else jnp.sum(y)
            return st, probe

        st, probes = jax.lax.scan(step, state, xs)
        return jnp.sum(probes)

    float(np.asarray(run(state, xs)))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(run(state, xs)))
        best = min(best, time.perf_counter() - t0)
    per = best / REPS
    n = xs.shape[0] * xs.shape[-1] * xs.shape[1] if xs.ndim == 3 else 0
    print(f"{name:38s} {per * 1e3:9.3f} ms/block", flush=True)
    return per


def main():
    c = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    b = 65536
    cfg = DemodConfig()
    coeffs = make_coeffs(cfg)
    r = cfg.rates
    rng = np.random.default_rng(0)

    def c64(shape):
        return device_put_complex(
            (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(
                np.complex64
            )
        )

    def f32(shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    x_bb = c64((REPS, c, b))
    x_fm_in = c64((REPS, c, b // 4))
    x_fm_out_f = f32((REPS, c, b // 8))
    x_fm_out_c = c64((REPS, c, b // 8))
    x_rds = c64((REPS, c, b // 64))
    dtx = jnp.asarray(rng.uniform(-0.5, 0.5, (REPS, c, b // 8)).astype(np.float32))

    print(f"channels={c} block={b} device={jax.devices()[0]}", flush=True)

    bench_scanned(
        "poly ds x4 c64 (fm_in, 64 taps)",
        lambda st, x: polyphase_decimate(coeffs.taps_fm_in, st, x, r.ds_fm_in),
        demod_init_state(cfg, c)["ds_fm_in"],
        x_bb,
    )
    bench_scanned(
        "discriminator",
        lambda st, x: fm_discriminate(st, x, 75e3, float(r.fs_fm_in)),
        jnp.zeros((c,), jnp.float32),
        x_fm_in,
    )
    bench_scanned(
        "poly ds x2 f32 (fm_out, 64 taps)",
        lambda st, x: polyphase_decimate(coeffs.taps_fm_out, st, x, r.ds_fm_out),
        jnp.zeros((c, 62), jnp.float32),
        f32((REPS, c, b // 4)),
    )
    bench_scanned(
        "hilbert 65-tap",
        lambda st, x: hilbert_fir(coeffs.taps_hilbert, st, x),
        jnp.zeros((c, 64), jnp.float32),
        x_fm_out_f,
    )
    bench_scanned(
        "iir peak c64 (assoc scan)",
        lambda st, x: iir_filter_complex(coeffs.peak_b, coeffs.peak_a, st, x),
        init_on_device(iir_init_state, 2 * c, 2),
        x_fm_out_c,
    )
    bench_scanned(
        "agc",
        lambda st, x: agc_process(st, x),
        agc_init_state(c),
        x_fm_out_c,
    )

    from fm_radio_tpu.kernels.pll_pallas import pilot_pll_pallas

    bench_scanned(
        "pilot PLL pallas",
        lambda st, x: pilot_pll_pallas(cfg, st, x),
        init_on_device(pilot_pll_init_state, c),
        x_fm_out_c,
    )

    bench_scanned(
        "harmonic mixer (h=2)",
        lambda st, xd: (st, apply_harmonic_pll(xd[0], xd[1], 2.0, 0.1)),
        jnp.float32(0),
        (dtx, x_fm_out_c),
    ) if False else None
    # mixer takes two inputs; scan over stacked pair
    @jax.jit
    def run_mixer(dts, xs):
        def step(st, dx):
            d, x = dx
            y = apply_harmonic_pll(d, x, 2.0, 0.1)
            return st, jnp.sum(jnp.abs(y))

        _, probes = jax.lax.scan(step, jnp.float32(0), (dts, xs))
        return jnp.sum(probes)

    float(np.asarray(run_mixer(dtx, x_fm_out_c)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(run_mixer(dtx, x_fm_out_c)))
        best = min(best, time.perf_counter() - t0)
    print(f"{'harmonic mixer (h=2)':38s} {best / REPS * 1e3:9.3f} ms/block", flush=True)

    bench_scanned(
        "poly ds x4 c64 (audio, 128 taps)",
        lambda st, x: polyphase_decimate(coeffs.taps_audio_lpr, st, x, r.ds_audio),
        demod_init_state(cfg, c)["ds_audio_lpr"],
        x_fm_out_c,
    )
    bench_scanned(
        "poly ds x8 c64 (rds, 128 taps)",
        lambda st, x: polyphase_decimate(coeffs.taps_rds, st, x, r.ds_rds),
        demod_init_state(cfg, c)["ds_rds"],
        x_fm_out_c,
    )

    from fm_radio_tpu.kernels.bpsk_pallas import bpsk_sync_pallas

    bench_scanned(
        "BPSK sync pallas",
        lambda st, x: bpsk_sync_pallas(cfg, st, x),
        init_on_device(bpsk_init_state, c),
        x_rds,
    )


if __name__ == "__main__":
    main()
