"""Per-stage timing at production scale (big C, big B) in single dispatches.

The axon tunnel has a large, variable per-dispatch latency (5-30 ms), so each
op is measured at shapes where compute dominates; the trivial-dispatch
baseline is printed for reference and subtracted.

Usage: python tools/stage_probe.py [channels] [block]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from fm_radio_tpu.config import DemodConfig
from fm_radio_tpu.models.bpsk import bpsk_init_state
from fm_radio_tpu.models.demod import demod_block, demod_init_state, make_coeffs
from fm_radio_tpu.models.pilot_pll import pilot_pll_init_state
from fm_radio_tpu.ops.agc import agc_init_state, agc_process
from fm_radio_tpu.ops.discriminator import fm_discriminate
from fm_radio_tpu.ops.fir import hilbert_fir, polyphase_decimate
from fm_radio_tpu.ops.iir import iir_filter_complex, iir_init_state
from fm_radio_tpu.ops.mixer import apply_harmonic_pll
from fm_radio_tpu.utils.transfer import device_put_complex, init_on_device


def measure(run, *args, n=4):
    out = run(*args)
    float(np.asarray(out if not isinstance(out, tuple) else out[-1]))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = run(*args)
        float(np.asarray(out if not isinstance(out, tuple) else out[-1]))
        best = min(best, time.perf_counter() - t0)
    return best


BASE = None


def report(name, run, *args):
    t = measure(run, *args)
    print(f"{name:40s} {t * 1e3:9.2f} ms   (-base {max(t - BASE, 0) * 1e3:8.2f} ms)", flush=True)


def main():
    global BASE
    c = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 1048576
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

    print(f"channels={c} block={b} device={jax.devices()[0]}", flush=True)

    triv = jax.jit(lambda v: v.sum())
    xx = jnp.zeros((8, 128), jnp.float32)
    BASE = measure(lambda: triv(xx))
    print(f"{'trivial dispatch (baseline)':40s} {BASE * 1e3:9.2f} ms", flush=True)

    st0 = demod_init_state(cfg, c)
    x_bb = c64((c, b))
    report(
        "full demod_block",
        jax.jit(
            lambda s, x: jax.tree.reduce(
                lambda a, v: a + jnp.sum(jnp.abs(v)),
                demod_block(cfg, coeffs, s, x)[1],
                jnp.float32(0),
            )
        ),
        st0,
        x_bb,
    )
    report(
        "poly ds x4 c64 (fm_in)",
        jax.jit(lambda s, x: polyphase_decimate(coeffs.taps_fm_in, s, x, r.ds_fm_in)[1].real.sum()),
        st0["ds_fm_in"],
        x_bb,
    )
    x_fm_in = c64((c, b // 4))
    report(
        "discriminator",
        jax.jit(lambda p, x: fm_discriminate(p, x, 75e3, float(r.fs_fm_in))[1].sum()),
        st0["disc_prev_theta"],
        x_fm_in,
    )
    x_fm_in_f = f32((c, b // 4))
    report(
        "poly ds x2 f32 (fm_out)",
        jax.jit(lambda s, x: polyphase_decimate(coeffs.taps_fm_out, s, x, r.ds_fm_out)[1].sum()),
        jnp.zeros((c, 62), jnp.float32),
        x_fm_in_f,
    )
    x_fm_out_f = f32((c, b // 8))
    report(
        "hilbert 65-tap",
        jax.jit(lambda s, x: hilbert_fir(coeffs.taps_hilbert, s, x)[1].real.sum()),
        jnp.zeros((c, 64), jnp.float32),
        x_fm_out_f,
    )
    x_fm_out = c64((c, b // 8))
    report(
        "iir peak c64 (toeplitz)",
        jax.jit(lambda s, x: iir_filter_complex(coeffs.peak_b, coeffs.peak_a, s, x)[1].real.sum()),
        init_on_device(iir_init_state, 2 * c, 2),
        x_fm_out,
    )
    report(
        "agc",
        jax.jit(lambda s, x: agc_process(s, x)[1].real.sum()),
        agc_init_state(c),
        x_fm_out,
    )
    from fm_radio_tpu.kernels.pll_pallas import pilot_pll_pallas

    report(
        "pilot PLL pallas",
        jax.jit(lambda s, x: pilot_pll_pallas(cfg, s, x)[1].sum()),
        init_on_device(pilot_pll_init_state, c),
        x_fm_out,
    )
    dt = f32((c, b // 8))
    report(
        "harmonic mixer (h=2)",
        jax.jit(lambda d, x: apply_harmonic_pll(d, x, 2.0, 0.1).real.sum()),
        dt,
        x_fm_out,
    )
    report(
        "poly ds x4 c64 (audio)",
        jax.jit(lambda s, x: polyphase_decimate(coeffs.taps_audio_lpr, s, x, r.ds_audio)[1].real.sum()),
        st0["ds_audio_lpr"],
        x_fm_out,
    )
    report(
        "poly ds x8 c64 (rds)",
        jax.jit(lambda s, x: polyphase_decimate(coeffs.taps_rds, s, x, r.ds_rds)[1].real.sum()),
        st0["ds_rds"],
        x_fm_out,
    )
    from fm_radio_tpu.kernels.bpsk_pallas import bpsk_sync_pallas

    x_rds = c64((c, b // 64))
    report(
        "BPSK sync pallas",
        jax.jit(lambda s, x: bpsk_sync_pallas(cfg, s, x)[1]["pred"].sum()),
        init_on_device(bpsk_init_state, c),
        x_rds,
    )


if __name__ == "__main__":
    main()
