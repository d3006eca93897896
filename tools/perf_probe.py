"""Per-stage TPU timing probe: where does a demod block spend its time?

Usage: python tools/perf_probe.py [channels] [block]
Times each pipeline stage in isolation.  All device constants are passed as
jit arguments (the axon tunnel cannot embed device arrays as constants) and
all host<->device crossings are f32 (utils/transfer.py).
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from fm_radio_tpu.config import DemodConfig
from fm_radio_tpu.models.bpsk import bpsk_init_state, bpsk_sync_scan
from fm_radio_tpu.models.demod import demod_block, demod_init_state, make_coeffs
from fm_radio_tpu.models.pilot_pll import pilot_pll_init_state, pilot_pll_scan
from fm_radio_tpu.ops.agc import agc_init_state, agc_process
from fm_radio_tpu.ops.discriminator import fm_discriminate
from fm_radio_tpu.ops.fir import hilbert_fir, polyphase_decimate
from fm_radio_tpu.ops.iir import iir_filter_complex, iir_init_state
from fm_radio_tpu.ops.mixer import apply_harmonic_pll
from fm_radio_tpu.utils.transfer import device_put_complex, init_on_device


@jax.jit
def _tree_probe(out):
    """Scalar depending on every leaf — fetching it forces completion
    (block_until_ready is unreliable over the tunnel backend)."""
    tot = jnp.float32(0)
    for leaf in jax.tree.leaves(out):
        if jnp.issubdtype(leaf.dtype, jnp.complexfloating):
            tot = tot + jnp.sum(jnp.abs(leaf))
        else:
            tot = tot + jnp.sum(leaf.astype(jnp.float32))
    return tot


_LATENCY = None


def _roundtrip_latency():
    global _LATENCY
    if _LATENCY is None:
        f = jax.jit(lambda v: v.sum())
        x = jnp.zeros((8, 128), jnp.float32)
        float(np.asarray(f(x)))
        _LATENCY = min(
            _time_once(lambda: float(np.asarray(f(x)))) for _ in range(5)
        )
    return _LATENCY


def _time_once(thunk):
    t0 = time.perf_counter()
    thunk()
    return time.perf_counter() - t0


def timeit(name, fn, *args, n=5):
    lat = _roundtrip_latency()
    float(np.asarray(_tree_probe(fn(*args))))  # compile + warm
    best = float("inf")
    for _ in range(n):
        best = min(
            best, _time_once(lambda: float(np.asarray(_tree_probe(fn(*args)))))
        )
    best = max(best - lat, 1e-6)  # subtract fixed tunnel roundtrip
    print(f"{name:32s} {best * 1e3:10.3f} ms", flush=True)
    return best


def main():
    c = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
    cfg = DemodConfig()
    coeffs = make_coeffs(cfg)
    r = cfg.rates

    rng = np.random.default_rng(0)
    ph = np.cumsum(rng.standard_normal((c, b)) * 0.5, -1)
    x = device_put_complex((100 * np.exp(1j * ph)).astype(np.complex64))
    x_fm_out = device_put_complex(
        (rng.standard_normal((c, b // 8)) + 1j * rng.standard_normal((c, b // 8))).astype(
            np.complex64
        )
    )
    x_rds = device_put_complex(
        (rng.standard_normal((c, b // 64)) + 1j * rng.standard_normal((c, b // 64))).astype(
            np.complex64
        )
    )
    dt = jnp.asarray(rng.uniform(-0.5, 0.5, (c, b // 8)).astype(np.float32))
    x_f32 = jnp.asarray(rng.standard_normal((c, b // 8)).astype(np.float32))

    print(f"channels={c} block={b} device={jax.devices()[0]}", flush=True)

    st = demod_init_state(cfg, c)
    t_full = timeit(
        "full demod_block",
        jax.jit(lambda co, s, xx: demod_block(cfg, co, s, xx)),
        coeffs,
        st,
        x,
    )

    timeit(
        "poly ds x4 (c64)",
        jax.jit(lambda tp, s, xx: polyphase_decimate(tp, s, xx, r.ds_fm_in)),
        coeffs.taps_fm_in,
        st["ds_fm_in"],
        x,
    )
    x_fm_in = jax.jit(lambda tp, s, xx: polyphase_decimate(tp, s, xx, r.ds_fm_in))(
        coeffs.taps_fm_in, st["ds_fm_in"], x
    )[1]
    timeit(
        "discriminator",
        jax.jit(lambda p, xx: fm_discriminate(p, xx, 75e3, float(r.fs_fm_in))),
        st["disc_prev_theta"],
        x_fm_in,
    )
    timeit(
        "hilbert 65-tap",
        jax.jit(lambda tp, s, xx: hilbert_fir(tp, s, xx)),
        coeffs.taps_hilbert,
        st["hilbert"],
        x_f32,
    )
    timeit(
        "iir peak (assoc scan)",
        jax.jit(lambda bb, aa, s, xx: iir_filter_complex(bb, aa, s, xx)),
        coeffs.peak_b,
        coeffs.peak_a,
        init_on_device(iir_init_state, 2 * c, 2),
        x_fm_out,
    )
    timeit("agc", jax.jit(lambda g, xx: agc_process(g, xx)), agc_init_state(c), x_fm_out)
    t_pll = timeit(
        "pilot PLL scan (B/8 steps)",
        jax.jit(lambda pp, s, xx: pilot_pll_scan(pp, s, xx)),
        coeffs.pll,
        init_on_device(pilot_pll_init_state, c),
        x_fm_out,
    )
    timeit(
        "harmonic mixer",
        jax.jit(lambda d, xx: apply_harmonic_pll(d, xx, 2.0, 0.1)),
        dt,
        x_fm_out,
    )
    timeit(
        "poly ds x4 audio (c64)",
        jax.jit(lambda tp, s, xx: polyphase_decimate(tp, s, xx, r.ds_audio)),
        coeffs.taps_audio_lpr,
        st["ds_audio_lpr"],
        x_fm_out,
    )
    t_bpsk = timeit(
        "BPSK sync scan (B/64 steps)",
        jax.jit(lambda bp, s, xx: bpsk_sync_scan(bp, s, xx)),
        coeffs.bpsk,
        init_on_device(bpsk_init_state, c),
        x_rds,
    )

    samples = c * b
    print(f"\nfull block: {samples / t_full / 1e6:.2f} Msamples/s aggregate")
    print(f"scan share: PLL {t_pll / t_full * 100:.0f}%  BPSK {t_bpsk / t_full * 100:.0f}%")


if __name__ == "__main__":
    main()
