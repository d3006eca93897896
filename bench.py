"""Benchmark: aggregate IQ throughput of the FULL stereo+RDS demod chain.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Method: C channels x B-sample blocks of synthetic wideband-FM IQ, demodulated
by the jitted multi-block scan (one device call, steady state).  The metric is
aggregate IQ megasamples/s/chip.  vs_baseline is the multiple of the
reference's real-time design point of 1.024 MS/s per station (the only
quantitative requirement it documents — BASELINE.md; the reference publishes
no throughput numbers).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fm_radio_tpu.config import DemodConfig
    from fm_radio_tpu.models.demod import demod_block, demod_init_state, make_coeffs

    cfg = DemodConfig()
    coeffs = make_coeffs(cfg)

    channels = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    block = 65536
    n_blocks = 8

    from fm_radio_tpu.utils.transfer import device_put_complex

    rng = np.random.default_rng(0)
    # FM-like signal: constant envelope, random phase walk (cheap to make)
    phase = np.cumsum(rng.standard_normal((channels, block * n_blocks)) * 0.5, axis=-1)
    x = (100.0 * np.exp(1j * phase)).astype(np.complex64)
    xb = device_put_complex(x.reshape(channels, n_blocks, block).transpose(1, 0, 2))

    @jax.jit
    def run(state, xb):
        def step(st, blk):
            st, outs = demod_block(cfg, coeffs, st, blk)
            return st, (outs["audio"], outs["rds_pred"], outs["rds_valid"])

        state, outs = jax.lax.scan(step, state, xb)
        # a scalar that depends on every output: fetching it forces true
        # completion (block_until_ready alone is unreliable over the tunnel)
        probe = (
            jnp.sum(outs[0])
            + jnp.sum(outs[1])
            + jnp.sum(outs[2].astype(jnp.float32))
        )
        return state, outs, probe

    state = demod_init_state(cfg, channels)
    # compile + warm up
    _, _, probe = run(state, xb)
    float(np.asarray(probe))

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _, _, probe = run(state, xb)
        float(np.asarray(probe))
        best = min(best, time.perf_counter() - t0)

    total_samples = channels * block * n_blocks
    msps = total_samples / best / 1e6
    baseline_msps = 1.024  # reference real-time design point per station
    print(
        json.dumps(
            {
                "metric": "full-chain IQ demod throughput (stereo+RDS), aggregate per chip",
                "value": round(msps, 3),
                "unit": "Msamples/s",
                "vs_baseline": round(msps / baseline_msps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
