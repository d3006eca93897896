"""Benchmark: aggregate IQ throughput of the FULL stereo+RDS demod chain.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Method: C channels x B-sample blocks of synthetic wideband-FM IQ (device-
resident, plane form), demodulated by the jitted multi-block scan in ONE
device dispatch (the tunneled backend has a large variable per-dispatch
latency, so the steady-state streaming rate is what a block scan measures).
State carries across blocks exactly as in production streaming.  The metric
is aggregate IQ megasamples/s/chip.  vs_baseline is the multiple of the
reference's real-time design point of 1.024 MS/s per station (the only
quantitative requirement it documents — BASELINE.md; the reference publishes
no throughput numbers).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fm_radio_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from fm_radio_tpu.config import DemodConfig
    from fm_radio_tpu.models.demod import demod_block, demod_init_state, make_coeffs

    # u8-faithful input (the radio's native format is 8-bit IQ): declare it
    # so the front-end kernel uses the exact integer bf16 fast path.
    # optional second arg: block-parallel PLL chunk count (A/B lens on the
    # opt-in approximate PLL, kernels/pll_pallas.py::_pilot_pll_chunked)
    pll_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    cpu_fallback = os.environ.get("FMTPU_BENCH_CPU") == "1"
    if cpu_fallback:
        # degraded-environment path (TPU tunnel unreachable): still emit a
        # valid measurement, honestly labeled, at a CPU-feasible scale
        jax.config.update("jax_platforms", "cpu")
    cfg = DemodConfig(assume_integer_input=True, pll_time_chunks=pll_chunks)
    coeffs = make_coeffs(cfg)

    channels = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    if cpu_fallback:
        channels = min(channels, 8)
    # constant ~256M samples per scan step: big-C configs shrink the block so
    # input + per-block intermediates stay inside HBM
    block = min(1 << 20, (1 << 28) // channels)
    n_blocks = 8
    if cpu_fallback:
        block, n_blocks = 1 << 16, 2

    rng = np.random.default_rng(0)
    # FM-like signal: constant envelope, random phase walk (cheap to make)
    phase = np.cumsum(
        rng.standard_normal((channels, block)).astype(np.float32) * 0.5, axis=-1
    )
    # quantized to the u8 grid exactly as the radio captures it
    # (app.cpp:57-63), then PACKED one f32 word per complex sample
    # (w = I*256 + Q, utils/transfer.pack_iq_u8): the production ingest
    # format — half the host->device and HBM bytes of (re, im) planes,
    # unpacked exactly inside the front-end kernel.
    iq_u8 = np.stack(
        [
            np.round(100.0 * np.cos(phase) + 127.0),
            np.round(100.0 * np.sin(phase) + 127.0),
        ],
        axis=-1,
    ).astype(np.uint8)
    from fm_radio_tpu.utils.transfer import pack_iq_u8

    x = jnp.asarray(pack_iq_u8(iq_u8))  # [C, B] packed words, f32

    @jax.jit
    def run(state, x):
        def step(st, _):
            st, outs = demod_block(cfg, coeffs, st, x)
            return st, (
                jnp.sum(outs["audio"]),
                jnp.sum(outs["rds_pred"]),
                jnp.sum(outs["rds_valid"].astype(jnp.float32)),
            )

        state, probes = jax.lax.scan(step, state, None, length=n_blocks)
        # a scalar that depends on every output: fetching it forces true
        # completion (block_until_ready alone is unreliable over the tunnel)
        return state, sum(jnp.sum(p) for p in probes)

    state = demod_init_state(cfg, channels)
    # compile + warm up
    _, probe = run(state, x)
    float(np.asarray(probe))

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _, probe = run(state, x)
        float(np.asarray(probe))
        best = min(best, time.perf_counter() - t0)

    total_samples = channels * block * n_blocks
    msps = total_samples / best / 1e6
    baseline_msps = 1.024  # reference real-time design point per station
    metric = "full-chain IQ demod throughput (stereo+RDS), aggregate per chip"
    if cpu_fallback:
        metric += " [DEGRADED: TPU tunnel unreachable, CPU-backend fallback]"
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(msps, 3),
                "unit": "Msamples/s",
                "vs_baseline": round(msps / baseline_msps, 2),
            }
        )
    )


def _supervise() -> None:
    """Run the measurement in a child with a watchdog.

    The tunneled TPU backend can hang indefinitely mid-transfer when the
    tunnel drops; a hung bench would leave the round with no record at all.
    Parent tries the real chip twice (generous timeout: first compile is
    slow), then falls back to a labeled CPU measurement so ONE JSON line is
    always produced.
    """
    argv = [sys.executable, os.path.abspath(__file__), *sys.argv[1:]]
    env = {**os.environ, "FMTPU_BENCH_CHILD": "1"}

    def attempt(extra_env: dict, timeout: float) -> str | None:
        try:
            p = subprocess.run(
                argv, env={**env, **extra_env}, timeout=timeout,
                capture_output=True, text=True,
            )
        except subprocess.TimeoutExpired:
            return None
        for line in reversed((p.stdout or "").strip().splitlines()):
            if line.startswith("{"):
                return line
        sys.stderr.write(p.stderr[-2000:] if p.stderr else "")
        return None

    for timeout in (1800.0, 900.0):
        line = attempt({}, timeout)
        if line:
            print(line)
            return
    line = attempt({"FMTPU_BENCH_CPU": "1", "JAX_PLATFORMS": "cpu"}, 1800.0)
    if line:
        print(line)
        return
    print(json.dumps({
        "metric": "full-chain IQ demod throughput (bench could not run: "
                  "TPU tunnel down and CPU fallback failed)",
        "value": 0.0, "unit": "Msamples/s", "vs_baseline": 0.0,
    }))


if __name__ == "__main__":
    if os.environ.get("FMTPU_BENCH_CHILD") == "1":
        main()
    else:
        _supervise()
