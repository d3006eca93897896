"""Serving soak gate (tools/soak.py) smoke: 3 windows of the wideband ->
channelizer -> batched-demod -> drain loop on CPU must pass every stability
gate (throughput, bounded RSS, per-station RDS continuity, finite audio).
Also pins the App.drain bounded-memory contract."""

import pytest
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_soak_three_windows():
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env.update({"PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu"})
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "soak.py"),
         "--passes", "3", "--stations", "2", "--channels", "4",
         "--seconds", "0.5", "--block-size", "16384",
         # at 3 passes the throughput gate compares just two settled
         # windows; a CI box's scheduling jitter on ~0.4 s windows is easily
         # 2x, so gate only against gross degradation here (real soaks use
         # the 0.6 default over many longer windows)
         "--throughput-floor", "0.25"],
        capture_output=True, text=True, timeout=420, env=env, cwd=REPO,
    )
    assert p.returncode == 0, p.stdout[-2000:] + p.stderr[-2000:]
    lines = [json.loads(l) for l in p.stdout.splitlines() if l.startswith("{")]
    verdict = lines[-1]
    assert verdict["pass"] and verdict["windows"] == 3
    # every window decoded groups on every station
    for rec in lines[:-1]:
        assert all(g > 0 for g in rec["groups"]), rec


def test_app_drain_bounded():
    """drain() empties the accumulation buffers (audio, rds bytes, logs)
    while preserving demod state and the database."""
    from fm_radio_tpu.io.synth import FMModulator, ModulatorConfig
    from fm_radio_tpu.models.app import App

    mod = FMModulator(ModulatorConfig())
    groups = [(0x1234, (0 << 12) | (1 << 10), 0xE101, 0x4142)]
    iq = mod.generate(16384 * 24, left_hz=1000.0, right_hz=3000.0,
                      rds_groups=groups)
    app = App(block_size=16384)
    app.process(iq[None, : 16384 * 12])
    out1 = app.drain()
    assert out1["audio"].shape[1] == 16384 * 12 // 32
    assert not app.audio_blocks and app.audio.shape[1] == 0

    # state carried across the drain: processing continues seamlessly
    app.process(iq[None, 16384 * 12 :])
    out2 = app.drain()
    assert out2["audio"].shape[1] == 16384 * 12 // 32
    assert np.isfinite(out2["audio"]).all()
    # the second half decodes groups from carried sync state, and the
    # database survives draining
    assert len(out2["log_lines"][0]) > 0
    assert app.rds_database(0).pi_code == 0x1234
