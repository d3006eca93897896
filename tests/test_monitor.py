"""Monitor dashboard tests: pure renderer units + a CLI smoke run.

The monitor is the framework's GUI-parity surface (SURVEY.md §2.8): it must
show live spectra, pilot lock, the BPSK constellation, and the RDS database
from a stream — asserted here on a synthetic station.
"""

import numpy as np

from fm_radio_tpu.apps.monitor import FrameStats, render_frame, scatter, spark


def test_spark_shape_and_ramp():
    line = spark(np.linspace(0.0, 1.0, 500), width=40, ascii_only=True)
    assert len(line) == 40
    # monotone input -> ramp ends hotter than it starts
    ramp = " .:-=+*#%@"
    assert ramp.index(line[-1]) > ramp.index(line[0])


def test_spark_empty_and_flat():
    assert spark(np.array([]), width=10) == " " * 10
    flat = spark(np.ones(64), width=16, ascii_only=True)
    assert len(flat) == 16  # no NaN/div-by-zero on zero span


def test_scatter_plots_points_on_grid():
    rows = scatter(np.array([0.0]), np.array([1.0]), width=21, height=9,
                   lim=1.5)
    assert len(rows) == 9 and all(len(r) == 21 for r in rows)
    # a point at +j lands above the horizontal axis, on the vertical axis
    joined = "\n".join(rows)
    assert "●" in joined
    upper = "\n".join(rows[: 9 // 2])
    assert "●" in upper


def test_render_frame_contains_all_panels():
    s = FrameStats(
        block_index=7,
        total_samples=7 * 65536,
        samples_per_s=2.048e6,
        spectra={"fm_in": np.linspace(0, 90, 128)},
        pll_phase_error_rms=0.01,
        pll_locked=True,
        audio_rms=(0.3, 0.3),
        bpsk_points=(np.array([0.1]), np.array([0.9])),
        symbols_seen=1234,
        groups_seen=5,
        rds={"pi": 0xBEEF, "ps": "FT", "rt": "hello", "pty_name": "Pop M",
             "ct": "12:34 01/02/2026", "flags": "stereo=1"},
        last_group_line="[group] [BEEF ...]",
        stage_ms={"demod": 5.0, "rds": 0.1},
    )
    frame = render_frame(s, width=48, ascii_only=True)
    for needle in ("block 7", "2.05 MS/s", "LOCKED", "BEEF", "'FT'",
                   "hello", "Pop M", "symbols      1234", "demod"):
        assert needle in frame, needle


def test_monitor_cli_smoke(tmp_path):
    """End-to-end: monitor a synthetic station, expect pilot lock + PI."""
    import os
    import subprocess
    import sys

    from fm_radio_tpu.io.pcm import c64_to_u8
    from fm_radio_tpu.io.synth import FMModulator, ModulatorConfig

    block = 16384
    mod = FMModulator(ModulatorConfig())
    groups = [(0xBEEF, 0, 0x0000, 0x4654)]
    iq = mod.generate(block * 24, left_hz=1000.0, right_hz=400.0,
                      rds_groups=groups)
    path = tmp_path / "mon.pcm"
    c64_to_u8(iq).tofile(path)

    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1",
               PALLAS_AXON_POOL_IPS="")
    out = subprocess.run(
        [sys.executable, "-m", "fm_radio_tpu.apps.cli", "monitor",
         "-i", str(path), "-b", str(block), "--refresh", "8",
         "--frames", "3", "--no-ansi"],
        capture_output=True, env=env, timeout=600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr.decode()
    text = out.stdout.decode()
    assert "pilot PLL: LOCKED" in text
    assert "PI           BEEF" in text
    assert "station: 'FT'" in text
    assert "stages/frame:" in text
