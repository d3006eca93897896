"""End-to-end tests: software FM modulator -> full demod chain.

These are the hermetic equivalents of the reference's golden-recording
validation (SURVEY.md §4): assert pilot lock, mono/stereo audio recovery and
SNR, stereo separation, and RDS group round-trip — no off-air recordings
needed.
"""

import numpy as np
import pytest

from fm_radio_tpu.config import DemodConfig
from fm_radio_tpu.io.synth import FMModulator, ModulatorConfig
from fm_radio_tpu.models.app import App

BLOCK = 32768  # smaller than the default 65536 to keep CPU tests quick


def snr_db(sig: np.ndarray, ref: np.ndarray) -> float:
    err = sig - ref
    return 10 * np.log10(np.sum(ref**2) / (np.sum(err**2) + 1e-20))


def tone_power_ratio_db(x: np.ndarray, fs: float, f0: float, bw: float = 100.0):
    """Power near f0 vs total power (for separation checks)."""
    spec = np.abs(np.fft.rfft(x * np.hanning(len(x)))) ** 2
    freqs = np.fft.rfftfreq(len(x), 1 / fs)
    band = (freqs > f0 - bw) & (freqs < f0 + bw)
    return 10 * np.log10(spec[band].sum() / spec.sum())


@pytest.fixture(scope="module")
def stereo_run():
    """One modulate->demodulate run shared by the audio assertions.

    L = 1 kHz, R = 3 kHz tones; RDS carries two alternating groups.
    """
    mod = FMModulator(ModulatorConfig())
    groups = [
        (0x1234, (0 << 12) | (1 << 10) | 0b00000, 0xE101, 0x4142),  # 0A
        (0x1234, (2 << 12) | 0b00000, 0x4845, 0x4C4C),              # 2A
    ]
    n = BLOCK * 16  # 0.5 s
    iq = mod.generate(
        n, left_hz=1000.0, right_hz=3000.0, rds_groups=groups
    )
    app = App(block_size=BLOCK, channels=1)
    app.process(iq)
    return app, groups


def test_pilot_lock_and_audio_recovery(stereo_run):
    app, _ = stereo_run
    audio = app.audio[0]  # [T, 2]
    fs_audio = app.demod.fs_audio
    # skip first 0.15 s (PLL + AGC settle)
    settle = int(0.15 * fs_audio)
    left, right = audio[settle:, 0], audio[settle:, 1]
    # L channel: 1 kHz dominates; R channel: 3 kHz dominates
    assert tone_power_ratio_db(left, fs_audio, 1000.0) > -3.0
    assert tone_power_ratio_db(right, fs_audio, 3000.0) > -3.0


def test_stereo_separation(stereo_run):
    app, _ = stereo_run
    audio = app.audio[0]
    fs_audio = app.demod.fs_audio
    settle = int(0.15 * fs_audio)
    left, right = audio[settle:, 0], audio[settle:, 1]
    # the 3 kHz (right) tone must be strongly suppressed in the left channel
    leak_l = tone_power_ratio_db(left, fs_audio, 3000.0)
    main_r = tone_power_ratio_db(right, fs_audio, 3000.0)
    separation = main_r - leak_l
    assert separation > 20.0, f"stereo separation only {separation:.1f} dB"


def test_audio_snr_vs_ideal(stereo_run):
    """Recovered left tone vs an ideally generated 1 kHz tone: fit amplitude
    and phase, require > 20 dB SNR (config 2 acceptance style)."""
    app, _ = stereo_run
    fs_audio = app.demod.fs_audio
    audio = app.audio[0]
    settle = int(0.2 * fs_audio)
    left = audio[settle:, 0].astype(np.float64)
    t = np.arange(len(left)) / fs_audio
    basis = np.stack([np.sin(2 * np.pi * 1000 * t), np.cos(2 * np.pi * 1000 * t)])
    coefs, *_ = np.linalg.lstsq(basis.T, left, rcond=None)
    fit = basis.T @ coefs
    assert snr_db(left, fit) > 20.0
    # expected amplitude: a_mono/2 (mono path) + a_stereo/2 (L-R path) = 0.45
    # (the x2 audio-mix gain only compensates the discriminator's x0.5)
    amp = np.hypot(*coefs)
    assert 0.3 < amp < 0.6


def test_rds_group_roundtrip(stereo_run):
    app, groups = stereo_run
    decoded = [
        tuple(blk.data for blk in g)
        for g in app.rds_chains[0].chain.groups
        if all(blk.is_valid for blk in g)
    ]
    # ~5.7 groups fit in 0.5 s at 11.4 groups/s minus TED/PLL lock time
    assert len(decoded) >= 2, f"only {len(decoded)} valid groups decoded"
    for g in groups:
        assert g in decoded, f"group {g} not recovered"
    db = app.rds_database(0)
    assert db.pi_code == 0x1234


def test_mono_path():
    """LPR-only output mode recovers the mono sum."""
    from dataclasses import replace

    mod = FMModulator(ModulatorConfig())
    n = BLOCK * 6
    iq = mod.generate(n, left_hz=800.0, right_hz=800.0)
    cfg = replace(DemodConfig(), audio_out="lpr")
    app = App(block_size=BLOCK, cfg=cfg, channels=1, decode_rds=False)
    app.process(iq)
    audio = app.audio[0]
    fs_audio = app.demod.fs_audio
    settle = int(0.1 * fs_audio)
    mono = audio[settle:, 0]
    assert tone_power_ratio_db(mono, fs_audio, 800.0) > -1.0
    # both channels identical in LPR mode
    np.testing.assert_array_equal(audio[:, 0], audio[:, 1])


def test_multichannel_batch_consistency():
    """Two channels fed the same IQ produce identical outputs (vmap-first
    design sanity)."""
    mod = FMModulator(ModulatorConfig())
    iq = mod.generate(BLOCK * 4, left_hz=1000.0, right_hz=2000.0)
    x = np.stack([iq, iq])
    app = App(block_size=BLOCK, channels=2, decode_rds=False)
    app.process(x)
    audio = app.audio
    np.testing.assert_allclose(audio[0], audio[1], atol=1e-5)
