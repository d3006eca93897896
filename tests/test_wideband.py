"""Wideband channelize->demod composition (models/wideband.py) and the
batched-capture filterbank (channelize_batch_p / the batched Pallas grid).

Round-5 verdict item 1: the stations-from-wideband path gets a jittable
device-resident step (bench.py FMTPU_BENCH_WIDEBAND measures it on-chip);
these tests pin its correctness on CPU — batch==single exactness, the
batched Pallas grid's per-capture tail re-seed, and the i8 bridge's
end-to-end accuracy."""

import jax.numpy as jnp
import numpy as np
import pytest

from fm_radio_tpu.parallel.channelizer import (
    _channelize_xla_p,
    channelize_batch_p,
    make_channelizer_taps,
)
from fm_radio_tpu.utils.transfer import pack_iq_u8


def _rand_planes(rng, shape):
    return (rng.standard_normal(shape).astype(np.float32) * 50.0,
            rng.standard_normal(shape).astype(np.float32) * 50.0)


def test_channelize_batch_matches_single():
    """Batched captures == per-capture loop, exactly, across streamed
    blocks (tail carry per capture)."""
    m, k, w, t = 8, 4, 3, 1024
    taps = jnp.asarray(make_channelizer_taps(m, k))
    rng = np.random.default_rng(0)
    xr, xi = _rand_planes(rng, (w, 2 * t))

    st_b = (jnp.zeros((w, (k - 1) * m)), jnp.zeros((w, (k - 1) * m)))
    outs_b = []
    for blk in range(2):
        sl = slice(blk * t, (blk + 1) * t)
        st_b, y = channelize_batch_p(
            taps, st_b, (jnp.asarray(xr[:, sl]), jnp.asarray(xi[:, sl])), m)
        outs_b.append(np.stack([np.asarray(y[0]), np.asarray(y[1])]))

    for wi in range(w):
        st = (jnp.zeros(((k - 1) * m,)), jnp.zeros(((k - 1) * m,)))
        for blk in range(2):
            sl = slice(blk * t, (blk + 1) * t)
            st, y = _channelize_xla_p(
                taps, st, (jnp.asarray(xr[wi, sl]), jnp.asarray(xi[wi, sl])), m)
            np.testing.assert_array_equal(
                outs_b[blk][0, wi], np.asarray(y[0]))
            np.testing.assert_array_equal(
                outs_b[blk][1, wi], np.asarray(y[1]))


@pytest.mark.slow
@pytest.mark.parametrize("packed", [False, True])
def test_channelizer_pallas_batched_matches_xla(packed):
    """Batched Pallas grid (grid=(W, time tiles), tail scratch re-seeded at
    ti==0 per capture) vs the vmapped XLA oracle, over two streamed blocks
    so the [W] tail handoff is exercised."""
    from fm_radio_tpu.kernels.channelizer_pallas import channelize_pallas

    m, k, w = 8, 4, 3
    t = 2048 * m  # n_frames = 2048 per block: the flat kernel's m=8 minimum
    taps = jnp.asarray(make_channelizer_taps(m, k))
    rng = np.random.default_rng(1)
    if packed:
        u8 = rng.integers(0, 256, (w, 2 * t, 2)).astype(np.uint8)
        xs = jnp.asarray(pack_iq_u8(u8))
        blocks = [xs[:, :t], xs[:, t:]]
    else:
        xr, xi = _rand_planes(rng, (w, 2 * t))
        blocks = [(jnp.asarray(xr[:, :t]), jnp.asarray(xi[:, :t])),
                  (jnp.asarray(xr[:, t:]), jnp.asarray(xi[:, t:]))]

    z = jnp.zeros((w, (k - 1) * m))
    st_a = st_b = (z, z)
    for xb in blocks:
        st_a, ya = channelize_pallas(taps, st_a, xb, m, interpret=True)
        st_b, yb = channelize_batch_p(taps, st_b, xb, m)  # CPU: vmap XLA
        np.testing.assert_allclose(np.asarray(ya[0]), np.asarray(yb[0]),
                                   atol=2e-2)
        np.testing.assert_allclose(np.asarray(ya[1]), np.asarray(yb[1]),
                                   atol=2e-2)
        np.testing.assert_allclose(np.asarray(st_a[0]), np.asarray(st_b[0]),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(st_a[1]), np.asarray(st_b[1]),
                                   atol=1e-5)


def test_channelizer_pallas_frame_packed_matches_xla():
    """Flat-128 kernel at m=32 (4 frames per lane row: rotation-based phase
    filter + block-diag DFT + interleaved channel-major output) vs the
    vmapped XLA oracle, two streamed blocks."""
    from fm_radio_tpu.kernels.channelizer_pallas import channelize_pallas

    m, k, w = 32, 8, 4
    t = 512 * m  # 512 frames/block: the flat kernel's m=32 minimum tile
    taps = jnp.asarray(make_channelizer_taps(m, k))
    rng = np.random.default_rng(5)
    u8 = rng.integers(0, 256, (w, 2 * t, 2)).astype(np.uint8)
    xs = jnp.asarray(pack_iq_u8(u8))
    z = jnp.zeros((w, (k - 1) * m))
    st_a = st_b = (z, z)
    for xb in (xs[:, :t], xs[:, t:]):
        st_a, ya = channelize_pallas(taps, st_a, xb, m, interpret=True)
        st_b, yb = channelize_batch_p(taps, st_b, xb, m)
        np.testing.assert_allclose(np.asarray(ya[0]), np.asarray(yb[0]),
                                   atol=5e-2)
        np.testing.assert_allclose(np.asarray(ya[1]), np.asarray(yb[1]),
                                   atol=5e-2)
        np.testing.assert_allclose(np.asarray(st_a[0]), np.asarray(st_b[0]),
                                   atol=1e-5)


def test_channelizer_pallas_i8_out_matches_xla_bridge():
    """In-kernel i8 bridge (1/m descale folded into the DFT matrices,
    round/-1/clip in VMEM) vs the XLA-fallback quantizer: within 1 LSB
    everywhere (bf16-split rounding may flip exact .5 boundaries)."""
    from fm_radio_tpu.kernels.channelizer_pallas import channelize_pallas

    m, k, w = 32, 8, 4
    t = 512 * m
    taps = jnp.asarray(make_channelizer_taps(m, k))
    rng = np.random.default_rng(6)
    u8 = rng.integers(0, 256, (w, t, 2)).astype(np.uint8)
    xs = jnp.asarray(pack_iq_u8(u8))
    z = jnp.zeros((w, (k - 1) * m))
    _, ya = channelize_pallas(taps, (z, z), xs, m, interpret=True, out="i8")
    _, yb = channelize_batch_p(taps, (z, z), xs, m, out="i8")
    assert ya.dtype == jnp.int8 and ya.shape == (2, w, m, t // m)
    d = np.abs(np.asarray(ya).astype(np.int32) -
               np.asarray(yb).astype(np.int32))
    assert d.max() <= 1
    assert (d > 0).mean() < 0.02  # only rounding-boundary disagreements


def _station_wideband(m: int, n_ch: int, channel: int):
    from fm_radio_tpu.io.synth import FMModulator, ModulatorConfig, make_wideband

    mod = FMModulator(ModulatorConfig())
    groups = [(0xBEEF, (0 << 12) | (1 << 10), 0xE101, 0x5A5A)]
    iq = mod.generate(n_ch, left_hz=800.0, right_hz=1600.0, rds_groups=groups)
    wide = make_wideband({channel: iq}, m)
    wide *= 100.0 / np.abs(wide).max()
    # the capture's native u8 quantization (app.cpp:57-63)
    u8 = np.stack([np.round(wide.real + 127.0),
                   np.round(wide.imag + 127.0)], axis=-1)
    return np.clip(u8, 0, 255).astype(np.uint8)


def test_wideband_demod_block_bridges():
    """End-to-end: one real station in an m=8 grid through
    wideband_demod_block; the i8 bridge (production: re-quantize channel
    planes to the u8 grid for the int8-direct demod) must cost ~nothing vs
    the exact f32 bridge — the capture was ALREADY u8-quantized, so the
    bridge adds a second quantization at the same grid."""
    from fm_radio_tpu.config import DemodConfig
    from fm_radio_tpu.models.demod import make_coeffs
    from fm_radio_tpu.models.wideband import (
        wideband_demod_block,
        wideband_init_state,
    )

    m, channel = 8, 2
    b = 1 << 15  # per-channel block
    u8 = _station_wideband(m, b, channel)
    w_words = jnp.asarray(pack_iq_u8(u8))[None]  # W=1 capture

    outs = {}
    for bridge in ("f32", "i8"):
        cfg = DemodConfig(frontend_int8=(bridge == "i8"),
                          assume_integer_input=(bridge == "i8"))
        coeffs = make_coeffs(cfg)
        st = wideband_init_state(cfg, m, n_captures=1)
        st, o = wideband_demod_block(cfg, coeffs, None, st, w_words, m,
                                     bridge=bridge)
        outs[bridge] = np.asarray(o["audio"])

    # settle: skip the first quarter (filter fills + PLL acquisition)
    n = outs["f32"].shape[1]
    a, bq = outs["f32"][channel, n // 4:], outs["i8"][channel, n // 4:]
    err = a - bq
    snr = 10.0 * np.log10(float((a**2).sum()) / max(float((err**2).sum()),
                                                    1e-30))
    assert snr > 35.0, f"i8 bridge costs too much: {snr:.1f} dB"
    # and the audio itself is a real stereo signal (tones recovered)
    rms = float(np.sqrt((bq**2).mean()))
    assert rms > 1e-3


@pytest.mark.slow
def test_wideband_short_prototype_rejected():
    """Measured rejection record (round 5): taps_per_phase=8 (the fused
    kernel's cheap-prototype lens, ~40% fewer M_c dots at m=32) leaks an
    OCCUPIED adjacent channel badly — 8.4 dB audio agreement vs the K=16
    prototype (K=12: 11.9 dB).  K=16 stays the quality default; the
    FMTPU_BENCH_WB_K lens exists only for the perf curve.  This test pins
    the finding so the lever is not re-derived: the short prototype must
    measurably DIVERGE (if it ever stops diverging, the lens is safe to
    adopt — re-measure)."""
    from fm_radio_tpu.config import DemodConfig
    from fm_radio_tpu.io.synth import FMModulator, ModulatorConfig, make_wideband
    from fm_radio_tpu.models.demod import make_coeffs
    from fm_radio_tpu.models.wideband import (
        wideband_demod_block,
        wideband_init_state,
    )
    from fm_radio_tpu.parallel.channelizer import make_channelizer_taps

    m, b = 8, 1 << 15
    mod = FMModulator(ModulatorConfig())
    iq2 = mod.generate(b, left_hz=800.0, right_hz=1600.0,
                   rds_groups=[(0xBEEF, 1 << 10, 0xE101, 0x5A5A)])
    mod2 = FMModulator(ModulatorConfig())
    iq3 = mod2.generate(b, left_hz=500.0, right_hz=2500.0,
                    rds_groups=[(0xCAFE, 1 << 10, 0xE101, 0x1234)])
    wide = make_wideband({2: iq2, 3: iq3}, m)
    wide *= 110.0 / np.abs(wide).max()
    u8 = np.clip(np.stack([np.round(wide.real + 127.0),
                           np.round(wide.imag + 127.0)], axis=-1),
                 0, 255).astype(np.uint8)
    w_words = jnp.asarray(pack_iq_u8(u8))[None]

    cfg = DemodConfig(frontend_int8=True, assume_integer_input=True)
    coeffs = make_coeffs(cfg)
    audio = {}
    for kk in (16, 8):
        taps = make_channelizer_taps(m, kk)
        st = wideband_init_state(cfg, m, 1, taps_per_phase=kk)
        st, o = wideband_demod_block(cfg, coeffs, taps, st, w_words, m,
                                     bridge="i8")
        audio[kk] = np.asarray(o["audio"])[2]

    n = audio[16].shape[0]
    a16, a8 = audio[16][n // 4 :], audio[8][n // 4 :]
    err = a16 - a8
    snr = 10.0 * np.log10(float((a16**2).sum())
                          / max(float((err**2).sum()), 1e-30))
    # the K16 path itself must carry a real signal...
    assert float(np.sqrt((a16**2).mean())) > 1e-3
    # ...and K=8 must still show the measured divergence that rejected it
    assert snr < 18.0, (
        f"K=8 now agrees at {snr:.1f} dB — the cheap-prototype lens may "
        "have become safe; re-measure before adopting")


def test_wideband_demod_block_default_taps():
    """ch_taps=None uses make_channelizer_taps; W=2 captures fill C=2M
    demod channels and the station lands on the right global row."""
    from fm_radio_tpu.config import DemodConfig
    from fm_radio_tpu.models.demod import make_coeffs
    from fm_radio_tpu.models.wideband import (
        wideband_demod_block,
        wideband_init_state,
    )

    m, channel = 8, 1
    b = 1 << 13
    u8 = _station_wideband(m, b, channel)
    w1 = pack_iq_u8(u8)
    # capture 0: silence; capture 1: the station
    w_words = jnp.asarray(np.stack([np.full_like(w1, 127.0 * 256 + 127.0),
                                    w1]))
    cfg = DemodConfig(frontend_int8=True, assume_integer_input=True)
    coeffs = make_coeffs(cfg)
    st = wideband_init_state(cfg, m, n_captures=2)
    st, o = wideband_demod_block(cfg, coeffs, None, st, w_words, m,
                                 bridge="i8")
    audio = np.asarray(o["audio"])
    assert audio.shape[0] == 2 * m
    row = m + channel  # capture 1, channel 1
    tail = audio[:, audio.shape[1] // 2:]
    rms = np.sqrt((tail**2).mean(axis=(1, 2)))
    assert rms[row] > 5 * rms[:m].max() + 1e-9


def test_channelizer_i8ps_matches_i8_planes():
    """Phase-split i8 output (out='i8ps', m=32): plane p must equal the
    flat i8 output's every-4th-sample slice, exactly."""
    from fm_radio_tpu.kernels.channelizer_pallas import channelize_pallas

    m, k, w = 32, 16, 2
    t = 512 * m
    taps = make_channelizer_taps(m, k)
    rng = np.random.default_rng(7)
    u8 = rng.integers(0, 256, (w, t, 2)).astype(np.uint8)
    xs = jnp.asarray(pack_iq_u8(u8))
    z = jnp.zeros((w, (k - 1) * m))
    _, y8 = channelize_pallas(taps, (z, z), xs, m, interpret=True, out="i8")
    _, yps = channelize_pallas(taps, (z, z), xs, m, interpret=True,
                               out="i8ps")
    flat = np.asarray(y8).reshape(2, w * m, -1)
    ps = np.asarray(yps)
    assert ps.shape == (2, 4, w * m, t // m // 4)
    for p in range(4):
        np.testing.assert_array_equal(ps[:, p], flat[:, :, p::4])


def test_wideband_m32_i8ps_bridge_e2e():
    """The m=32 phase-split bridge end-to-end on CPU (XLA fallbacks): a
    station still demodulates and the bridge path selects i8ps."""
    from fm_radio_tpu.config import DemodConfig
    from fm_radio_tpu.models.demod import make_coeffs
    from fm_radio_tpu.models.wideband import (
        wideband_demod_block,
        wideband_init_state,
    )

    m, channel, b = 32, 3, 1 << 13
    u8 = _station_wideband(m, b, channel)
    w_words = jnp.asarray(pack_iq_u8(u8))[None]
    cfg = DemodConfig(frontend_int8=True, assume_integer_input=True)
    coeffs = make_coeffs(cfg)
    st = wideband_init_state(cfg, m, 1)
    st, o = wideband_demod_block(cfg, coeffs, None, st, w_words, m,
                                 bridge="i8")
    audio = np.asarray(o["audio"])
    tail = audio[channel, audio.shape[1] // 2 :]
    assert np.isfinite(tail).all()
    assert float(np.sqrt((tail**2).mean())) > 1e-3


def test_channelizer_int8_matrices_close_to_exact():
    """splits=1 (1-plane int8 fused matrices, 4-group int8 dots — the 2x
    MXU lens): within a couple of output LSBs of the near-exact splits=3
    path (matrix rel error ~2^-8, the same class as splits=2)."""
    from fm_radio_tpu.kernels.channelizer_pallas import channelize_pallas

    m, k, w = 32, 16, 2
    t = 512 * m
    taps = make_channelizer_taps(m, k)
    rng = np.random.default_rng(8)
    u8 = rng.integers(0, 256, (w, t, 2)).astype(np.uint8)
    xs = jnp.asarray(pack_iq_u8(u8))
    z = jnp.zeros((w, (k - 1) * m))
    st3, y3 = channelize_pallas(taps, (z, z), xs, m, interpret=True,
                                out="i8ps", splits=3)
    st1, y1 = channelize_pallas(taps, (z, z), xs, m, interpret=True,
                                out="i8ps", splits=1)
    d = np.abs(np.asarray(y3).astype(np.int32) -
               np.asarray(y1).astype(np.int32))
    assert d.max() <= 3
    assert (d > 1).mean() < 0.02
    # carried tails restore exactly (integers through the i8 ring)
    np.testing.assert_array_equal(np.asarray(st1[0]), np.asarray(st3[0]))
    np.testing.assert_array_equal(np.asarray(st1[1]), np.asarray(st3[1]))
