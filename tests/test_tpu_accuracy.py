"""Hardware-only accuracy gates (skipped on the CPU CI backend).

These exist because of a bug class CPU tests CANNOT catch: on TPU the
default matmul/einsum precision is bf16, while on CPU it is f32.  The pilot
peak filter's pole-power prep (`ops/iir._power_stack`) ran at default
precision and silently detuned the 19 kHz resonator (~4 Hz bandwidth) by
~0.1 Hz on TPU only — costing ~50 dB of golden audio SNR on the production
kernel path while every CPU test stayed green.  Run with:

    FMTPU_TPU_TESTS=1 PYTHONPATH=/root/repo:/root/.axon_site \\
        python -m pytest tests/test_tpu_accuracy.py -q
"""

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="requires the TPU backend"
)


def test_power_stack_f64_parity():
    """Pole powers of the pilot peak resonator must match f64 to f32 grade
    on device (catches default-precision matmuls in coefficient prep)."""
    import jax.numpy as jnp

    from fm_radio_tpu.config import DemodConfig
    from fm_radio_tpu.models.demod import make_coeffs
    from fm_radio_tpu.ops.iir import _companion, _power_stack

    co = make_coeffs(DemodConfig())
    amat = _companion(jnp.asarray(co.peak_a))
    stack = np.asarray(jax.jit(lambda a: _power_stack(a, 128))(amat))

    a64 = np.asarray(amat, np.float64)
    p = np.eye(2)
    for j in range(129):
        err = np.abs(stack[j] - p).max()
        assert err < 1e-5, f"A^{j} err {err:.2e} (default-precision matmul?)"
        p = p @ a64


def test_midend_theta_matches_ops_path():
    """The fused mid-end kernel's pilot phase must track the XLA ops path to
    ~1e-5 cycles on hardware (was 1.2e-2 with the default-precision bug)."""
    import jax.numpy as jnp

    from fm_radio_tpu.config import DemodConfig
    from fm_radio_tpu.kernels.midend_pallas import midend_pallas
    from fm_radio_tpu.models.demod import demod_init_state, make_coeffs
    from fm_radio_tpu.ops.fir import hilbert_fir_p, polyphase_decimate
    from fm_radio_tpu.ops.iir import iir_filter_planes

    cfg = DemodConfig()
    co = make_coeffs(cfg)
    n = 32768
    t = np.arange(n) / 256000.0
    rng = np.random.default_rng(0)
    x = (0.2 * np.cos(2 * np.pi * 19000.0 * t)
         + 0.5 * np.cos(2 * np.pi * 1000.0 * t)
         + 0.01 * rng.standard_normal(n)).astype(np.float32)[None, :]
    st = demod_init_state(cfg, 1)

    @jax.jit
    def run(st, x):
        s = dict(st)
        _, _, th_k = midend_pallas(co, cfg, s, x)
        s1, fm_out = polyphase_decimate(co.taps_fm_out, s["ds_fm_out"], x, 2)
        s2, iq_o = hilbert_fir_p(co.taps_hilbert, s["hilbert"], fm_out)
        s3, pil_o = iir_filter_planes(co.peak_b, co.peak_a, s["peak_pilot"], iq_o)
        th_o = jnp.arctan2(pil_o[1], pil_o[0]) / (2 * np.pi)
        return th_k, th_o

    th_k, th_o = run(st, jnp.asarray(x))
    d = np.asarray(th_k) - np.asarray(th_o)
    d -= np.round(d)
    rms = float(np.sqrt((d[:, 1024:] ** 2).mean()))
    assert rms < 1e-5, f"theta rms {rms:.2e} cycles vs ops path"


def test_channelizer_kernel_matches_oracle_on_hardware():
    """The fused packed-ingest channelizer kernel vs the scipy direct-
    downconversion oracle, ON DEVICE (kernels/channelizer_pallas.py runs
    only on the TPU backend; CPU CI exercises the XLA fallback)."""
    import jax.numpy as jnp
    import scipy.signal as sig

    from fm_radio_tpu.parallel.channelizer import (
        channelize_packed,
        channelizer_init_state,
        make_channelizer_taps,
    )
    from fm_radio_tpu.utils.transfer import pack_iq_u8

    m, k = 8, 16
    n = 4096 * m
    rng = np.random.default_rng(11)
    iq_u8 = rng.integers(0, 256, size=(n, 2), dtype=np.uint8)
    w = jnp.asarray(pack_iq_u8(iq_u8))
    taps = make_channelizer_taps(m, k)
    st = channelizer_init_state(m, k)
    from fm_radio_tpu.utils.transfer import fetch

    _, y = channelize_packed(taps, st, w, m)
    y = fetch(y)  # complex64 cannot cross the axon tunnel; fetch splits planes

    f = iq_u8.astype(np.float64) - 127.0
    x = f[:, 0] + 1j * f[:, 1]
    x_pad = np.concatenate([np.zeros((k - 1) * m), x])
    for ch in range(m):
        mixed = x_pad * np.exp(-2j * np.pi * ch * np.arange(len(x_pad)) / m)
        filt = sig.lfilter(taps.astype(np.float64), [1.0], mixed)
        ref = filt[m * np.arange(y.shape[1]) + m * k - 1]
        err = np.abs(y[ch] - ref).max()
        assert err < 2e-2, f"channel {ch}: max err {err:.2e}"


def test_i8_direct_front_end_matches_packed_on_hardware():
    """int8-DIRECT front end (i8 planes + frontend_int8, round-3 production
    fast path) vs the packed-word int8 scratch path, both on REAL Mosaic.
    int32 dot accumulation is exact integer arithmetic and the dequant /
    discriminator op order is identical, so the audio must be BIT-exact —
    any difference is a Mosaic miscompile of the direct kernel's
    input-ref-windowed int8 dots."""
    import dataclasses

    import jax.numpy as jnp

    from fm_radio_tpu.config import DemodConfig
    from fm_radio_tpu.models.demod import (
        demod_block,
        demod_init_state,
        make_coeffs,
    )
    from fm_radio_tpu.utils.transfer import fetch, pack_iq_u8, split_iq_i8

    c, n = 128, 1 << 18
    rng = np.random.default_rng(3)
    iq_u8 = rng.integers(0, 256, size=(c, n, 2), dtype=np.uint8)

    cfg = DemodConfig(frontend_int8=True)
    co = make_coeffs(cfg)
    outs = {}
    for name, x in (
        ("packed", jnp.asarray(pack_iq_u8(iq_u8))),
        ("i8direct", jnp.asarray(split_iq_i8(iq_u8))),
    ):
        st = demod_init_state(cfg, c)
        _, o = demod_block(cfg, co, st, x)
        outs[name] = fetch(o["audio"])
    np.testing.assert_array_equal(outs["packed"], outs["i8direct"])


def test_kernel_path_matches_scan_path_on_hardware():
    """Full demod_block: production Mosaic kernel path vs the lax.scan
    reference path, both ON DEVICE — catches Mosaic-only miscompiles that
    interpret-mode CPU parity (test_kernels) cannot see."""
    import dataclasses

    import jax.numpy as jnp

    from fm_radio_tpu.config import DemodConfig
    from fm_radio_tpu.models.demod import (
        demod_block,
        demod_init_state,
        make_coeffs,
    )
    from fm_radio_tpu.utils.transfer import device_put_complex, fetch

    # n MUST leave audio frames beyond the settle skip below: n/32 audio
    # frames vs 2048 skipped.  The round-2 gate ran with n=65536 = exactly
    # 2048 frames -> empty measurement slice -> NaN SNR -> "failure".
    c, n = 128, 1 << 18
    rng = np.random.default_rng(0)
    ph = np.cumsum(0.5 * rng.standard_normal((c, n)).astype(np.float32), -1)
    x = np.round(100 * np.cos(ph)) + 1j * np.round(100 * np.sin(ph))
    xd = device_put_complex(x.astype(np.complex64))

    outs = {}
    for name, impl in (("kernel", "pallas"), ("scan", "scan")):
        cfg = dataclasses.replace(
            DemodConfig(assume_integer_input=True), loop_impl=impl
        )
        co = make_coeffs(cfg)
        st = demod_init_state(cfg, c)
        _, o = demod_block(cfg, co, st, xd)
        outs[name] = fetch(o["audio"])

    err = np.abs(outs["kernel"] - outs["scan"])
    # settle region: skip the first 2048 audio frames of loop acquisition
    assert err.shape[1] > 2048, "fixture too short: settle skip leaves nothing"
    rms = float(np.sqrt((err[:, 2048:] ** 2).mean()))
    sig_rms = float(np.sqrt((outs["scan"][:, 2048:] ** 2).mean()))
    snr = 20 * np.log10(sig_rms / (rms + 1e-12))
    assert snr > 45.0, f"kernel vs scan path only {snr:.1f} dB on hardware"


def test_wideband_i8_bridge_golden_on_hardware():
    """Round-5 wideband gate: a real stereo+RDS station through the FULL
    device-resident wideband path (fused M_c channelizer, in-kernel i8
    bridge, int8-direct demod) at the production m=32 grid, at BOTH bf16
    split settings.  Gates: the station's tones recover, PI decodes, and
    the splits=2 lens (single-bf16 fused matrices — the bench default
    candidate: its tap+twiddle quantization sits below the u8 capture
    floor) agrees with splits=3 to within a few dB."""
    import dataclasses

    import jax.numpy as jnp

    from fm_radio_tpu.config import DemodConfig
    from fm_radio_tpu.io.synth import FMModulator, ModulatorConfig, make_wideband
    from fm_radio_tpu.kernels.channelizer_pallas import channelize_pallas
    from fm_radio_tpu.models.demod import demod_block, demod_init_state, make_coeffs
    from fm_radio_tpu.parallel.channelizer import make_channelizer_taps
    from fm_radio_tpu.rds.chain import RDSFullChain
    from fm_radio_tpu.utils.transfer import pack_iq_u8

    m, channel, b, n_blocks = 32, 3, 1 << 15, 24
    mod = FMModulator(ModulatorConfig())
    groups = [(0x5005, (0 << 12) | (1 << 10), 0xE101, 0x4242)]
    iq = mod.generate(b * n_blocks, left_hz=1000.0, right_hz=3000.0,
                      rds_groups=groups)
    wide = make_wideband({channel: iq}, m)
    wide *= 100.0 / np.abs(wide).max()
    u8 = np.clip(np.stack([np.round(wide.real + 127.0),
                           np.round(wide.imag + 127.0)], axis=-1),
                 0, 255).astype(np.uint8)
    words = pack_iq_u8(u8)

    cfg = DemodConfig(frontend_int8=True, assume_integer_input=True)
    coeffs = make_coeffs(cfg)
    taps = make_channelizer_taps(m)

    from fm_radio_tpu.models.wideband import (
        wideband_demod_block,
        wideband_init_state,
    )

    outs = {}
    for splits in (3, 2, 1):
        # the PRODUCTION route: wideband_demod_block selects the
        # phase-split bridge at m=32 (channelizer i8ps planes -> the
        # bit-exact _k12_kernel_ps ingest; docs/PERF.md round 5)
        st = wideband_init_state(cfg, m, 1)
        audio, pred, valid = [], [], []
        for blk in range(n_blocks):
            wb = jnp.asarray(words[blk * b * m : (blk + 1) * b * m])[None]
            st, o = wideband_demod_block(cfg, coeffs, taps, st, wb, m,
                                         bridge="i8", splits=splits)
            audio.append(np.asarray(o["audio"])[channel])
            pred.append(np.asarray(o["rds_pred"])[channel])
            valid.append(np.asarray(o["rds_valid"])[channel])
        outs[splits] = {
            "audio": np.concatenate(audio),
            "pred": np.concatenate(pred),
            "valid": np.concatenate(valid),
        }

    for splits, o in outs.items():
        audio = o["audio"]
        n = audio.shape[0]
        tail = audio[n // 4 :]
        assert np.isfinite(tail).all()
        assert float(np.sqrt((tail**2).mean())) > 1e-3, f"splits={splits}"
        chain = RDSFullChain()
        chain.process_symbols(o["pred"][o["valid"].astype(bool)])
        assert chain.db.pi_code == 0x5005, (
            f"splits={splits}: PI {chain.db.pi_code:04X}")

    a3 = outs[3]["audio"][outs[3]["audio"].shape[0] // 4 :]
    for sp in (2, 1):
        asp = outs[sp]["audio"][outs[sp]["audio"].shape[0] // 4 :]
        err = a3 - asp
        snr = 10.0 * np.log10(float((a3**2).sum())
                              / max(float((err**2).sum()), 1e-30))
        assert snr > 30.0, f"splits={sp} diverges from splits=3: {snr:.1f} dB"
