"""Hardware golden parity: the PRODUCTION TPU kernel path vs the compiled
reference binary, on the same synthetic stereo+RDS station.

The CPU golden test (tests/test_golden.py) runs the XLA ops path; this tool
runs the packed-ingest fused-Pallas path on the real chip — the combination
that caught the default-precision pilot detune (docs/PERF.md "Accuracy on
hardware").  Expect >75 dB audio SNR and bit-exact RDS bytes.

Usage:  PYTHONPATH=/root/repo:/root/.axon_site python tools/golden_tpu.py
"""

import os
import subprocess
import sys
import tempfile

import numpy as np


def main() -> int:
    from fm_radio_tpu.io.pcm import c64_to_u8
    from fm_radio_tpu.io.synth import FMModulator, ModulatorConfig
    from fm_radio_tpu.models.app import App
    from fm_radio_tpu.utils.transfer import pack_iq_u8

    block = 65536
    tmp = tempfile.mkdtemp()
    ref_bin = os.path.join(tmp, "golden_demod")
    build = os.path.join(os.path.dirname(__file__), "..", "tests", "golden", "build.sh")
    r = subprocess.run(["sh", build, ref_bin], capture_output=True, timeout=300)
    if r.returncode != 0:
        print("reference build failed:", r.stderr.decode()[:300])
        return 2

    mod = FMModulator(ModulatorConfig())
    groups = [
        (0x1234, (0 << 12) | (1 << 10), 0xE101, 0x4142),
        (0x1234, (2 << 12), 0x4845, 0x4C4C),
    ]
    iq = mod.generate(block * 10, left_hz=1000.0, right_hz=3000.0, rds_groups=groups)
    u8 = c64_to_u8(iq)
    pcm = os.path.join(tmp, "in.pcm")
    u8.tofile(pcm)
    audio_f = os.path.join(tmp, "a.f32")
    rds_f = os.path.join(tmp, "r.bin")
    r = subprocess.run([ref_bin, pcm, audio_f, rds_f, str(block)],
                       capture_output=True, timeout=300)
    assert r.returncode == 0, r.stderr.decode()[:300]
    golden_audio = np.fromfile(audio_f, np.float32).reshape(-1, 2)
    golden_rds = np.fromfile(rds_f, np.uint8)

    # FMTPU_GOLDEN_INT8=1: gate the opt-in int8-MXU front end against the
    # same golden bound before any thought of making it the default
    from fm_radio_tpu.config import DemodConfig
    from fm_radio_tpu.utils.transfer import split_iq_i8

    # FMTPU_GOLDEN_NO=256: gate the wide-band lens on REAL Mosaic (the
    # output-identity test runs in interpret mode; Mosaic compiles the
    # wider band differently and must be accuracy-checked on chip too)
    # FMTPU_GOLDEN_I16=1: gate the int16 inter-stage format lens
    cfg = DemodConfig(
        frontend_int8=os.environ.get("FMTPU_GOLDEN_INT8") == "1",
        frontend_band_no=int(os.environ.get("FMTPU_GOLDEN_NO", "128")),
        interstage_i16=os.environ.get("FMTPU_GOLDEN_I16") == "1",
    )
    # FMTPU_GOLDEN_FMT=i8: feed [2, 1, N] int8 planes instead of packed f32
    # words — with FMTPU_GOLDEN_INT8=1 this gates the int8-DIRECT front end
    # (the round-3 production fast path) on real Mosaic
    if os.environ.get("FMTPU_GOLDEN_FMT", "f32w") == "i8":
        x_in = split_iq_i8(u8.reshape(-1, 2))[:, None, :]  # [2, 1, N] i8
    else:
        x_in = pack_iq_u8(u8.reshape(-1, 2))
    app = App(block_size=block, cfg=cfg, channels=1, decode_rds=True,
              integer_input=True)
    app.process(x_in)
    ours = app.audio[0]
    settle = 32000 // 5
    d = ours[settle:] - golden_audio[settle:]
    snr = 10 * np.log10((golden_audio[settle:] ** 2).sum() / ((d ** 2).sum() + 1e-20))
    ob = app.rds_bytes(0)
    exact = bool(np.array_equal(ob, golden_rds[: len(ob)])) and len(ob) > 0
    print(f"hardware golden audio SNR: {snr:.1f} dB   RDS bit-exact: {exact}")
    ok = snr > 75.0 and exact
    print("PASS" if ok else "FAIL")

    # artifact trail (ACCURACY_HW_LAST.json): record the measurement under
    # its exact config lens so accuracy claims are auditable like the
    # BENCH_HW_LAST.json throughput ones
    from fm_radio_tpu.utils.hwrecord import device_kind, record_hw_result

    lens = (f"int8={int(cfg.frontend_int8)},no={cfg.frontend_band_no},"
            f"i16={int(cfg.interstage_i16)},"
            f"fmt={os.environ.get('FMTPU_GOLDEN_FMT', 'f32w')}")
    record_hw_result(
        "golden", lens, snr_db=round(float(snr), 2), rds_exact=exact,
        passed=ok, device=device_kind(),
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
