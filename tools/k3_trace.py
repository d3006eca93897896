"""Device-op attribution of the K3 in-chain premium via jax.profiler.

Round-4 finding path: the chain_probe k3iso variants showed the +3.3 ms K3
stage delta is NOT glue (free), NOT XLA scheduling (barrier: no change),
NOT the read path (in-chain stream-only stand-in: +0.68 ms), and NOT the
kernel itself (a second identical in-chain K3: +1.23 ms).  This tool takes
a profiler trace of the upto=2 and upto=3 prefixes and diffs the per-op
device totals, so the premium lands on a named HLO op instead of a stage
delta.

Usage: python -m tools.k3_trace [channels=2048] [block=131072] [n_blocks=8]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import sys
import tempfile

import numpy as np
import jax
import jax.numpy as jnp

from fm_radio_tpu.config import DemodConfig
from fm_radio_tpu.models.demod import demod_init_state, make_coeffs
from fm_radio_tpu.utils.transfer import split_iq_i8
from tools.chain_probe import fused_prefix


def op_totals(trace_dir: str) -> dict[str, float]:
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    durs: dict[str, float] = collections.defaultdict(float)
    for path in files:
        with gzip.open(path) as f:
            tr = json.load(f)
        for e in tr.get("traceEvents", []):
            if e.get("ph") == "X" and "dur" in e:
                name = e.get("name", "")
                # keep XLA device ops only (skip python host frames)
                if name.startswith("$") or "(" in name and name.endswith(")"):
                    continue
                durs[name] += e["dur"]
    return durs


def main() -> None:
    channels = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    block = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 17
    n_blocks = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    cfg = DemodConfig(assume_integer_input=True, frontend_int8=True)
    coeffs = make_coeffs(cfg)
    state = demod_init_state(cfg, channels)
    rng = np.random.default_rng(0)
    ph = np.cumsum(
        rng.standard_normal((channels, block)).astype(np.float32) * 0.5, -1)
    iq_u8 = np.stack([np.round(100 * np.cos(ph) + 127),
                      np.round(100 * np.sin(ph) + 127)], -1).astype(np.uint8)
    x = jnp.asarray(split_iq_i8(iq_u8))

    totals = {}
    for upto in (2, 3):
        @jax.jit
        def run(state, x, _upto=upto):
            def step(st, _):
                return fused_prefix(cfg, coeffs, st, x, _upto)
            st, probes = jax.lax.scan(step, state, None, length=n_blocks)
            return jnp.sum(probes)

        float(np.asarray(run(state, x)))  # compile + warm
        d = tempfile.mkdtemp(prefix=f"k3trace{upto}_")
        with jax.profiler.trace(d):
            float(np.asarray(run(state, x)))
        totals[upto] = op_totals(d)

    all_ops = sorted(set(totals[2]) | set(totals[3]),
                     key=lambda k: -(totals[3].get(k, 0.0)))
    print(f"{'op':40s} {'upto2 ms':>9s} {'upto3 ms':>9s} {'diff ms':>9s}")
    for op in all_ops:
        a = totals[2].get(op, 0.0) / 1e3
        b = totals[3].get(op, 0.0) / 1e3
        if max(a, b) < 0.3:
            continue
        print(f"{op[:40]:40s} {a:9.2f} {b:9.2f} {b - a:+9.2f}")
    sum2 = sum(totals[2].values()) / 1e3
    sum3 = sum(totals[3].values()) / 1e3
    print(f"{'TOTAL device':40s} {sum2:9.2f} {sum3:9.2f} {sum3 - sum2:+9.2f}"
          f"   (/{n_blocks} blocks)")


if __name__ == "__main__":
    main()
