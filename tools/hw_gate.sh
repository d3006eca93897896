#!/usr/bin/env bash
# Hardware gate runbook: everything that must run on the real TPU chip,
# in priority order, logging to a file. Run whenever the tunnel recovers
# (it drops for hours at a time); safe to re-run.
#
#   bash tools/hw_gate.sh [logfile]
#
# 1. tunnel smoke probe (fast fail if still down)
# 2. hardware-only accuracy gates (tests/test_tpu_accuracy.py)
# 3. golden parity vs the compiled reference binary (tools/golden_tpu.py)
# 4. bench baseline + int8 front-end A/B (FMTPU_BENCH_INT8)
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/hw_gate.log}"
export PYTHONPATH=/root/repo:/root/.axon_site

note() { echo "=== $* ($(date +%T)) ===" | tee -a "$LOG"; }

note "tunnel probe"
if ! timeout 90 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8,128), jnp.float32)
(x@x.T).block_until_ready()
print('TUNNEL-OK', jax.devices())
" >>"$LOG" 2>&1; then
    note "tunnel DOWN - aborting"
    exit 1
fi

note "HBM streaming-bandwidth sweep (383-vs-819 GB/s diagnosis)"
timeout 2400 python tools/hbm_sweep.py --json 2>&1 | tee -a "$LOG"

note "hardware accuracy gates"
FMTPU_TPU_TESTS=1 timeout 2400 python -m pytest tests/test_tpu_accuracy.py -q \
    2>&1 | tail -5 | tee -a "$LOG"

note "golden parity on the TPU path"
timeout 2400 python tools/golden_tpu.py 2>&1 | tail -8 | tee -a "$LOG"

# cold remote compile of the 2048ch program takes 15-20 min (cached:
# seconds); give every bench variant a cold-capable budget
export FMTPU_BENCH_TIMEOUT=5400

note "bench production default (2048ch, i8 planes + int8-direct front end)"
timeout 5700 python bench.py 2048 2>&1 | tail -2 | tee -a "$LOG"

note "bench packed-word bf16x2 A/B (2048ch, the round-2 default)"
FMTPU_BENCH_FMT=f32w FMTPU_BENCH_INT8=0 timeout 5700 python bench.py 2048 2>&1 | tail -2 | tee -a "$LOG"

note "bench wide-band front end A/B (2048ch, NO=256)"
FMTPU_BENCH_NO=256 timeout 5700 python bench.py 2048 2>&1 | tail -2 | tee -a "$LOG"

note "bench int8 + wide-band composed (2048ch)"
FMTPU_BENCH_INT8=1 FMTPU_BENCH_NO=256 timeout 5700 python bench.py 2048 2>&1 | tail -2 | tee -a "$LOG"

note "bench split-K1/K2 A/B (2048ch, round-4 fusion OFF)"
FMTPU_BENCH_K12=0 timeout 5700 python bench.py 2048 2>&1 | tail -2 | tee -a "$LOG"

note "bench narrow BPSK channel tile A/B (2048ch, pre-round-4 512 cap)"
FMTPU_BPSK_CT=512 timeout 5700 python bench.py 2048 2>&1 | tail -2 | tee -a "$LOG"

note "serving soak on the chip (6 windows x 2 s, 4 stations)"
timeout 2400 python tools/soak.py --passes 6 --json "$LOG.soak.jsonl" \
    2>&1 | tail -8 | tee -a "$LOG"

note "golden parity with the int8 front end"
FMTPU_GOLDEN_INT8=1 timeout 2400 python tools/golden_tpu.py 2>&1 | tail -8 | tee -a "$LOG"

note "golden parity at the PRODUCTION lens (i8 planes + int8-direct)"
FMTPU_GOLDEN_INT8=1 FMTPU_GOLDEN_FMT=i8 timeout 2400 python tools/golden_tpu.py 2>&1 | tail -8 | tee -a "$LOG"

note "golden parity with the wide band (NO=256) on real Mosaic"
FMTPU_GOLDEN_NO=256 timeout 2400 python tools/golden_tpu.py 2>&1 | tail -8 | tee -a "$LOG"

note "done"
