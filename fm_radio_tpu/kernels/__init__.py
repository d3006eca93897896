"""Pallas TPU kernels for the sequential hot loops.

The pipeline's cost is dominated by the two per-sample feedback loops (pilot
PLL: 8192 steps/block, BPSK sync: 1024 steps/block).  Under ``lax.scan`` each
step is a handful of tiny HLO ops with carry traffic; these kernels fuse the
whole loop body into one VPU program with the carry held in registers and the
sample stream resident in VMEM — the TPU-native replacement for the
reference's hand-written AVX loops (``src/dsp/simd/``).
"""

from fm_radio_tpu.kernels.pll_pallas import pilot_pll_pallas  # noqa: F401
from fm_radio_tpu.kernels.bpsk_pallas import bpsk_sync_pallas  # noqa: F401
