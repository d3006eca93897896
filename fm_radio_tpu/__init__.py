"""fm_radio_tpu — a TPU-native broadcast-FM demodulation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
C++/AVX2 SDR application (williamyang98/FM-Radio, mounted at /root/reference):
wideband broadcast-FM stereo demodulation + RDS (Radio Data System) decoding.

Design stance (TPU-first, not a port):
  * Every pipeline stage is a pure function ``f(coeffs, state, x) -> (state', y)``.
  * The channel axis ``C`` is always present — arrays are ``[C, T]`` — so
    multi-station demodulation is free via batching, and sharding over a
    ``jax.sharding.Mesh`` is a partition annotation, not a rewrite.
  * Feed-forward filters (polyphase decimators, FIR/Hilbert) are expressed as
    feature-contraction convolutions that XLA maps onto the MXU.
  * Linear recurrences (IIR biquads) use parallel associative scans;
    genuinely nonlinear feedback loops (pilot PLL, BPSK symbol sync) are
    ``lax.scan`` cells batched across channels.
  * All cross-block continuity lives in one explicit :class:`DemodState`
    pytree — which is simultaneously the checkpoint format and the
    shard-boundary handoff payload for time-parallel streaming.

Reference parity citations use ``file:line`` into ``/root/reference/``.
"""

__version__ = "0.1.0"

from fm_radio_tpu.config import (  # noqa: F401
    AnalogParams,
    BPSKConfig,
    DemodConfig,
    RateConfig,
)
