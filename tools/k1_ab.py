"""A/B the PRODUCTION front-end kernel against the probe's stripped variant.

chain_probe (bench shape, 2048x131072) puts production K1 at ~6.3 ms per
2^28-sample block while tools/frontend_probe.py's "full" variant — same
band dots, same atan2/wrap, same tile geometry — measures ~4.0 ms.  This
tool times BOTH through the identical harness (same timing loop, same input,
same shape) to decide whether the gap is real kernel overhead (carry
structure, extra outputs, pl.when branches) or an artifact of how
chain_probe composes stages.

Usage: python tools/k1_ab.py [channels=2048] [block=131072]
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from fm_radio_tpu.kernels.frontend_pallas import ds4_disc_pallas, pick_tiles
from fm_radio_tpu.ops.design import create_fir_lpf
from fm_radio_tpu.utils.transfer import pack_iq_u8, split_iq_i8
from tools.frontend_probe import build, time_variant


def main() -> None:
    c = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 131072
    # 64 iters: at 16, the tunnel's 5-30 ms per-dispatch latency inflated
    # every pass by ~0.3-1 ms (round-3 finding via tools/k3_probe — the
    # same workload measured 2.0 ms at iters=16 and 0.80 ms at 96)
    iters = int(os.environ.get("FMTPU_PROBE_ITERS", "64"))
    nn = 64  # production ds_fm_in LPF order (broadcast_fm_demod.h:45)
    taps = jnp.asarray(create_fir_lpf(nn, 0.25), jnp.float32)
    halo = nn - 4

    rng = np.random.default_rng(0)
    iq = rng.integers(0, 256, size=(c, b, 2), dtype=np.uint8)
    xw = jnp.asarray(pack_iq_u8(iq))
    x8 = jnp.asarray(split_iq_i8(iq))
    tail = (jnp.zeros((c, halo), jnp.float32), jnp.zeros((c, halo), jnp.float32))
    prev = jnp.zeros((c,), jnp.float32)
    gb_in = c * b * 4 / 1e9
    gb_i8 = c * b * 2 / 1e9
    print(f"# [C={c}, B={b}] tiles={pick_tiles(c, b)} iters={iters} "
          f"input={gb_in:.2f} GB/pass (packed) / {gb_i8:.2f} (i8)")

    # -- production kernels, full return structure -------------------------
    def prod(x, **kw):
        new_tail, new_prev, y = ds4_disc_pallas(
            taps, tail, prev, x, 75e3, 256e3, int_input=True, **kw
        )
        # fold every output into the carry so nothing is dead-code-eliminated
        return y + (new_tail[0][:, :1] + new_tail[1][:, :1]
                    + new_prev[:, None])

    dt = time_variant(prod, xw, iters)
    print(f"production packed bf16x2     {dt * 1e3:8.3f} ms/pass   "
          f"in-stream {gb_in / dt:6.1f} GB/s", flush=True)

    import functools

    dt = time_variant(functools.partial(prod, int8_dots=True), x8, iters)
    print(f"production i8-DIRECT         {dt * 1e3:8.3f} ms/pass   "
          f"in-stream {gb_i8 / dt:6.1f} GB/s", flush=True)

    # -- probe 'full' variant (no carries, 132-tap band, same geometry) ----
    dt = time_variant(build(c, b, 128, "full", False), xw, iters)
    print(f"probe full variant           {dt * 1e3:8.3f} ms/pass   "
          f"in-stream {gb_in / dt:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
