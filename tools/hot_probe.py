"""Micro-probe of the two chain hot spots found by chain_probe.py:
the discriminator's atan2 (13.5 ms) and the pilot peak-IIR+AGC (12.5 ms).

Each candidate runs inside a scan over n_iters with an optimization barrier,
one dispatch, so tunnel latency amortizes out.

Usage: python tools/hot_probe.py
"""

from __future__ import annotations

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from fm_radio_tpu.config import DemodConfig
from fm_radio_tpu.models.demod import make_coeffs
from fm_radio_tpu.ops.agc import agc_init_state, agc_process_p
from fm_radio_tpu.ops.cmath import wrap_phase
from fm_radio_tpu.ops.iir import iir_filter_planes, iir_init_state

C = 256
N_FM_IN = 1 << 18   # per-channel fm_in length for a 1M baseband block
N_FM_OUT = 1 << 17

_ATAN_C = (
    0.99997726, -0.33262347, 0.19354346, -0.11643287, 0.05265332, -0.01172120,
)


def fast_atan2(y, x):
    pi = jnp.float32(jnp.pi)
    half_pi = jnp.float32(jnp.pi / 2.0)
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    mx = jnp.maximum(ax, ay)
    mn = jnp.minimum(ax, ay)
    r = mn / jnp.maximum(mx, jnp.float32(1e-37))
    s = r * r
    p = jnp.float32(_ATAN_C[-1])
    for c in _ATAN_C[-2::-1]:
        p = p * s + jnp.float32(c)
    a = p * r
    a = jnp.where(ay > ax, half_pi - a, a)
    a = jnp.where(x < 0.0, pi - a, a)
    return jnp.where(y < 0.0, -a, a)


def timed(fn, *args, iters=8):
    @jax.jit
    def run(*a):
        def step(carry, _):
            out = fn(*a, carry)
            return jax.lax.optimization_barrier(out), None
        out, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=iters)
        return out

    out = run(*args)
    float(np.asarray(out))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(*args)
        float(np.asarray(out))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((C, N_FM_IN)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((C, N_FM_IN)).astype(np.float32))
    print(f"device={jax.devices()[0].device_kind}  C={C}  N={N_FM_IN}")

    # ---- discriminator candidates ----
    def disc_xla(xr, xi, carry):
        theta = jnp.arctan2(xi, xr + carry)
        d = wrap_phase(theta[:, 1:] - theta[:, :-1])
        return jnp.sum(d[:, -8:]) + theta[0, 0]

    def disc_poly(xr, xi, carry):
        theta = fast_atan2(xi, xr + carry)
        d = wrap_phase(theta[:, 1:] - theta[:, :-1])
        return jnp.sum(d[:, -8:]) + theta[0, 0]

    t_xla = timed(disc_xla, xr, xi)
    t_poly = timed(disc_poly, xr, xi)
    print(f"disc atan2 XLA : {t_xla*1e3:8.2f} ms")
    print(f"disc atan2 poly: {t_poly*1e3:8.2f} ms   ({t_xla/t_poly:.2f}x)")

    # accuracy of poly vs XLA atan2
    err = float(jnp.max(jnp.abs(fast_atan2(xi, xr) - jnp.arctan2(xi, xr))))
    print(f"poly max |err| = {err:.3e} rad")

    # ---- peak IIR + AGC candidates ----
    cfg = DemodConfig()
    coeffs = make_coeffs(cfg)
    pr = jnp.asarray(rng.standard_normal((C, N_FM_OUT)).astype(np.float32))
    pi_ = jnp.asarray(rng.standard_normal((C, N_FM_OUT)).astype(np.float32))
    st0 = iir_init_state(2 * C, 2)
    g0 = agc_init_state(C)

    def peak_chain(pr, pi_, carry, method):
        st, pp = iir_filter_planes(
            coeffs.peak_b, coeffs.peak_a, st0, (pr + carry, pi_), method=method
        )
        g, pp = agc_process_p(g0, pp, target_power=1.0)
        return jnp.sum(pp[0][:, -8:]) + jnp.sum(pp[1][:, -8:])

    def iir_only(pr, pi_, carry, method):
        st, pp = iir_filter_planes(
            coeffs.peak_b, coeffs.peak_a, st0, (pr + carry, pi_), method=method
        )
        return jnp.sum(pp[0][:, -8:]) + jnp.sum(pp[1][:, -8:])

    def agc_only(pr, pi_, carry):
        g, pp = agc_process_p(g0, (pr + carry, pi_), target_power=1.0)
        return jnp.sum(pp[0][:, -8:]) + jnp.sum(pp[1][:, -8:])

    t_both = timed(functools.partial(peak_chain, method="toeplitz"), pr, pi_)
    t_iir = timed(functools.partial(iir_only, method="toeplitz"), pr, pi_)
    t_agc = timed(agc_only, pr, pi_)
    print(f"peak IIR+AGC (toeplitz): {t_both*1e3:8.2f} ms")
    print(f"peak IIR only          : {t_iir*1e3:8.2f} ms")
    print(f"AGC only               : {t_agc*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
