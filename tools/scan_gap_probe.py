"""Probe: why is the multi-block lax.scan slower than N single blocks?

Compares three dispatch strategies for 8 blocks x C channels:
  a) one jitted lax.scan over the block axis (bench.py method)
  b) python loop of jitted demod_block, probe fetched once at the end
  c) one jitted call containing a python-unrolled 8-block loop
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from fm_radio_tpu.config import DemodConfig
from fm_radio_tpu.models.demod import demod_block, demod_init_state, make_coeffs
from fm_radio_tpu.utils.transfer import device_put_complex


def timeit(name, thunk, n=3):
    thunk()
    best = min(_t(thunk) for _ in range(n))
    print(f"{name:42s} {best * 1e3:9.2f} ms  {TOTAL / best / 1e6:8.1f} Msps")
    return best


def _t(thunk):
    t0 = time.perf_counter()
    thunk()
    return time.perf_counter() - t0


c = int(sys.argv[1]) if len(sys.argv) > 1 else 64
block = 65536
n_blocks = 8
TOTAL = c * block * n_blocks

cfg = DemodConfig()
coeffs = make_coeffs(cfg)

rng = np.random.default_rng(0)
phase = np.cumsum(rng.standard_normal((c, block * n_blocks)) * 0.5, axis=-1)
x = (100.0 * np.exp(1j * phase)).astype(np.complex64)
xb = device_put_complex(x.reshape(c, n_blocks, block).transpose(1, 0, 2))


@jax.jit
def probe_of(outs):
    return (
        jnp.sum(outs["audio"]) + jnp.sum(outs["rds_pred"]) + jnp.sum(outs["rds_valid"])
    )


@jax.jit
def run_scan(state, xb):
    def step(st, blk):
        st, outs = demod_block(cfg, coeffs, st, blk)
        return st, (outs["audio"], outs["rds_pred"], outs["rds_valid"])

    state, outs = jax.lax.scan(step, state, xb)
    return state, jnp.sum(outs[0]) + jnp.sum(outs[1]) + jnp.sum(outs[2])


@jax.jit
def run_unrolled(state, xb):
    acc = jnp.float32(0)
    for i in range(n_blocks):
        state, outs = demod_block(cfg, coeffs, state, xb[i])
        acc = acc + probe_of(outs)
    return state, acc


step_jit = jax.jit(lambda st, blk: demod_block(cfg, coeffs, st, blk))


def run_pyloop(state, xb):
    probes = []
    for i in range(n_blocks):
        state, outs = step_jit(state, xb[i])
        probes.append(probe_of(outs))
    return float(np.asarray(sum(probes)))


state = demod_init_state(cfg, c)
print(f"channels={c} blocks={n_blocks}x{block}")
timeit("a) lax.scan over blocks", lambda: float(np.asarray(run_scan(state, xb)[1])))
timeit("b) python loop, fetch at end", lambda: run_pyloop(state, xb))
timeit("c) jit python-unrolled loop", lambda: float(np.asarray(run_unrolled(state, xb)[1])))
