"""Engine decomposition of the K1 front-end kernel (ds4 + discriminator).

docs/PERF.md's floor work needs to know WHAT bounds K1 (6.6 ms at round-1
measurement): the MXU band dots, the VPU work (packed-word unpack + poly
atan2), or the HBM input stream.  This probe times four kernel variants at
production shape, each isolating one engine:

  full      the production kernel body (unpack + dots + atan2 + wrap)
  dots      unpack + band dots only (atan2/wrap removed)  -> MXU + unpack
  unpack    unpack + per-word reduction only              -> VPU unpack + DMA
  stream    raw block-sum of the packed words             -> pure input DMA

All variants read the identical packed [C, B] f32 input and write the same
[C, B/4] f32 output (except ``stream``/``unpack``, which write a [C, 128]
stub — their point is the input side).  Timings chain ITERS applications in
one dispatch with a data-dependent carry so the tunnel's 5-30 ms dispatch
latency amortizes, and completion is forced by fetching a dependent scalar
(block_until_ready is unreliable over the tunnel — see bench.py).

Usage: python tools/frontend_probe.py [channels=1024] [block=262144]
       FMTPU_INTERPRET=1 ... (CPU plumbing check at tiny shape)
"""

from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fm_radio_tpu.kernels.frontend_pallas import (
    _TB,
    _band_matrix,
    _split_bf16,
    _dot3,
    quantize_band_int8,
)
from fm_radio_tpu.kernels.pll_pallas import _atan2
from fm_radio_tpu.ops.design import create_fir_lpf
from fm_radio_tpu.utils.transfer import pack_iq_u8, unpack_iq_words

_INTERPRET = os.environ.get("FMTPU_INTERPRET") == "1"
_M = 4


def _variant_kernel(xw_ref, band_refs, y_ref, bufr, bufi,
                    *, t_blk, no, mode, int8):
    """One time-tile of the front end, variant selected by ``mode``."""
    if mode == "stream":
        # pure input DMA: touch every word once, tiny output
        y_ref[...] = jnp.sum(xw_ref[...], axis=-1, keepdims=True)[:, :1] * jnp.ones(
            (1, 128), jnp.float32
        )
        return
    re, im = unpack_iq_words(xw_ref[...])
    if mode == "unpack":
        y_ref[...] = (
            jnp.sum(re - im, axis=-1, keepdims=True)[:, :1]
            * jnp.ones((1, 128), jnp.float32)
        )
        return
    bufr[:, _TB:] = re
    bufi[:, _TB:] = im
    _w = no * _M + _TB
    n_sub = t_blk // (no * _M)
    if int8:
        b1, b2, srow = band_refs
        xr8 = (bufr[...] - 1.0).astype(jnp.int8)
        xi8 = (bufi[...] - 1.0).astype(jnp.int8)

        def dot(x8, w0):
            xwin = x8[:, w0 : w0 + _w]
            y1 = jnp.dot(xwin, b1[...], preferred_element_type=jnp.int32)
            y2 = jnp.dot(xwin, b2[...], preferred_element_type=jnp.int32)
            return (
                y1.astype(jnp.float32)
                + y2.astype(jnp.float32) * jnp.float32(1 / 128.0)
                + srow[...]
            )

        parts = [(dot(xr8, s * no * _M), dot(xi8, s * no * _M))
                 for s in range(n_sub)]
    else:
        (band,) = band_refs
        b_hi, b_lo = _split_bf16(band[...], _INTERPRET)
        xr_hi = bufr[...].astype(jnp.bfloat16)
        xi_hi = bufi[...].astype(jnp.bfloat16)

        def dot(x_hi, w0):
            xwin = x_hi[:, w0 : w0 + _w]
            return jnp.dot(xwin, b_hi, preferred_element_type=jnp.float32) + jnp.dot(
                xwin, b_lo, preferred_element_type=jnp.float32
            )

        parts = [(dot(xr_hi, s * no * _M), dot(xi_hi, s * no * _M))
                 for s in range(n_sub)]
    fr = jnp.concatenate([p[0] for p in parts], axis=-1)
    fi = jnp.concatenate([p[1] for p in parts], axis=-1)
    if mode == "dots":
        y_ref[...] = fr + fi
        return
    assert mode == "full"
    theta = _atan2(fi, fr)
    d = theta - jnp.concatenate([theta[:, :1], theta[:, :-1]], axis=-1)
    pi = jnp.float32(np.pi)
    d = jnp.where(d >= pi, d - 2 * pi, d)
    d = jnp.where(d <= -pi, d + 2 * pi, d)
    y_ref[...] = d * jnp.float32(0.123)


def build(c, b, no, mode, int8, c_blk=None, t_blk=None):
    taps = jnp.asarray(create_fir_lpf(128 + _M, 0.25), jnp.float32)
    band = _band_matrix(taps, no)
    bands = quantize_band_int8(band) if int8 else (band,)
    _w = no * _M + _TB
    if t_blk is None:
        t_blk = no * _M
        while t_blk * 2 <= 2048 and b % (t_blk * 2) == 0:
            t_blk *= 2
    if c_blk is None:
        c_blk = min(c, 128)
    grid = (c // c_blk, b // t_blk)
    small_out = mode in ("stream", "unpack")
    out_shape = (
        jax.ShapeDtypeStruct((c, 128), jnp.float32)
        if small_out
        else jax.ShapeDtypeStruct((c, b // _M), jnp.float32)
    )
    out_spec = (
        pl.BlockSpec((c_blk, 128), lambda ci, ti: (ci, 0),
                     memory_space=pltpu.VMEM)
        if small_out
        else pl.BlockSpec((c_blk, t_blk // _M), lambda ci, ti: (ci, ti),
                          memory_space=pltpu.VMEM)
    )
    if int8:
        band_specs = [
            pl.BlockSpec((_w, no), lambda ci, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_w, no), lambda ci, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, no), lambda ci, ti: (0, 0), memory_space=pltpu.VMEM),
        ]
    else:
        band_specs = [
            pl.BlockSpec((_w, no), lambda ci, ti: (0, 0), memory_space=pltpu.VMEM)
        ]

    def kern(xw_ref, *refs):
        band_refs = refs[: len(band_specs)]
        y_ref, bufr, bufi = refs[len(band_specs) :]
        _variant_kernel(
            xw_ref, band_refs, y_ref, bufr, bufi,
            t_blk=t_blk, no=no, mode=mode, int8=int8,
        )

    def apply(xw):
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((c_blk, t_blk), lambda ci, ti: (ci, ti),
                             memory_space=pltpu.VMEM)
            ]
            + band_specs,
            out_specs=out_spec,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((c_blk, _TB + t_blk), jnp.float32),
                pltpu.VMEM((c_blk, _TB + t_blk), jnp.float32),
            ],
            interpret=_INTERPRET,
        )(xw, *bands)

    return apply


def time_variant(apply_fn, xw, iters, repeats=3):
    @jax.jit
    def run(x0):
        def body(i, carry):
            xb, acc = jax.lax.optimization_barrier((x0, carry))
            y = apply_fn(xb)
            return acc + y[0, 0]

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(np.asarray(run(xw)))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(np.asarray(run(xw)))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    c = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 262144
    iters = 2 if _INTERPRET else 16
    rng = np.random.default_rng(0)
    iq = rng.integers(0, 256, size=(c, b, 2), dtype=np.uint8)
    xw = jnp.asarray(pack_iq_u8(iq))
    gb_in = c * b * 4 / 1e9
    print(f"# [C={c}, B={b}] packed input = {gb_in:.2f} GB/pass, iters={iters}")
    for mode in ("stream", "unpack", "dots", "full"):
        for no, int8 in ((128, False), (128, True), (256, False), (256, True)):
            if mode in ("stream", "unpack") and (no != 128 or int8):
                continue  # no dots in these variants
            dt = time_variant(build(c, b, no, mode, int8), xw, iters)
            tag = f"{mode}:no={no}:{'int8' if int8 else 'bf16x2'}"
            print(
                f"{tag:28s} {dt * 1e3:8.3f} ms/pass   "
                f"in-stream {gb_in / dt:6.1f} GB/s"
            )

    # tile-geometry sweep: the HBM sweep's read benchmark hits ~489 GB/s on
    # 2-8 MB blocks while the production [128, 2048] (1 MB) tile streams at
    # ~369 — find the shape that closes the gap (VMEM budget permitting)
    for mode in ("stream", "full"):
        for c_blk, t_blk in ((128, 2048), (128, 4096), (256, 1024),
                             (256, 2048), (512, 1024), (512, 2048)):
            if c % c_blk or b % t_blk or t_blk % 512:
                continue
            # scoped VMEM: 2 scratch + 2x double-buffered input + output
            vmem_mb = (
                2 * c_blk * (_TB + t_blk) + 2 * 2 * c_blk * t_blk
                + 2 * c_blk * t_blk // 4
            ) * 4 / 1e6
            if vmem_mb > 14.5:
                continue
            dt = time_variant(
                build(c, b, 128, mode, False, c_blk=c_blk, t_blk=t_blk),
                xw, iters,
            )
            print(
                f"{mode}:tile={c_blk}x{t_blk:<5d} {dt * 1e3:11.3f} ms/pass   "
                f"in-stream {gb_in / dt:6.1f} GB/s   (~{vmem_mb:.1f} MB VMEM)"
            )


if __name__ == "__main__":
    main()
