"""Engine decomposition + restructure A/B for the K3 extraction kernel.

K3 (kernels/extract_pallas.py) is the biggest stage after the round-3 K1
fix (~2.7 ms per 2^28-sample pass at 1024ch).  Variants:

  stream   read the 3 input planes (re, im, dt), tiny output -> DMA floor
  phasor   + harmonic phasors and the 4 mixes (values only)   -> VPU mix cost
  full     the production body: mixes -> 5 tail-extended scratch buffers ->
           bf16-split each buffer -> banded dots from buffer windows
  value    RESTRUCTURED: dots on the mixed VALUES directly — window 0 is a
           two-dot split (band[:TB] @ carried tail + band[TB:] @ value head),
           windows s>=1 slice the value at 128-aligned offsets; no full-tile
           scratch write at all (the K1 int8-direct lesson, f32 edition)

Usage: python -m tools.k3_probe [channels=1024] [b8=32768]
       FMTPU_INTERPRET=1 ... (CPU plumbing check at tiny shape)
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fm_radio_tpu.kernels.extract_pallas import _extract_body
from fm_radio_tpu.kernels.frontend_pallas import _dot3, _split_bf16
from fm_radio_tpu.kernels.midend_pallas import _NO, _TB, _band_m
from fm_radio_tpu.ops.cmath import chebyshev_sine as _cheb_sine
from fm_radio_tpu.ops.cmath import wrap_cycles as _wrapc
from fm_radio_tpu.ops.design import create_fir_lpf

_INTERPRET = os.environ.get("FMTPU_INTERPRET") == "1"


def _phasors(dt, off):
    c1 = _cheb_sine(_wrapc(dt + jnp.float32(0.25)))
    s1 = _cheb_sine(_wrapc(dt))
    c2r = c1 * c1 - s1 * s1
    s2r = jnp.float32(2.0) * c1 * s1
    co_ = _cheb_sine(_wrapc(off + jnp.float32(0.25)))
    so_ = _cheb_sine(_wrapc(off))
    c2 = c2r * co_ - s2r * so_
    s2 = s2r * co_ + c2r * so_
    c3 = c2r * c1 - s2r * s1
    s3 = s2r * c1 + c2r * s1
    return c2, s2, c3, s3


def build_stream31(c, b8, c_blk=128, t_blk=1024):
    """ONE row-stacked [3C, B8] input ref (the layout K2 could emit by
    writing re/im/theta into c_blk-interleaved row groups): one 3x-taller
    block DMA per grid step instead of three separate stream fetches."""
    grid = (c // c_blk, b8 // t_blk)

    def kern(x_ref, y_ref):
        acc = jnp.sum(x_ref[...], -1, keepdims=True)
        y_ref[...] = acc[:c_blk, :1] * jnp.ones((1, 128), jnp.float32)

    def apply(x3):
        return pl.pallas_call(
            kern, grid=grid,
            in_specs=[pl.BlockSpec((3 * c_blk, t_blk),
                                   lambda ci, ti: (ci, ti),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((c_blk, 128), lambda ci, ti: (ci, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((c, 128), jnp.float32),
            interpret=_INTERPRET,
        )(x3)

    return apply


def build(c, b8, mode, c_blk=128, t_blk=None):
    taps_a = jnp.asarray(create_fir_lpf(64, 0.1), jnp.float32)
    taps_r = jnp.asarray(create_fir_lpf(128, 0.05), jnp.float32)
    ba = _band_m(taps_a, 4)
    bm = _band_m(taps_a, 4)
    br = _band_m(taps_r, 8)
    if t_blk is None:
        t_blk = _NO * 8
    grid = (c // c_blk, b8 // t_blk)
    na = t_blk // (_NO * 4)
    small = mode in ("stream", "stream1", "phasor")

    def kern(xr_ref, xi_ref, dt_ref, ba_ref, bm_ref, br_ref, *rest):
        if mode == "stream1":
            # single-plane stream: is the 3-plane rate a stream-COUNT
            # artifact or an array-level ceiling?
            (y_ref,) = rest
            acc = jnp.sum(xr_ref[...], -1, keepdims=True)
            y_ref[...] = acc[:, :1] * jnp.ones((1, 128), jnp.float32)
            return
        if mode == "stream":
            (y_ref,) = rest
            acc = (jnp.sum(xr_ref[...], -1, keepdims=True)
                   + jnp.sum(xi_ref[...], -1, keepdims=True)
                   + jnp.sum(dt_ref[...], -1, keepdims=True))
            y_ref[...] = acc[:, :1] * jnp.ones((1, 128), jnp.float32)
            return
        xr, xi, dt = xr_ref[...], xi_ref[...], dt_ref[...]
        off = jnp.zeros((xr.shape[0], 1), jnp.float32)
        c2, s2, c3, s3 = _phasors(dt, off)
        if mode == "phasor":
            (y_ref,) = rest
            m = (xr * c2 - xi * s2) + (xr * s2 + xi * c2) \
                + (xr * c3 - xi * s3) + (xr * s3 + xi * c3)
            y_ref[...] = jnp.sum(m, -1, keepdims=True)[:, :1] * jnp.ones(
                (1, 128), jnp.float32)
            return
        if mode == "full":
            y_refs, bufs = rest[:5], rest[5:]
            lpr, lmr_re, lmr_im, rds_re, rds_im = _extract_body(
                xr, xi, dt, off, ba_ref, bm_ref, br_ref, *bufs,
                t_blk=t_blk, n_out=_NO, h_lmr=2.0, h_rds=3.0,
                interp=_INTERPRET)
            for r, v in zip(y_refs, (lpr, lmr_re, lmr_im, rds_re, rds_im)):
                r[...] = v
            return
        assert mode == "value"
        y_refs, tails = rest[:5], rest[5:]
        planes = (
            xr,                     # L+R
            xr * c2 - xi * s2,      # L-R re
            xr * s2 + xi * c2,      # L-R im
            xr * c3 - xi * s3,      # RDS re
            xr * s3 + xi * c3,      # RDS im
        )
        bands = (ba_ref, bm_ref, bm_ref, br_ref, br_ref)
        ms = (4, 4, 4, 8, 8)
        for y_ref, tail, band_ref, m, plane in zip(
                y_refs, tails, bands, ms, planes):
            b_hi, b_lo = _split_bf16(band_ref[...], _INTERPRET)
            t_hi, t_lo = _split_bf16(tail[...], _INTERPRET)
            p_hi, p_lo = _split_bf16(plane, _INTERPRET)
            w = _NO * m  # value columns per window (band rows _TB + w)
            n_sub = t_blk // w
            parts = []
            for s in range(n_sub):
                if s == 0:
                    # two-dot window 0: carried tail x band[:TB] + head
                    y = (_dot3(t_hi, t_lo, b_hi[:_TB], b_lo[:_TB])
                         + _dot3(p_hi[:, :w], p_lo[:, :w],
                                 b_hi[_TB:], b_lo[_TB:]))
                else:
                    w0 = s * w - _TB
                    y = _dot3(p_hi[:, w0 : w0 + _TB + w],
                              p_lo[:, w0 : w0 + _TB + w], b_hi, b_lo)
                parts.append(y)
            y_ref[...] = (parts[0] if n_sub == 1
                          else jnp.concatenate(parts, -1))
            tail[...] = plane[:, t_blk - _TB :]

    tspec = lambda div: pl.BlockSpec((c_blk, t_blk // div),
                                     lambda ci, ti: (ci, ti),
                                     memory_space=pltpu.VMEM)
    cspec = lambda shape: pl.BlockSpec(shape, lambda ci, ti: (0, 0),
                                       memory_space=pltpu.VMEM)
    in_specs = [tspec(1)] * 3 + [
        cspec((_NO * 4 + _TB, _NO)), cspec((_NO * 4 + _TB, _NO)),
        cspec((_NO * 8 + _TB, _NO)),
    ]
    if small:
        out_specs = pl.BlockSpec((c_blk, 128), lambda ci, ti: (ci, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((c, 128), jnp.float32)
        scratch = []
    else:
        out_specs = [tspec(4)] * 3 + [tspec(8)] * 2
        out_shape = (
            [jax.ShapeDtypeStruct((c, b8 // 4), jnp.float32)] * 3
            + [jax.ShapeDtypeStruct((c, b8 // 8), jnp.float32)] * 2
        )
        scratch = (
            [pltpu.VMEM((c_blk, _TB + t_blk), jnp.float32) for _ in range(5)]
            if mode == "full"
            else [pltpu.VMEM((c_blk, _TB), jnp.float32) for _ in range(5)]
        )

    def apply(xr, xi, dt):
        return pl.pallas_call(
            kern, grid=grid, in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape, scratch_shapes=scratch,
            interpret=_INTERPRET,
        )(xr, xi, dt, ba, bm, br)

    return apply


def time_variant(apply_fn, xs, iters, repeats=3):
    @jax.jit
    def run(*x0):
        def body(i, carry):
            *xb, acc = jax.lax.optimization_barrier((*x0, carry))
            y = apply_fn(*xb)
            y0 = y[0] if isinstance(y, (tuple, list)) else y
            return acc + y0[0, 0]

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(np.asarray(run(*xs)))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(np.asarray(run(*xs)))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    c = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    b8 = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
    # K3's pass is ~4x smaller than K1's (0.4 GB, fewer FLOPs): at iters=16
    # the tunnel's 5-30 ms per-dispatch latency dominated and every stream
    # variant measured a flat ~2.0 ms/pass regardless of bytes — amortize
    # harder here
    iters = 2 if _INTERPRET else int(os.environ.get("FMTPU_PROBE_ITERS", "96"))
    rng = np.random.default_rng(0)
    xs = tuple(jnp.asarray(rng.standard_normal((c, b8)).astype(np.float32))
               for _ in range(3))
    gb_in = 3 * c * b8 * 4 / 1e9
    print(f"# K3 [C={c}, B8={b8}] input={gb_in:.2f} GB/pass iters={iters}")
    # t_blk sweep: the 3 input planes at t_blk=1024 fragment into 4 KB HBM
    # runs (measured 202 GB/s vs the front end's 367 at 8 KB runs); the
    # production kernel is VMEM-pinned to 1024 by its 5 tail-extended
    # scratches, but the value restructure's tiny scratches free VMEM for
    # bigger tiles
    cases = [("stream1", 1024), ("stream1", 2048),
             ("stream31", 1024), ("stream31", 2048),
             ("stream", 1024), ("stream", 2048), ("stream", 4096),
             ("phasor", 1024), ("full", 1024),
             ("value", 1024), ("value", 2048), ("value", 4096)]
    x3 = jnp.concatenate(
        [x.reshape(c // 128, 128, b8) for x in xs], axis=1
    ).reshape(3 * c, b8)
    for mode, t_blk in cases:
        if b8 % t_blk:
            continue
        try:
            if mode == "stream31":
                dt = time_variant(build_stream31(c, b8, t_blk=t_blk),
                                  (x3,), iters)
            else:
                dt = time_variant(build(c, b8, mode, t_blk=t_blk), xs, iters)
        except Exception as e:
            print(f"{mode}:t={t_blk} FAIL {type(e).__name__}: {str(e)[:90]}",
                  flush=True)
            continue
        gb = gb_in / 3 if mode == "stream1" else gb_in
        print(f"{mode}:t={t_blk:<5d} {dt * 1e3:8.3f} ms/pass   "
              f"in-stream {gb / dt:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
