"""HBM streaming-bandwidth diagnostic sweep (round-1 verdict item 3).

Round 1 measured ~383 GB/s effective HBM streaming — 47% of the v5e's
819 GB/s spec — and treated it as a given.  This sweep isolates whether the
gap is kernel-addressable (tile shape / layout / buffering) or a
platform/tunnel ceiling, by timing pure data movement with every variable
the kernel author controls:

  xla          y = x * c           — XLA's own fused streaming loop
  copy:BMxBN   Pallas auto-pipelined grid copy (double-buffered by the
               pipeline emitter), block shape swept
  dma1:R       manual HBM->VMEM->HBM copy, SINGLE-buffered (serial DMA:
               in.wait before out.start, one VMEM slot)
  dma2:R       same, DOUBLE-buffered (2 slots: chunk i+1's fill overlaps
               chunk i's drain)
  read:BMxBN   read-only block-sum (pure read stream, no write traffic)

All timings chain the op serially inside one jitted ``lax.fori_loop``
(iteration i+1 consumes iteration i's output, so XLA cannot CSE or
overlap dispatches) and amortize >=100 ms per dispatch — the only reliable
measurement over the 5-30 ms-latency tunnel (memory: A/B timings need
>=100 ms dispatches).

GB/s figures count total HBM traffic: 2 x bytes for copies (read+write),
1 x for read-only.

Usage:
    python tools/hbm_sweep.py [--mb 256] [--iters 24] [--repeats 3] [--json]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 1024  # fixed minor dim: 8x (8,128) tiles per row-block
_INTERPRET = os.environ.get("FMTPU_INTERPRET") == "1"  # CPU correctness lane


# --------------------------------------------------------------- variants


def xla_scale(x):
    # multiply (not +0) so XLA cannot turn the stream into a bitcast/no-op
    return x * jnp.float32(1.0000001)


def _copy_kernel(x_ref, y_ref):
    y_ref[...] = x_ref[...]


def pallas_copy(x, bm: int, bn: int):
    r, n = x.shape
    return pl.pallas_call(
        _copy_kernel,
        grid=(r // bm, n // bn),
        in_specs=[pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, n), x.dtype),
        interpret=_INTERPRET,
    )(x)


def _dma_copy_kernel(x_hbm, y_hbm, vmem, in_sem, out_sem, *, chunk, nbuf):
    n_chunks = x_hbm.shape[0] // chunk

    def start_in(i):
        slot = jax.lax.rem(i, nbuf)
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(pl.multiple_of(i * chunk, chunk), chunk)],
            vmem.at[slot],
            in_sem.at[slot],
        ).start()

    if nbuf == 1:
        def body(i, _):
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(pl.multiple_of(i * chunk, chunk), chunk)],
                vmem.at[0], in_sem.at[0]).start()
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(pl.multiple_of(i * chunk, chunk), chunk)],
                vmem.at[0], in_sem.at[0]).wait()
            pltpu.make_async_copy(
                vmem.at[0],
                y_hbm.at[pl.ds(pl.multiple_of(i * chunk, chunk), chunk)],
                out_sem.at[0]).start()
            pltpu.make_async_copy(
                vmem.at[0],
                y_hbm.at[pl.ds(pl.multiple_of(i * chunk, chunk), chunk)],
                out_sem.at[0]).wait()
            return 0

        jax.lax.fori_loop(0, n_chunks, body, 0)
        return

    # double-buffered: prefetch slot for chunk i+1 while chunk i drains
    start_in(0)

    def body(i, _):
        slot = jax.lax.rem(i, nbuf)

        @pl.when(i + 1 < n_chunks)
        def _():
            start_in(i + 1)

        pltpu.make_async_copy(
            x_hbm.at[pl.ds(pl.multiple_of(i * chunk, chunk), chunk)],
            vmem.at[slot], in_sem.at[slot]).wait()
        pltpu.make_async_copy(
            vmem.at[slot],
            y_hbm.at[pl.ds(pl.multiple_of(i * chunk, chunk), chunk)],
            out_sem.at[slot]).start()
        pltpu.make_async_copy(
            vmem.at[slot],
            y_hbm.at[pl.ds(pl.multiple_of(i * chunk, chunk), chunk)],
            out_sem.at[slot]).wait()
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


def dma_copy(x, chunk: int, nbuf: int):
    r, n = x.shape
    return pl.pallas_call(
        functools.partial(_dma_copy_kernel, chunk=chunk, nbuf=nbuf),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((r, n), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((nbuf, chunk, n), x.dtype),
            pltpu.SemaphoreType.DMA((nbuf,)),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
        interpret=_INTERPRET,
    )(x)


def _read_kernel(x_ref, y_ref):
    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    y_ref[...] += jnp.sum(x_ref[...], axis=0, keepdims=True)[:, :128]


def pallas_read(x, bm: int, bn: int):
    r, n = x.shape
    return pl.pallas_call(
        _read_kernel,
        grid=(r // bm, n // bn),
        in_specs=[pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 128), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 128), x.dtype),
        interpret=_INTERPRET,
    )(x)


# ----------------------------------------------------------------- timing


def _force(y) -> float:
    """Force TRUE device completion: fetch a data-dependent scalar.

    ``block_until_ready`` is unreliable over the tunneled backend (it can
    return at dispatch-ack, before the chip finishes — bench.py carries the
    same workaround); this round-1 sweep bug produced impossible ~450 TB/s
    readings.  A host fetch of a value that depends on the result cannot
    complete early."""
    return float(np.asarray(y[:1, :1]))


def time_chained(fn, x, iters: int, repeats: int) -> float:
    """Best wall-seconds for `iters` serially-chained applications of fn."""

    @jax.jit
    def run(x0):
        return jax.lax.fori_loop(0, iters, lambda i, y: fn(y), x0)

    _force(run(x))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        _force(run(x))
        best = min(best, time.perf_counter() - t0)
    return best


def time_read(fn, x, iters: int, repeats: int) -> float:
    """Read-only op can't chain through its (small) output: thread the
    accumulator through lax.optimization_barrier with x so iteration i+1's
    read depends on iteration i (no CSE, no overlap)."""

    @jax.jit
    def run(x0):
        def body(i, carry):
            xb, acc = jax.lax.optimization_barrier((x0, carry))
            return acc + fn(xb)

        return jax.lax.fori_loop(
            0, iters, body, jnp.zeros((1, 128), x0.dtype))

    _force(run(x))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        _force(run(x))
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mb", type=int, default=256,
                    help="array size in MiB (f32, [R, 1024])")
    ap.add_argument("--iters", type=int, default=128,
                    help="chained applications per dispatch (>=128 keeps the "
                         "one in-region fetch's 5-30 ms tunnel latency <10%)")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--json", action="store_true",
                    help="one JSON line per variant (for hw_gate logs)")
    args = ap.parse_args()

    rows = args.mb * (1 << 20) // (4 * LANES)
    rows -= rows % 2048  # divisible by every swept block/chunk height
    nbytes = rows * LANES * 4
    dev = jax.devices()[0]
    print(f"# device={dev.platform}:{dev.device_kind if hasattr(dev, 'device_kind') else '?'} "
          f"array=[{rows},{LANES}] f32 = {nbytes / 1e6:.0f} MB, "
          f"iters={args.iters} x best-of-{args.repeats}")

    x = jax.device_put(
        jnp.asarray(np.random.default_rng(0)
                    .standard_normal((rows, LANES), np.float32)), dev)
    jax.block_until_ready(x)

    results = []

    def report(name, dt, traffic_x):
        gbps = traffic_x * nbytes * args.iters / dt / 1e9
        rec = {"variant": name, "gbps": round(gbps, 1),
               "ms_per_pass": round(dt / args.iters * 1e3, 3)}
        results.append(rec)
        print(json.dumps(rec) if args.json else
              f"{name:16s} {gbps:8.1f} GB/s   {rec['ms_per_pass']:8.3f} ms/pass")

    report("xla", time_chained(xla_scale, x, args.iters, args.repeats), 2)

    for bm, bn in ((256, LANES), (512, LANES), (1024, LANES),
                   (512, 512), (1024, 512), (2048, 256), (8, LANES)):
        f = functools.partial(pallas_copy, bm=bm, bn=bn)
        report(f"copy:{bm}x{bn}",
               time_chained(f, x, args.iters, args.repeats), 2)

    for chunk in (256, 512, 1024):
        for nbuf in (1, 2):
            # VMEM: nbuf * chunk * 1024 * 4 B  (<= 8 MB at 1024x2)
            f = functools.partial(dma_copy, chunk=chunk, nbuf=nbuf)
            report(f"dma{nbuf}:{chunk}",
                   time_chained(f, x, args.iters, args.repeats), 2)

    for bm, bn in ((512, LANES), (2048, LANES)):
        f = functools.partial(pallas_read, bm=bm, bn=bn)
        report(f"read:{bm}x{bn}", time_read(f, x, args.iters, args.repeats), 1)

    best = max(results, key=lambda r: r["gbps"])
    print(json.dumps({"best_variant": best["variant"],
                      "best_gbps": best["gbps"],
                      "spec_gbps": 819,
                      "pct_of_spec": round(100 * best["gbps"] / 819, 1)}))


if __name__ == "__main__":
    main()
