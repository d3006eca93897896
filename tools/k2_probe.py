"""Engine decomposition + IIR-restructure A/B for the K2 mid-end kernel.

K2 (kernels/midend_pallas.py: ds2 + de-emphasis IIR + Hilbert + pilot peak
IIR + pilot phase) costs ~2.6 ms per 2^28-sample pass in-chain (clean
round-3 table, docs/PERF.md).  Variants isolate each engine:

  stream     read the fm_demod tile, write 3 stub outputs -> DMA floor
  ds2        + the ds2 banded dots
  hilb       + the Hilbert banded dots (deemph/peak skipped)
  full       the production body (_midend_body: + deemph IIR + peak IIR
             on re and im SEQUENTIALLY + atan2 + power acc)
  stackpeak  full, but the pilot peak IIR runs ONCE on sublane-stacked
             [2c, L] planes (one serial Toeplitz chain instead of two) —
             halves the IIR dependency chains if they are latency-bound

Usage: python -m tools.k2_probe [channels=1024] [b4=65536]
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

from fm_radio_tpu.kernels.frontend_pallas import _dot3, _split_bf16
from fm_radio_tpu.kernels.midend_pallas import (
    _LI,
    _NO,
    _TB,
    _band_m,
    _dot4,
    _iir_tile_mats,
    _midend_body,
)
from fm_radio_tpu.kernels.pll_pallas import _atan2
from fm_radio_tpu.ops.design import create_fir_lpf, create_iir_single_pole_lpf

_INTERPRET = os.environ.get("FMTPU_INTERPRET") == "1"


def build(c, b4, mode, c_blk=128, t_blk=1024):
    taps2 = jnp.asarray(create_fir_lpf(64, 0.25), jnp.float32)
    taps_h = jnp.asarray(create_fir_lpf(65, 0.3), jnp.float32)  # odd, 65-tap
    band2 = _band_m(taps2, 2)
    band3 = _band_m(taps_h, 1)
    # restruct:<li>[:stk] sizes the IIR Toeplitz tiles at li instead of _LI
    li = int(mode.split(":")[1]) if mode.startswith("restruct") else _LI
    stacked = mode.endswith("stk")
    b_de, a_de = create_iir_single_pole_lpf(2.0 * 3200.0 / 128000.0)
    t1_m, hm1, pm1 = _iir_tile_mats(b_de, a_de, li)
    aux1 = jnp.concatenate([hm1, pm1], axis=0)
    # a sharp peak-like biquad for the probe (exact coefficients irrelevant
    # to timing; shape/structure matches the production peak filter)
    tp_m, hm_p, pm_p = _iir_tile_mats(
        jnp.asarray([0.001, 0.0, -0.001], jnp.float32),
        jnp.asarray([1.0, -1.9989, 0.9998], jnp.float32), li)
    auxp = jnp.concatenate([hm_p, pm_p], axis=0)
    grid = (c // c_blk, b4 // t_blk)
    l = t_blk // 2
    hilb_delay = (65 - 1) // 2

    def kern(x_ref, band2_ref, band3_ref, t1_ref, aux1_ref, tp_ref, auxp_ref,
             re_ref, im_ref, th_ref, buf2, buf3, st, acc):
        x = x_ref[...]
        if mode == "stream":
            re_ref[...] = x[:, :l]
            im_ref[...] = x[:, l:]
            th_ref[...] = x[:, :l]
            return
        if mode in ("ds2", "hilb"):
            buf2[:, _TB:] = x
            b2_hi, b2_lo = _split_bf16(band2_ref[...], _INTERPRET)
            x2_hi, x2_lo = _split_bf16(buf2[...], _INTERPRET)
            w2 = _NO * 2 + _TB
            parts = []
            for s in range(t_blk // (_NO * 2)):
                w0 = s * _NO * 2
                parts.append(_dot3(x2_hi[:, w0 : w0 + w2],
                                   x2_lo[:, w0 : w0 + w2], b2_hi, b2_lo))
            fm_out = jnp.concatenate(parts, -1) if len(parts) > 1 else parts[0]
            buf2[:, :_TB] = buf2[:, t_blk:]
            if mode == "ds2":
                re_ref[...] = fm_out
                im_ref[...] = fm_out
                th_ref[...] = fm_out
                return
            buf3[:, _TB:] = fm_out
            b3_hi, b3_lo = _split_bf16(band3_ref[...], _INTERPRET)
            x3_hi, x3_lo = _split_bf16(buf3[...], _INTERPRET)
            w3 = _NO + _TB
            parts = []
            for s in range(l // _NO):
                w0 = s * _NO
                parts.append(_dot3(x3_hi[:, w0 : w0 + w3],
                                   x3_lo[:, w0 : w0 + w3], b3_hi, b3_lo))
            hi_im = jnp.concatenate(parts, -1) if len(parts) > 1 else parts[0]
            buf3[:, :_TB] = buf3[:, l:]
            re_ref[...] = buf3[:, _TB - hilb_delay : _TB - hilb_delay + l]
            im_ref[...] = hi_im
            th_ref[...] = hi_im
            return
        if mode == "full":
            hi_re, hi_im, theta = _midend_body(
                x, band2_ref, band3_ref, t1_ref, aux1_ref, tp_ref, auxp_ref,
                buf2, buf3, st, acc,
                t_blk=t_blk, use_deemph=True, hilb_delay=hilb_delay,
                interp=_INTERPRET)
            re_ref[...] = hi_re
            im_ref[...] = hi_im
            th_ref[...] = theta
            return
        assert mode.startswith("restruct")
        # parameterized restructure: li = IIR Toeplitz sub-chunk width
        # (bigger -> SHORTER serial chain, more MXU FLOPs: 2*li/sample),
        # :stk = ONE peak chain over [2c, L] instead of re/im serially
        buf2[:, _TB:] = x
        b2_hi, b2_lo = _split_bf16(band2_ref[...], _INTERPRET)
        x2_hi, x2_lo = _split_bf16(buf2[...], _INTERPRET)
        w2 = _NO * 2 + _TB
        parts = []
        for s in range(t_blk // (_NO * 2)):
            w0 = s * _NO * 2
            parts.append(_dot3(x2_hi[:, w0 : w0 + w2],
                               x2_lo[:, w0 : w0 + w2], b2_hi, b2_lo))
        fm_out = jnp.concatenate(parts, -1) if len(parts) > 1 else parts[0]
        t1_hi, t1_lo = _split_bf16(t1_ref[...], _INTERPRET)
        hm1 = aux1_ref[0:1, :]
        pm1 = aux1_ref[1:2, :]
        parts = []
        for s in range(l // li):
            xs = fm_out[:, s * li : (s + 1) * li]
            f_hi, f_lo = _split_bf16(xs, _INTERPRET)
            y = _dot4(f_hi, f_lo, t1_hi, t1_lo)
            y = y + st[:c_blk, 0:1] * hm1 + st[:c_blk, 1:2] * pm1
            st[:c_blk, 0:1] = xs[:, li - 1 :]
            st[:c_blk, 1:2] = y[:, li - 1 :]
            parts.append(y)
        fm_out = jnp.concatenate(parts, -1) if len(parts) > 1 else parts[0]
        buf3[:, _TB:] = fm_out
        b3_hi, b3_lo = _split_bf16(band3_ref[...], _INTERPRET)
        x3_hi, x3_lo = _split_bf16(buf3[...], _INTERPRET)
        w3 = _NO + _TB
        parts = []
        for s in range(l // _NO):
            w0 = s * _NO
            parts.append(_dot3(x3_hi[:, w0 : w0 + w3],
                               x3_lo[:, w0 : w0 + w3], b3_hi, b3_lo))
        hi_im = jnp.concatenate(parts, -1) if len(parts) > 1 else parts[0]
        hi_re = buf3[:, _TB - hilb_delay : _TB - hilb_delay + l]
        buf2[:, :_TB] = buf2[:, t_blk:]
        buf3[:, :_TB] = buf3[:, l:]
        tp_hi, tp_lo = _split_bf16(tp_ref[...], _INTERPRET)
        hm_p = auxp_ref[0:2, :]
        pm_p = auxp_ref[2:4, :]

        def peak(plane, r0, r1):
            parts = []
            for s in range(l // li):
                xs = plane[:, s * li : (s + 1) * li]
                p_hi, p_lo = _split_bf16(xs, _INTERPRET)
                y = _dot4(p_hi, p_lo, tp_hi, tp_lo)
                y = (y + st[r0:r1, 2:3] * hm_p[0:1, :]
                     + st[r0:r1, 3:4] * hm_p[1:2, :]
                     + st[r0:r1, 4:5] * pm_p[0:1, :]
                     + st[r0:r1, 5:6] * pm_p[1:2, :])
                st[r0:r1, 3:4] = xs[:, li - 2 : li - 1]
                st[r0:r1, 2:3] = xs[:, li - 1 :]
                st[r0:r1, 5:6] = y[:, li - 2 : li - 1]
                st[r0:r1, 4:5] = y[:, li - 1 :]
                parts.append(y)
            return jnp.concatenate(parts, -1) if len(parts) > 1 else parts[0]

        if stacked:
            pk = peak(jnp.concatenate([hi_re, hi_im], axis=0), 0, 2 * c_blk)
            pk_re, pk_im = pk[:c_blk], pk[c_blk:]
        else:
            pk_re = peak(hi_re, 0, c_blk)
            pk_im = peak(hi_im, c_blk, 2 * c_blk)
        theta = _atan2(pk_im, pk_re) * jnp.float32(1.0 / (2.0 * np.pi))
        acc[...] = acc[...] + jnp.sum(
            pk_re * pk_re + pk_im * pk_im, -1, keepdims=True)
        re_ref[...] = hi_re
        im_ref[...] = hi_im
        th_ref[...] = theta

    # restruct state lives on [2c, cols] (re rows | im rows)
    st_rows = 2 * c_blk if mode.startswith("restruct") else c_blk
    cspec = lambda shape: pl.BlockSpec(shape, lambda ci, ti: (0, 0),
                                       memory_space=pltpu.VMEM)
    tspec = lambda div: pl.BlockSpec((c_blk, t_blk // div),
                                     lambda ci, ti: (ci, ti),
                                     memory_space=pltpu.VMEM)

    def apply(x):
        return pl.pallas_call(
            kern, grid=grid,
            in_specs=[
                tspec(1),
                cspec((_NO * 2 + _TB, _NO)), cspec((_NO + _TB, _NO)),
                cspec((li, li)), cspec((2, li)),
                cspec((li, li)), cspec((4, li)),
            ],
            out_specs=[tspec(2)] * 3,
            out_shape=[jax.ShapeDtypeStruct((c, b4 // 2), jnp.float32)] * 3,
            scratch_shapes=[
                pltpu.VMEM((c_blk, _TB + t_blk), jnp.float32),
                pltpu.VMEM((c_blk, _TB + l), jnp.float32),
                pltpu.VMEM((st_rows, 10), jnp.float32),
                pltpu.VMEM((c_blk, 1), jnp.float32),
            ],
            interpret=_INTERPRET,
        )(x, band2, band3, t1_m, aux1, tp_m, auxp)

    return apply


def time_variant(apply_fn, x, iters, repeats=3):
    @jax.jit
    def run(x0):
        def body(i, carry):
            xb, acc = jax.lax.optimization_barrier((x0, carry))
            y = apply_fn(xb)
            return acc + y[0][0, 0] + y[1][0, 0] + y[2][0, 0]

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(np.asarray(run(x)))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(np.asarray(run(x)))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    c = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    b4 = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
    iters = 2 if _INTERPRET else int(os.environ.get("FMTPU_PROBE_ITERS", "96"))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((c, b4)).astype(np.float32))
    gb_in = c * b4 * 4 / 1e9
    print(f"# K2 [C={c}, B4={b4}] input={gb_in:.2f} GB/pass iters={iters} "
          f"(+3x output at B4/2)")
    for mode in ("stream", "ds2", "hilb", "full",
                 "restruct:64", "restruct:64:stk",
                 "restruct:128", "restruct:128:stk",
                 "restruct:256", "restruct:256:stk",
                 "restruct:512", "restruct:512:stk"):
        try:
            dt = time_variant(build(c, b4, mode), x, iters)
        except Exception as e:
            print(f"{mode} FAIL {type(e).__name__}: {str(e)[:90]}", flush=True)
            continue
        print(f"{mode:10s} {dt * 1e3:8.3f} ms/pass", flush=True)


if __name__ == "__main__":
    main()
