"""Host<->device transfer shims for the tunneled TPU boundary.

Verified transfer support of the tunneled backend (axon) in this environment
(2026-08-19, bit-perfect round-trips + device compute): float32, uint8, int8,
int16, float16, bfloat16.  Still UNSUPPORTED and shimmed here: complex64,
int32, bool, float64 — those transfers (and eager creation of such constants,
which embeds them via a transfer) raise UNIMPLEMENTED.  These shims keep every
unsupported host boundary f32:

  * complex arrays cross as stacked (real, imag) f32 pairs and are
    (re)combined inside a jitted program;
  * non-f32 device arrays are fetched by casting to f32 on device first;
  * state pytrees with complex/int leaves are *initialized inside jit* so the
    zeros never cross the boundary.

On CPU (tests) these are near-zero-cost pass-throughs.  This is also just
good TPU hygiene: complex support on TPU is emulated as f32 pairs anyway.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _combine_complex(ri: jnp.ndarray) -> jnp.ndarray:
    """[2, ...] f32 -> [...] complex64 (on device)."""
    return jax.lax.complex(ri[0], ri[1])


@jax.jit
def _split_complex(x: jnp.ndarray) -> jnp.ndarray:
    """[...] complex64 -> [2, ...] f32 (on device)."""
    return jnp.stack([jnp.real(x), jnp.imag(x)])


@jax.jit
def _to_f32(x: jnp.ndarray) -> jnp.ndarray:
    return x.astype(jnp.float32)


def device_put_complex(x: np.ndarray) -> jnp.ndarray:
    """Host complex -> device complex64, crossing the wire as f32 pairs."""
    ri = np.ascontiguousarray(
        np.stack([np.real(x), np.imag(x)]), dtype=np.float32
    )
    return _combine_complex(jnp.asarray(ri))


def fetch(x) -> np.ndarray:
    """Device array -> host numpy, using only f32 transfers."""
    if isinstance(x, np.ndarray):
        return x
    dtype = x.dtype
    if dtype == jnp.float32:
        return np.asarray(x)
    if jnp.issubdtype(dtype, jnp.complexfloating):
        ri = np.asarray(_split_complex(x))
        return (ri[0] + 1j * ri[1]).astype(np.complex64)
    # bool / ints / f64: go through f32 (values in our pipelines are small
    # counters and flags, exactly representable)
    out = np.asarray(_to_f32(x))
    return out.astype(np.dtype(dtype.name))


def fetch_tree(tree):
    return jax.tree.map(fetch, tree)


@jax.jit
def _take_rows(y: jnp.ndarray, sel_f32: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(y, sel_f32.astype(jnp.int32), axis=0)


def take_rows(y: jnp.ndarray, select) -> jnp.ndarray:
    """Row-select a device array with host indices, f32-safe: the indices
    cross the tunneled boundary as f32 and cast to int32 ON DEVICE (an
    eager int32 index array would raise UNIMPLEMENTED, see module doc)."""
    return _take_rows(y, jnp.asarray(np.asarray(select, np.float32)))


def init_on_device(init_fn, *args, **static_kwargs):
    """Run a zeros/constants-building init function inside jit so non-f32
    constants never cross the host boundary."""
    return jax.jit(functools.partial(init_fn, *args, **static_kwargs))()


def pack_iq_u8(iq_u8: np.ndarray) -> np.ndarray:
    """Pack raw interleaved u8 IQ into one f32 word per complex sample.

    iq_u8: [..., N, 2] (I, Q byte pairs, the radio's native capture format,
    app.cpp:57-63).  Returns [..., N] f32 with w = I*256 + Q — exact
    integers < 2^16, so they survive the f32-only host boundary bit-perfectly
    and cost HALF the bytes of (re, im) f32 planes.  The front-end kernel
    (kernels/frontend_pallas.py) unpacks and recenters by -127 in-VMEM.
    """
    iq = np.asarray(iq_u8)
    assert iq.shape[-1] == 2 and iq.dtype == np.uint8
    w = iq[..., 0].astype(np.float32)
    w *= 256.0
    w += iq[..., 1]
    return w


def unpack_iq_words(w):
    """Inverse of :func:`pack_iq_u8` as traceable arithmetic (works both in
    XLA and inside Pallas kernels): packed words -> centered (re, im) f32.
    Exact: *2^-8, floor and the subtractions are error-free on integers
    < 2^16."""
    import jax.numpy as jnp

    ihi = jnp.floor(w * jnp.float32(1.0 / 256.0))
    return ihi - 127.0, (w - ihi * 256.0) - 127.0


def split_iq_i8(iq_u8: np.ndarray) -> np.ndarray:
    """Raw 8-bit ingest planes: u8 IQ -> [2, ..., N] int8 of (I-128, Q-128).

    The tunneled host boundary moves int8 bit-exactly (verified 2026-08-19;
    the round-1 'f32-only boundary' premise behind :func:`pack_iq_u8` is
    obsolete), so the radio's native bytes can travel and live in HBM at
    2 bytes/complex sample — HALF the packed-f32-word form.  The shift is
    -128 (not the reference's -127, app.cpp:57-63) because 255-127 = 128
    overflows int8; the kernel adds the +1 back after the f32 cast
    (see i8_planes_to_f32).
    """
    iq = np.asarray(iq_u8)
    assert iq.shape[-1] == 2 and iq.dtype == np.uint8
    planes = np.moveaxis(iq, -1, 0).astype(np.int16) - 128
    return np.ascontiguousarray(planes.astype(np.int8))


def i8_planes_to_f32(x8):
    """Traceable inverse of :func:`split_iq_i8` -> centered (re, im) f32
    planes (u8 - 127, app.cpp:57-63).  Works in XLA and inside Pallas
    kernels (Mosaic has no direct 8-bit -> f32 cast; hop through i32)."""
    import jax.numpy as jnp

    def f(p):
        return p.astype(jnp.int32).astype(jnp.float32) + 1.0

    return f(x8[0]), f(x8[1])


def pack_iq_u8_23(iq_u8: np.ndarray) -> np.ndarray:
    """Dense 3-samples-in-2-words packing: 2/3 the bytes of pack_iq_u8.

    f32 carries 24-bit integers exactly, so one word can hold THREE bytes
    (pack_iq_u8 uses only 16 of them).  Layout is chosen so the front-end
    kernel can extract stride-3 RESIDUE subsequences with pure elementwise
    arithmetic — no cross-lane interleave:

      iq_u8: [..., N, 2] with N % 3 == 0.  Returns [..., 2, N/3] f32 where
        out[0, t] = I[3t]*2^16 + I[3t+1]*2^8 + I[3t+2]   (I-plane words)
        out[1, t] = Q[3t]*2^16 + Q[3t+1]*2^8 + Q[3t+2]   (Q-plane words)

    Each byte FIELD of a word stream is one residue subsequence: field k of
    out[p, :] is plane p's samples at time 3t+k, already in time order
    within the residue.  See unpack_iq_words_23.
    """
    iq = np.asarray(iq_u8)
    assert iq.shape[-1] == 2 and iq.dtype == np.uint8
    n = iq.shape[-2]
    assert n % 3 == 0, "dense packing needs N % 3 == 0"
    tri = iq.reshape(*iq.shape[:-2], n // 3, 3, 2).astype(np.float32)
    w = tri[..., 0, :] * 65536.0 + tri[..., 1, :] * 256.0 + tri[..., 2, :]
    # [..., N/3, 2] -> [..., 2, N/3]
    return np.moveaxis(w, -1, -2)


def unpack_iq_words_23(w):
    """Traceable inverse of :func:`pack_iq_u8_23` -> centered residue planes.

    w: [2, ..., T] (I-words, Q-words).  Returns ((i0, i1, i2), (q0, q1, q2)),
    six f32 arrays of shape [..., T]: plane residues, where ik[t] is
    I[3t+k] - 127.  All arithmetic exact on integers < 2^24.
    """
    import jax.numpy as jnp

    def fields(words):
        b0 = jnp.floor(words * jnp.float32(1.0 / 65536.0))
        rem = words - b0 * 65536.0
        b1 = jnp.floor(rem * jnp.float32(1.0 / 256.0))
        b2 = rem - b1 * 256.0
        return b0 - 127.0, b1 - 127.0, b2 - 127.0

    return fields(w[0]), fields(w[1])
