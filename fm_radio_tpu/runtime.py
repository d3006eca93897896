"""ctypes bindings for the native runtime (runtime/fmtpu_runtime.cpp).

The library is built on first use (``make -C runtime``) and cached.  Every
facility has a pure-Python fallback elsewhere in the package (io/pcm.py,
io/wav.py, rds/*), so the framework degrades gracefully without a compiler;
the native paths exist because the reference's runtime is native C++ and the
streaming/bit-level layers should not bottleneck 1000-channel decode on the
Python interpreter.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

import numpy as np

_RUNTIME_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "runtime")
_LIB_PATH = os.path.join(_RUNTIME_DIR, "libfmtpu_runtime.so")


class NativeRuntimeUnavailable(RuntimeError):
    pass


@lru_cache(maxsize=1)
def load() -> ctypes.CDLL:
    """Build (if needed) and load the native runtime library.

    ``make`` runs unconditionally (a no-op when the .so is newer than the
    source) so a stale library can never mask source drift; the .so itself
    is a build artifact and is not tracked in git.  The build is serialized
    across processes with an flock'd lockfile — concurrent loaders (the
    multihost launcher spawns several workers at once) must not race make
    and dlopen a half-written .so.
    """
    lock_path = os.path.join(_RUNTIME_DIR, ".build.lock")
    try:
        with open(lock_path, "w") as lock_f:
            import fcntl

            fcntl.flock(lock_f, fcntl.LOCK_EX)
            try:
                subprocess.run(
                    ["make", "-C", _RUNTIME_DIR],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except (subprocess.SubprocessError, FileNotFoundError) as e:
                if not os.path.exists(_LIB_PATH):
                    raise NativeRuntimeUnavailable(
                        f"cannot build native runtime: {e}") from e
                import warnings

                warnings.warn(
                    f"native runtime rebuild failed ({e}); loading the "
                    f"EXISTING {_LIB_PATH}, which may be stale vs source",
                    RuntimeWarning,
                    stacklevel=2,
                )
    except OSError as e:
        # lockfile not creatable (read-only checkout): fall back to loading
        # whatever exists rather than failing the whole native path
        if not os.path.exists(_LIB_PATH):
            raise NativeRuntimeUnavailable(
                f"cannot build native runtime: {e}") from e
    lib = ctypes.CDLL(_LIB_PATH)

    lib.rt_u8_to_f32_center.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
    ]
    lib.rt_pcm_open.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_int]
    lib.rt_pcm_open.restype = ctypes.c_void_p
    lib.rt_pcm_next_block_f32.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
    lib.rt_pcm_next_block_f32.restype = ctypes.c_int
    lib.rt_pcm_next_block_packed_f32.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)
    ]
    lib.rt_pcm_next_block_packed_f32.restype = ctypes.c_int
    lib.rt_pcm_next_block_i8.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int8)
    ]
    lib.rt_pcm_next_block_i8.restype = ctypes.c_int
    lib.rt_pcm_close.argtypes = [ctypes.c_void_p]

    lib.rt_wav_open.argtypes = [ctypes.c_char_p, ctypes.c_int32, ctypes.c_int16]
    lib.rt_wav_open.restype = ctypes.c_void_p
    lib.rt_wav_write_f32.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
    ]
    lib.rt_wav_close.argtypes = [ctypes.c_void_p]

    lib.rt_manchester_new.restype = ctypes.c_void_p
    lib.rt_manchester_free.argtypes = [ctypes.c_void_p]
    lib.rt_manchester_process.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
    ]
    lib.rt_manchester_process.restype = ctypes.c_int64

    lib.rt_crc10.argtypes = [ctypes.c_uint32]
    lib.rt_crc10.restype = ctypes.c_uint16
    lib.rt_group_sync_new.restype = ctypes.c_void_p
    lib.rt_group_sync_free.argtypes = [ctypes.c_void_p]
    lib.rt_group_sync_process.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint16),
        ctypes.c_int64,
    ]
    lib.rt_group_sync_process.restype = ctypes.c_int64
    return lib


def available() -> bool:
    try:
        load()
        return True
    except NativeRuntimeUnavailable:
        return False


# ---------------------------------------------------------------------------
# Pythonic wrappers
# ---------------------------------------------------------------------------


class NativePcmReader:
    """Background-prefetching pcm block source (centered complex64 blocks)."""

    def __init__(self, path: str, block_size: int, n_prefetch: int = 4):
        self._lib = load()
        self.block_size = block_size
        self._h = self._lib.rt_pcm_open(path.encode(), block_size, n_prefetch)
        if not self._h:
            raise OSError(f"cannot open {path}")
        self._buf = np.empty(2 * block_size, dtype=np.float32)

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        ok = self._lib.rt_pcm_next_block_f32(
            self._h, self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )
        if not ok:
            raise StopIteration
        return self._buf[0::2] + 1j * self._buf[1::2].astype(np.float32)

    def next_packed(self) -> np.ndarray | None:
        """Next block as packed u8 words (w = I*256 + Q, one f32/sample —
        utils/transfer.pack_iq_u8 format): half the host->device bytes of
        f32 planes (the round-2 format; :meth:`next_i8` is the round-3
        production ingest at half these bytes again).  None at end of
        stream."""
        out = np.empty(self.block_size, dtype=np.float32)
        ok = self._lib.rt_pcm_next_block_packed_f32(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )
        return out if ok else None

    def next_i8(self) -> np.ndarray | None:
        """Next block as [2, 1, block_size] int8 (I-128, Q-128) planes
        (utils/transfer.split_iq_i8 format, single channel) — half the
        packed-word bytes; feeds the int8-direct front end when
        cfg.frontend_int8 is set.  None at end of stream."""
        out = np.empty((2, 1, self.block_size), dtype=np.int8)
        ok = self._lib.rt_pcm_next_block_i8(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8))
        )
        return out if ok else None

    def close(self):
        if self._h:
            self._lib.rt_pcm_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeWavWriter:
    def __init__(self, path: str, sample_rate: int, channels: int = 2):
        self._lib = load()
        self._h = self._lib.rt_wav_open(path.encode(), sample_rate, channels)
        if not self._h:
            raise OSError(f"cannot open {path}")
        self.channels = channels

    def write(self, frames: np.ndarray) -> None:
        """frames: [N, channels] float32 in [-1, 1]."""
        f = np.ascontiguousarray(frames, dtype=np.float32)
        self._lib.rt_wav_write_f32(
            self._h,
            f.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            f.shape[0],
        )

    def close(self):
        if self._h:
            self._lib.rt_wav_close(self._h)
            self._h = None


class NativeRDSBitDecoder:
    """Native Manchester + group sync: soft symbols in, groups out."""

    def __init__(self):
        self._lib = load()
        self._m = self._lib.rt_manchester_new()
        self._g = self._lib.rt_group_sync_new()
        self._bits = np.zeros(1 << 16, dtype=np.uint8)  # packed bit staging
        self._nbits = 0

    # The bit staging buffer holds 2^16 bytes = 2^19 bits; one bit lands per
    # 2 symbols, so cap each native call well under 2^20 symbols (otherwise
    # the C loop would write past the numpy buffer).
    _MAX_SYMBOLS_PER_CALL = 1 << 19

    def process_symbols(self, symbols: np.ndarray) -> list[dict]:
        s = np.ascontiguousarray(symbols, dtype=np.float32)
        groups: list[dict] = []
        for i0 in range(0, len(s), self._MAX_SYMBOLS_PER_CALL):
            groups.extend(
                self._process_chunk(s[i0 : i0 + self._MAX_SYMBOLS_PER_CALL])
            )
        return groups

    def _process_chunk(self, s: np.ndarray) -> list[dict]:
        self._nbits = self._lib.rt_manchester_process(
            self._m,
            s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(s),
            self._bits.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            self._nbits,
        )
        n_bytes = self._nbits // 8
        if n_bytes == 0:
            return []
        # worst case one group per 104 bits — size the output for the chunk
        # instead of a fixed cap that silently drops groups
        max_groups = n_bytes * 8 // 104 + 2
        out = np.zeros(12 * max_groups, dtype=np.uint16)
        n = self._lib.rt_group_sync_process(
            self._g,
            self._bits.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n_bytes,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            max_groups,
        )
        # keep leftover bits (not full bytes) at the front of the staging buf
        rem_bits = self._nbits - 8 * n_bytes
        if rem_bits:
            self._bits[0] = self._bits[n_bytes]
        self._nbits = rem_bits
        groups = []
        names = ["A", "B", "C", "C1", "D"]
        for i in range(n):
            o = out[12 * i : 12 * (i + 1)]
            groups.append(
                {
                    "data": [int(v) for v in o[0:4]],
                    "types": [names[v] for v in o[4:8]],
                    "valid": [bool(v) for v in o[8:12]],
                }
            )
        return groups

    def __del__(self):
        try:
            self._lib.rt_manchester_free(self._m)
            self._lib.rt_group_sync_free(self._g)
        except Exception:
            pass
