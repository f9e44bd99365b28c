"""ctypes binding for the native feature-cache loader (native/lvr_loader.cpp).

- `batch_load(paths, shape, dtype)`: threaded read of N .npy files into one
  contiguous batch array (one device upload instead of N python loads —
  replaces the per-sample torch.load IO of `train.py:807` /
  `pck_train.py:39`).
- `pack(paths, out)` / `PackedCache`: one contiguous mmap-backed cache file
  with random-access batched gathers for the training/serving hot loop.

Builds on demand (`make -C native`); every entry point falls back to numpy
when the shared library is unavailable, so the framework never hard-depends
on the native build.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SO_PATH = os.path.join(_REPO_ROOT, "native", "liblvr_loader.so")
_LIB = None


def _load_lib(build: bool = True):
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_SO_PATH) and build:
        try:
            subprocess.run(["make", "-C",
                            os.path.join(_REPO_ROOT, "native")],
                           check=True, capture_output=True)
        except Exception:
            return None
    if not os.path.exists(_SO_PATH):
        return None
    lib = ctypes.CDLL(_SO_PATH)
    lib.lvr_batch_load.restype = ctypes.c_int
    lib.lvr_batch_load.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int]
    lib.lvr_pack.restype = ctypes.c_int
    lib.lvr_pack.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int64,
        ctypes.c_char_p, ctypes.c_int]
    lib.lvr_pack_open.restype = ctypes.c_void_p
    lib.lvr_pack_open.argtypes = [ctypes.c_char_p]
    lib.lvr_pack_count.restype = ctypes.c_int64
    lib.lvr_pack_count.argtypes = [ctypes.c_void_p]
    lib.lvr_pack_item_bytes.restype = ctypes.c_int64
    lib.lvr_pack_item_bytes.argtypes = [ctypes.c_void_p]
    lib.lvr_pack_gather.restype = ctypes.c_int
    lib.lvr_pack_gather.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
        ctypes.c_void_p]
    lib.lvr_pack_close.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def native_available() -> bool:
    return _load_lib() is not None


def _c_paths(paths: Sequence[str]):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [p.encode() for p in paths]
    return arr


def batch_load(paths: Sequence[str], item_shape: Tuple[int, ...],
               dtype=np.float32, n_threads: int = 8) -> np.ndarray:
    """Load N same-shape .npy files into one [N, *item_shape] array."""
    out = np.empty((len(paths), *item_shape), dtype)
    lib = _load_lib()
    if lib is None:
        for i, p in enumerate(paths):
            out[i] = np.load(p)
        return out
    item_bytes = out[0].nbytes
    fails = lib.lvr_batch_load(_c_paths(paths), len(paths),
                               out.ctypes.data_as(ctypes.c_void_p),
                               item_bytes, n_threads)
    if fails:
        raise IOError(f"native batch_load: {fails} files failed")
    return out


def pack(paths: Sequence[str], item_shape: Tuple[int, ...], out_path: str,
         dtype=np.float32, n_threads: int = 8) -> None:
    """Pack N same-shape .npy files into one contiguous cache file."""
    item_bytes = int(np.prod(item_shape)) * np.dtype(dtype).itemsize
    lib = _load_lib()
    if lib is None:
        data = batch_load(paths, item_shape, dtype, n_threads)
        with open(out_path, "wb") as f:
            f.write((0x4c56525041434b31).to_bytes(8, "little"))
            f.write(len(paths).to_bytes(8, "little"))
            f.write(item_bytes.to_bytes(8, "little"))
            f.write(data.tobytes())
        return
    fails = lib.lvr_pack(_c_paths(paths), len(paths), item_bytes,
                         out_path.encode(), n_threads)
    if fails:
        raise IOError(f"native pack: {fails} files failed")


class PackedCache:
    """Random-access batched gathers from a packed cache file."""

    def __init__(self, path: str, item_shape: Tuple[int, ...],
                 dtype=np.float32):
        self.item_shape = tuple(item_shape)
        self.dtype = np.dtype(dtype)
        self._lib = _load_lib()
        if self._lib is not None:
            self._h = self._lib.lvr_pack_open(path.encode())
            if not self._h:
                raise IOError(f"cannot open pack {path}")
            self.count = int(self._lib.lvr_pack_count(self._h))
        else:
            self._mm = np.memmap(path, np.uint8, "r")
            self.count = int.from_bytes(self._mm[8:16].tobytes(), "little")
            self._item_bytes = int.from_bytes(self._mm[16:24].tobytes(),
                                              "little")

    def gather(self, indices: Sequence[int]) -> np.ndarray:
        out = np.empty((len(indices), *self.item_shape), self.dtype)
        if self._lib is not None:
            idx = (ctypes.c_int64 * len(indices))(*indices)
            rc = self._lib.lvr_pack_gather(
                self._h, idx, len(indices),
                out.ctypes.data_as(ctypes.c_void_p))
            if rc:
                raise IOError("pack gather failed")
            return out
        ib = self._item_bytes
        for i, j in enumerate(indices):
            raw = self._mm[24 + j * ib:24 + (j + 1) * ib]
            out[i] = np.frombuffer(raw.tobytes(), self.dtype).reshape(
                self.item_shape)
        return out

    def close(self):
        if self._lib is not None and self._h:
            self._lib.lvr_pack_close(self._h)
            self._h = None
