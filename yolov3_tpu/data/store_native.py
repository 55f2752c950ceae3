"""ctypes bindings for the native YDB engine (native/yolodb.cpp).

Same on-disk format as the pure-Python `store.py`; `store.open_reader`
prefers this reader automatically when the shared library has been built
(`native/build.sh`). Reads are zero-copy views into the C++ mmap.
"""

from __future__ import annotations

import ctypes
import os
import numpy as np

from typing import List, Optional, Sequence

_LIB = None
_LIB_TRIED = False


def _lib_path() -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(root, "native", "build", "libyolodb.so")


def _load():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    path = _lib_path()
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.ydb_reader_open.restype = ctypes.c_void_p
    lib.ydb_reader_open.argtypes = [ctypes.c_char_p]
    lib.ydb_reader_count.restype = ctypes.c_uint64
    lib.ydb_reader_count.argtypes = [ctypes.c_void_p]
    lib.ydb_reader_key.restype = ctypes.c_int
    lib.ydb_reader_key.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_uint32)]
    lib.ydb_reader_get.restype = ctypes.c_int
    lib.ydb_reader_get.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_uint64)]
    lib.ydb_reader_map.restype = None
    lib.ydb_reader_map.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_uint64)]
    lib.ydb_reader_get_batch.restype = ctypes.c_uint64
    lib.ydb_reader_get_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64)]
    lib.ydb_reader_close.restype = None
    lib.ydb_reader_close.argtypes = [ctypes.c_void_p]
    lib.ydb_writer_open.restype = ctypes.c_void_p
    lib.ydb_writer_open.argtypes = [ctypes.c_char_p]
    lib.ydb_writer_put.restype = ctypes.c_int
    lib.ydb_writer_put.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint32,
        ctypes.c_char_p, ctypes.c_uint64]
    lib.ydb_writer_flush.restype = ctypes.c_int
    lib.ydb_writer_flush.argtypes = [ctypes.c_void_p]
    lib.ydb_writer_close.restype = ctypes.c_int
    lib.ydb_writer_close.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


class NativeRecordReader:
    """Drop-in for `store.RecordReader` over the C++ engine."""

    def __init__(self, db_path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native yolodb library not built")
        if not os.path.isdir(db_path):
            raise FileNotFoundError(f"Missing database: {db_path}")
        self._lib = lib
        self._h = lib.ydb_reader_open(db_path.encode())
        if not self._h:
            raise ValueError(f"Not a YDB database: {db_path}")
        # one long-lived zero-copy view over the whole data-log mapping;
        # get/get_batch serve cheap slices of it
        base = ctypes.c_void_p()
        mlen = ctypes.c_uint64()
        lib.ydb_reader_map(self._h, ctypes.byref(base), ctypes.byref(mlen))
        self._map_view = memoryview(
            (ctypes.c_char * mlen.value).from_address(base.value))

    def __len__(self) -> int:
        return int(self._lib.ydb_reader_count(self._h))

    def keys(self) -> List[bytes]:
        out = []
        kp = ctypes.c_char_p()
        kl = ctypes.c_uint32()
        for i in range(len(self)):
            if self._lib.ydb_reader_key(self._h, i, ctypes.byref(kp),
                                        ctypes.byref(kl)) == 0:
                out.append(ctypes.string_at(kp, kl.value))
        return out

    def get(self, key: bytes) -> Optional[memoryview]:
        if isinstance(key, str):
            key = key.encode("ascii")
        vp = ctypes.c_void_p()
        vl = ctypes.c_uint64()
        rc = self._lib.ydb_reader_get(self._h, key, len(key),
                                      ctypes.byref(vp), ctypes.byref(vl))
        if rc != 0:
            return None
        buf = (ctypes.c_char * vl.value).from_address(vp.value)
        return memoryview(buf)  # zero-copy view into the C++ mmap

    def get_batch(self, keys: Sequence[bytes]) -> List[Optional[memoryview]]:
        """Look up many keys in ONE FFI call.

        The per-call ctypes overhead dominated single gets (DESIGN.md store
        benchmarks); here the C engine fills offset/length arrays and Python
        only slices the cached whole-map view per result.
        """
        n = len(keys)
        if n == 0:
            return []
        keys = [k.encode("ascii") if isinstance(k, str) else k for k in keys]
        concat = b"".join(keys)
        klens = np.fromiter((len(k) for k in keys), np.uint32, count=n)
        offs = np.empty(n, np.uint64)
        vlens = np.empty(n, np.uint64)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        u64p = ctypes.POINTER(ctypes.c_uint64)
        self._lib.ydb_reader_get_batch(
            self._h, concat, klens.ctypes.data_as(u32p), n,
            offs.ctypes.data_as(u64p), vlens.ctypes.data_as(u64p))
        mv = self._map_view
        return [mv[o:o + l] if o else None
                for o, l in zip(offs.tolist(), vlens.tolist())]

    def __contains__(self, key: bytes) -> bool:
        return self.get(key) is not None

    def close(self) -> None:
        if self._h:
            self._lib.ydb_reader_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class NativeRecordWriter:
    """Drop-in for `store.RecordWriter` over the C++ engine."""

    def __init__(self, db_path: str, overwrite: bool = True):
        lib = _load()
        if lib is None:
            raise RuntimeError("native yolodb library not built")
        if os.path.exists(db_path):
            if overwrite:
                import shutil
                shutil.rmtree(db_path)
            else:
                raise FileExistsError(db_path)
        self._lib = lib
        self._h = lib.ydb_writer_open(db_path.encode())
        if not self._h:
            raise OSError(f"cannot create database: {db_path}")
        self._count = 0

    def put(self, key: bytes, value: bytes) -> None:
        if isinstance(key, str):
            key = key.encode("ascii")
        if self._lib.ydb_writer_put(self._h, key, len(key), value,
                                    len(value)) != 0:
            raise OSError("ydb write failed")
        self._count += 1

    def flush(self) -> None:
        self._lib.ydb_writer_flush(self._h)

    def close(self) -> None:
        if self._h:
            self._lib.ydb_writer_close(self._h)
            self._h = None

    def __len__(self) -> int:
        return self._count

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
