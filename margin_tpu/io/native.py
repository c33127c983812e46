"""ctypes bindings for the native marginio engine (native/marginio.cc).

Falls back gracefully: `lib()` returns None when the shared library is not
built, and callers use the pure-Python path."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional

import numpy as np

_LIB = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")


def lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_NATIVE_DIR, "libmarginio.so")
    if not os.path.exists(so):
        try:  # build on demand
            subprocess.run(["make", "-C", _NATIVE_DIR], capture_output=True,
                           timeout=120, check=True)
        except Exception:
            return None
    if not os.path.exists(so):
        return None
    try:
        L = ctypes.CDLL(so)
    except OSError:
        return None
    L.mio_open.restype = ctypes.c_void_p
    L.mio_open.argtypes = [ctypes.c_char_p]
    L.mio_close.argtypes = [ctypes.c_void_p]
    L.mio_n_refs.argtypes = [ctypes.c_void_p]
    L.mio_ref_name.restype = ctypes.c_char_p
    L.mio_ref_name.argtypes = [ctypes.c_void_p, ctypes.c_int]
    L.mio_ref_len.restype = ctypes.c_int64
    L.mio_ref_len.argtypes = [ctypes.c_void_p, ctypes.c_int]
    L.mio_header_text.restype = ctypes.c_char_p
    L.mio_header_text.argtypes = [ctypes.c_void_p]
    L.mio_scan.restype = ctypes.c_int64
    L.mio_scan.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.int32), np.ctypeslib.ndpointer(np.int64),
        np.ctypeslib.ndpointer(np.int32), np.ctypeslib.ndpointer(np.int32),
        np.ctypeslib.ndpointer(np.int64), np.ctypeslib.ndpointer(np.int64),
        np.ctypeslib.ndpointer(np.int64), np.ctypeslib.ndpointer(np.int64),
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64]
    L.mio_iter_region.restype = ctypes.c_void_p
    L.mio_iter_region.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                  ctypes.c_int64, ctypes.c_int64]
    L.mio_iter_next.restype = ctypes.c_int64
    L.mio_iter_next.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
    L.mio_iter_destroy.argtypes = [ctypes.c_void_p]
    L.mio_fetch_region_all.restype = ctypes.c_int64
    L.mio_fetch_region_all.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int64))]
    L.mio_buf_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
    L.mio_buf_free.restype = None
    L.mio_sizes_free.argtypes = [ctypes.POINTER(ctypes.c_int64)]
    L.mio_sizes_free.restype = None
    L.mio_write_haplotagged.restype = ctypes.c_int
    L.mio_write_haplotagged.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.int32), ctypes.c_int64, ctypes.c_int,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(np.int64)]
    _LIB = L
    return _LIB


class NativeBam:
    """Thin wrapper over the native BAM handle."""

    def __init__(self, path: str):
        L = lib()
        if L is None:
            raise RuntimeError("native marginio library unavailable")
        self._lib = L
        self._h = L.mio_open(path.encode())
        if not self._h:
            raise IOError(f"mio_open failed for {path}")
        n = L.mio_n_refs(self._h)
        self.ref_names = [L.mio_ref_name(self._h, i).decode() for i in range(n)]
        self.ref_lengths = [L.mio_ref_len(self._h, i) for i in range(n)]
        self.header_text = L.mio_header_text(self._h).decode(errors="replace")

    def close(self):
        if self._h:
            self._lib.mio_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()

    def scan(self):
        """Full scan returning packed arrays: dict of numpy arrays + names
        list. One native pass; no per-record Python."""
        cap = 1 << 16
        names_cap = 1 << 22
        while True:
            tid = np.empty(cap, np.int32)
            pos = np.empty(cap, np.int64)
            flag = np.empty(cap, np.int32)
            mapq = np.empty(cap, np.int32)
            alen = np.empty(cap, np.int64)
            ssc = np.empty(cap, np.int64)
            esc = np.empty(cap, np.int64)
            name_off = np.empty(cap, np.int64)
            names_buf = ctypes.create_string_buffer(names_cap)
            n = self._lib.mio_scan(self._h, tid, pos, flag, mapq, alen, ssc,
                                   esc, name_off, names_buf, names_cap, cap)
            if n == -2:
                cap *= 4
                continue
            if n == -3:
                names_cap *= 4
                continue
            if n < 0:
                raise IOError(f"mio_scan failed: {n}")
            blob = names_buf.raw
            names = [blob[int(o):blob.index(b"\0", int(o))].decode()
                     for o in name_off[:n]]
            return dict(tid=tid[:n], pos=pos[:n], flag=flag[:n], mapq=mapq[:n],
                        aligned_len=alen[:n], start_sc=ssc[:n], end_sc=esc[:n],
                        names=names)

    def fetch_raw(self, tid: int, start: int, end: int):
        """Yield raw record payload bytes overlapping [start, end).

        One native call fetches the whole region (concatenated payloads +
        size table); the per-record iterator round-trip through ctypes
        dominated the readextract profile at ~0.2 ms/record."""
        out = ctypes.POINTER(ctypes.c_uint8)()
        sizes = ctypes.POINTER(ctypes.c_int64)()
        n = self._lib.mio_fetch_region_all(self._h, tid, start, end,
                                           ctypes.byref(out),
                                           ctypes.byref(sizes))
        if n < 0:
            raise IOError("mio_fetch_region_all failed")
        try:
            if n == 0:
                return
            sz = np.ctypeslib.as_array(sizes, shape=(n,))
            blob = ctypes.string_at(out, int(sz.sum()))
            off = 0
            for s in sz.tolist():
                yield blob[off:off + s]
                off += s
        finally:
            self._lib.mio_buf_free(out)
            self._lib.mio_sizes_free(sizes)


def write_haplotagged_native(bam_in: str, bam_out: str, tags: Dict[str, int],
                             tid: int = -1, start: int = -1, end: int = -1,
                             include_secondary=False, include_supplementary=False):
    """Native haplotagged-BAM rewrite. tags: read name -> 1/2.
    Returns (h1, h2, h0) counts or None if native lib unavailable."""
    L = lib()
    if L is None:
        return None
    names = list(tags.keys())
    blob = b"\0".join(n.encode() for n in names) + b"\0"
    haps = np.array([tags[n] for n in names], dtype=np.int32)
    counts = np.zeros(3, dtype=np.int64)
    ret = L.mio_write_haplotagged(bam_in.encode(), bam_out.encode(), blob,
                                  haps, len(names), tid, start, end,
                                  1 if include_secondary else 0,
                                  1 if include_supplementary else 0, counts)
    if ret != 0:
        raise IOError(f"mio_write_haplotagged failed: {ret}")
    return int(counts[0]), int(counts[1]), int(counts[2])
