"""ctypes binding for the native POA augmentation engine
(native/marginpoa.cc).

poa_augment's run grouping, left-shift normalization and observation
bookkeeping (poa.c:269-543) are pointer-heavy host work — ~40% of a polish
chunk's wall in the Python implementation. The engine mirrors
margin_tpu/polish/poa.py's augment operation-for-operation; after all reads
are augmented the serialized graph is rebuilt into the ordinary Python
`Poa`, so consensus, bubbles, repeat estimation and feature export run
unchanged. Opt out with MARGIN_TPU_NATIVE_POA=0.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_U8P = np.ctypeslib.ndpointer(dtype=np.uint8, flags="C_CONTIGUOUS")
_I64P = np.ctypeslib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS")


def lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("MARGIN_TPU_NATIVE_POA") == "0":
        return None
    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native")
    so = os.path.join(root, "libmarginpoa.so")
    src = os.path.join(root, "marginpoa.cc")
    stale = (not os.path.exists(so)
             or (os.path.exists(src)
                 and os.path.getmtime(so) < os.path.getmtime(src)))
    if stale:
        try:
            if os.path.exists(so):
                os.unlink(so)
            subprocess.run(["make", "-C", root, "libmarginpoa.so"],
                           capture_output=True, timeout=120)
        except Exception:
            return None
        if not os.path.exists(so):
            return None
    try:
        L = ctypes.CDLL(so)
    except OSError:
        return None
    L.mpoa_create.restype = ctypes.c_void_p
    L.mpoa_create.argtypes = [_U8P, _I64P, ctypes.c_int64, ctypes.c_int64,
                              ctypes.c_int32, ctypes.c_int32]
    L.mpoa_free.argtypes = [ctypes.c_void_p]
    L.mpoa_free.restype = None
    L.mpoa_augment.restype = None
    L.mpoa_augment.argtypes = [
        ctypes.c_void_p, _U8P, _I64P, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32,
        _I64P, ctypes.c_int64, _I64P, ctypes.c_int64,
        _I64P, ctypes.c_int64]
    L.mpoa_export.restype = ctypes.c_int64
    L.mpoa_export.argtypes = [ctypes.c_void_p,
                              ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
    L.mpoa_buf_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
    L.mpoa_buf_free.restype = None
    _LIB = L
    return _LIB


class NativePoaBuilder:
    """Accumulates per-read augmentations in C++, exports a Python Poa."""

    def __init__(self, reference, max_repeat_count: int, params):
        self._L = lib()
        if self._L is None:
            raise RuntimeError("native poa unavailable")
        self.reference = reference
        self.max_rc = max_repeat_count
        ref_b = np.frombuffer(reference.bases.encode("ascii"), dtype=np.uint8)
        ref_c = np.ascontiguousarray(reference.counts, dtype=np.int64)
        self._h = self._L.mpoa_create(
            np.ascontiguousarray(ref_b), ref_c, reference.length,
            max_repeat_count,
            1 if params.poaConstructCompareRepeatCounts else 0,
            1 if params.useRunLengthEncoding else 0)

    def augment(self, read, read_strand: bool, read_no: int,
                matches, inserts, deletes, params=None):
        rb = np.frombuffer(read.bases.encode("ascii"), dtype=np.uint8)
        rc = np.ascontiguousarray(read.counts, dtype=np.int64)
        m = np.ascontiguousarray(np.asarray(matches, dtype=np.int64)
                                 .reshape(-1, 3))
        i = np.ascontiguousarray(np.asarray(inserts, dtype=np.int64)
                                 .reshape(-1, 3))
        d = np.ascontiguousarray(np.asarray(deletes, dtype=np.int64)
                                 .reshape(-1, 3))
        self._L.mpoa_augment(self._h, np.ascontiguousarray(rb), rc,
                             read.length, 1 if read_strand else 0, read_no,
                             m, len(m), i, len(i), d, len(d))

    def finish(self):
        """Export and rebuild the Python Poa; frees the handle."""
        from margin_tpu.polish.poa import Poa, PoaInsert, PoaDelete
        from margin_tpu.rle import RleString

        out = ctypes.POINTER(ctypes.c_uint8)()
        n = self._L.mpoa_export(self._h, ctypes.byref(out))
        if n < 0:
            raise RuntimeError("mpoa_export failed")
        try:
            raw = ctypes.string_at(out, n)
        finally:
            self._L.mpoa_buf_free(out)
            self._L.mpoa_free(self._h)
            self._h = None

        buf = np.frombuffer(raw, dtype=np.uint8)
        pos = 0

        def i64():
            nonlocal pos
            v = int(buf[pos:pos + 8].view(np.int64)[0])
            pos += 8
            return v

        def f64s(count):
            nonlocal pos
            v = buf[pos:pos + count * 8].view(np.float64)
            pos += count * 8
            return v

        def obs_list():
            nonlocal pos
            k = i64()
            tr = buf[pos:pos + k * 24].view(np.int64).reshape(k, 3)
            ws = buf[pos:pos + k * 24].view(np.float64).reshape(k, 3)
            pos += k * 24
            return list(zip(tr[:, 0].tolist(), tr[:, 1].tolist(),
                            ws[:, 2].tolist()))

        n_nodes = i64()
        max_rc = i64()
        poa = Poa.__new__(Poa)
        poa.ref_string = self.reference.copy()
        poa.max_repeat_count = max_rc
        poa._bw = f64s(n_nodes * 5).reshape(n_nodes, 5).copy()
        poa._rw = f64s(n_nodes * max_rc).reshape(n_nodes, max_rc).copy()
        nodes = []
        ref = self.reference
        for idx in range(n_nodes):
            base = "N" if idx == 0 else ref.bases[idx - 1].upper()
            if base not in "ACGT":
                base = "N"
            repeat = 1 if idx == 0 else int(ref.counts[idx - 1])
            node = poa._make_node(base, repeat, idx)
            node.observations = obs_list()
            n_ins = i64()
            for _ in range(n_ins):
                ln = i64()
                nonlocal_pos = pos
                bases = buf[nonlocal_pos:nonlocal_pos + ln].tobytes() \
                    .decode("ascii")
                pos_aligned = (ln + 7) & ~7
                counts = buf[nonlocal_pos + pos_aligned:
                             nonlocal_pos + pos_aligned + ln * 8] \
                    .view(np.int64).copy()
                pos = nonlocal_pos + pos_aligned + ln * 8
                wf = f64s(1)[0]
                wr = f64s(1)[0]
                pi = PoaInsert(RleString(bases, counts), float(wf), float(wr))
                pi.observations = obs_list()
                node.inserts.append(pi)
            n_del = i64()
            for _ in range(n_del):
                ln = i64()
                wf = f64s(1)[0]
                wr = f64s(1)[0]
                pd = PoaDelete(int(ln), float(wf), float(wr))
                pd.observations = obs_list()
                node.deletes.append(pd)
            nodes.append(node)
        poa.nodes = nodes
        return poa
