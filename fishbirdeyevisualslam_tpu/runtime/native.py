"""ctypes bindings for the native C++ runtime (``native/fbev_runtime.cc``).

Provides:
  * :class:`AsyncPipeline` — the reference's Tracking -> LocalMapping ->
    LoopClosing thread/queue architecture (``System.cc:96-111``) as an N-stage
    native pipeline with Python stage callbacks, per-stage abort flags
    (InterruptBA analog) and backpressure.
  * :class:`Prefetcher` — background dataset file loader (PGM parsed natively).

Builds the shared library on demand with g++ (no pip deps); falls back to a
pure-Python thread implementation if no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import queue as pyqueue
import subprocess
import threading
from typing import Callable, List, Optional

_HERE = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_HERE, "native", "fbev_runtime.cc")
_SO = os.path.join(_HERE, "native", "libfbev_runtime.so")

_STAGE_FN = ctypes.CFUNCTYPE(None, ctypes.c_int, ctypes.c_long, ctypes.c_void_p)

_lib = None
_lib_err: Optional[str] = None


def build_library(force: bool = False) -> str:
    """Compile the runtime with g++ -O2 -fPIC -shared."""
    if os.path.exists(_SO) and not force and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    cmd = ["g++", "-O2", "-std=c++17", "-fPIC", "-shared", "-pthread", _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def get_library():
    global _lib, _lib_err
    if _lib is not None or _lib_err is not None:
        return _lib
    try:
        so = build_library()
        lib = ctypes.CDLL(so)
        lib.fbev_pipeline_create.restype = ctypes.c_void_p
        lib.fbev_pipeline_create.argtypes = [ctypes.c_int, ctypes.c_int]
        lib.fbev_pipeline_set_stage.argtypes = [ctypes.c_void_p, ctypes.c_int, _STAGE_FN, ctypes.c_void_p]
        lib.fbev_pipeline_submit.argtypes = [ctypes.c_void_p, ctypes.c_long]
        lib.fbev_pipeline_signal_abort.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.fbev_stage_abort_requested.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.fbev_stage_abort_requested.restype = ctypes.c_int
        lib.fbev_pipeline_processed.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.fbev_pipeline_processed.restype = ctypes.c_long
        lib.fbev_pipeline_queue_depth.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.fbev_pipeline_queue_depth.restype = ctypes.c_int
        lib.fbev_pipeline_flush.argtypes = [ctypes.c_void_p]
        lib.fbev_pipeline_destroy.argtypes = [ctypes.c_void_p]
        lib.fbev_prefetch_create.restype = ctypes.c_void_p
        lib.fbev_prefetch_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int]
        lib.fbev_prefetch_next.restype = ctypes.c_int
        lib.fbev_prefetch_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.fbev_prefetch_release.restype = ctypes.c_int
        lib.fbev_prefetch_release.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8)]
        lib.fbev_prefetch_outstanding.restype = ctypes.c_int
        lib.fbev_prefetch_outstanding.argtypes = [ctypes.c_void_p]
        lib.fbev_prefetch_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
    except Exception as e:  # no toolchain / compile failure -> python fallback
        _lib_err = str(e)
        _lib = None
    return _lib


class AsyncPipeline:
    """N-stage pipeline; stage callbacks receive (stage_idx, item_id)."""

    def __init__(self, stage_fns: List[Callable[[int, int], None]], capacity: int = 64):
        self._fns = stage_fns
        lib = get_library()
        self._native = lib is not None
        if self._native:
            self._lib = lib
            self._cb_refs = []
            self._p = ctypes.c_void_p(lib.fbev_pipeline_create(len(stage_fns), capacity))
            for i, fn in enumerate(stage_fns):
                cb = _STAGE_FN(lambda st, item, _u, f=fn: f(st, item))
                self._cb_refs.append(cb)  # keep alive
                lib.fbev_pipeline_set_stage(self._p, i, cb, None)
        else:
            # pure-python fallback: chained worker threads
            self._queues = [pyqueue.Queue(maxsize=capacity) for _ in stage_fns]
            self._stop = threading.Event()
            self._processed = [0] * len(stage_fns)
            self._submitted = 0
            self._threads = []
            for i in range(len(stage_fns)):
                t = threading.Thread(target=self._worker, args=(i,), daemon=True)
                t.start()
                self._threads.append(t)

    # -- python fallback internals
    def _worker(self, i):
        while not self._stop.is_set():
            try:
                item = self._queues[i].get(timeout=0.05)
            except pyqueue.Empty:
                continue
            self._fns[i](i, item)
            self._processed[i] += 1
            if i + 1 < len(self._queues):
                self._queues[i + 1].put(item)

    # -- API
    @property
    def is_native(self) -> bool:
        return self._native

    def submit(self, item: int):
        if self._native:
            self._lib.fbev_pipeline_submit(self._p, item)
        else:
            self._submitted += 1
            self._queues[0].put(item)

    def signal_abort(self, stage: int):
        if self._native:
            self._lib.fbev_pipeline_signal_abort(self._p, stage)

    def abort_requested(self, stage: int) -> bool:
        if self._native:
            return bool(self._lib.fbev_stage_abort_requested(self._p, stage))
        return False

    def processed(self, stage: int) -> int:
        if self._native:
            return self._lib.fbev_pipeline_processed(self._p, stage)
        return self._processed[stage]

    def queue_depth(self, stage: int) -> int:
        if self._native:
            return self._lib.fbev_pipeline_queue_depth(self._p, stage)
        return self._queues[stage].qsize()

    def flush(self):
        if self._native:
            self._lib.fbev_pipeline_flush(self._p)
        else:
            import time
            while self._processed[-1] < self._submitted:
                time.sleep(0.001)

    def close(self):
        if self._native:
            self._lib.fbev_pipeline_destroy(self._p)
            self._p = None
            self._native = False
        elif hasattr(self, "_stop"):
            self._stop.set()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class Prefetcher:
    """Background dataset file loader (``fbev_prefetch_*``): a native worker
    thread reads files ahead of the consumer into a bounded buffer, parsing
    binary PGM (P5) headers in C.  Falls back to a Python thread when no
    toolchain is available.

    Usage::

        pf = Prefetcher(paths)
        for _ in paths:
            arr = pf.next()          # (H, W) uint8 for PGM, (N,) bytes else
        pf.close()

    ``next()`` copies into numpy and releases the native buffer immediately —
    the C side's outstanding list stays empty (leak-free by construction;
    ``outstanding()`` exposes the counter for tests).
    """

    def __init__(self, paths, capacity: int = 8):
        import numpy as np
        self._np = np
        self.paths = [os.fspath(p) for p in paths]
        lib = get_library()
        self._native = lib is not None
        if self._native:
            self._lib = lib
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths])
            self._p = ctypes.c_void_p(
                lib.fbev_prefetch_create(arr, len(self.paths), capacity))
        else:
            self._q = pyqueue.Queue(maxsize=capacity)
            self._stop = threading.Event()
            self._t = threading.Thread(target=self._py_loop, daemon=True)
            self._t.start()

    def _py_loop(self):
        for p in self.paths:
            if self._stop.is_set():
                return
            try:
                with open(p, "rb") as f:
                    self._q.put(f.read())
            except OSError:
                self._q.put(None)

    @property
    def is_native(self) -> bool:
        return self._native

    def outstanding(self) -> int:
        if self._native:
            return self._lib.fbev_prefetch_outstanding(self._p)
        return 0

    def next(self):
        """Next file: (H, W) uint8 array for binary PGM, raw bytes otherwise;
        None when exhausted or unreadable."""
        np = self._np
        if not self._native:
            try:
                data = self._q.get(timeout=10.0)
            except pyqueue.Empty:
                return None
            return None if data is None else np.frombuffer(data, np.uint8)
        data = ctypes.POINTER(ctypes.c_uint8)()
        length = ctypes.c_long()
        w = ctypes.c_int()
        h = ctypes.c_int()
        ok = self._lib.fbev_prefetch_next(
            self._p, ctypes.byref(data), ctypes.byref(length),
            ctypes.byref(w), ctypes.byref(h))
        if not ok:
            return None
        buf = np.ctypeslib.as_array(data, shape=(length.value,)).copy()
        self._lib.fbev_prefetch_release(self._p, data)
        if w.value > 0 and h.value > 0:
            return buf.reshape(h.value, w.value)
        return buf

    def close(self):
        if self._native and self._p:
            self._lib.fbev_prefetch_destroy(self._p)
            self._p = None
        elif not self._native and hasattr(self, "_stop"):
            self._stop.set()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
