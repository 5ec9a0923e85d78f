"""ctypes bindings for the native C++ loader + a prefetching batch pipeline.

Capability parity: torch ``DataLoader(num_workers=N, pin_memory=True)`` —
the reference's fork-based worker pool whose real work (JPEG decode) is C++
inside PIL/cv2 (SURVEY.md §1 L2, §3.2). TPU-native replacement:

- ``decode_jpeg_batch``: one ctypes call into ``native/loader`` decodes and
  resizes a whole batch on a C++ thread pool — the GIL is released for the
  entire call, so no fork, no IPC, no per-image Python overhead;
- ``Prefetcher``: a background thread keeps ``depth`` ready batches in a
  queue so host decode overlaps device compute (double buffering).

Falls back to cv2 (and, for the pipeline, synchronous iteration) when the
shared library hasn't been built — behavior is identical, only slower.
Build with:  make -C native/loader
"""

from __future__ import annotations

import ctypes
import os
import queue
import threading
from typing import Iterator, Optional, Sequence

import numpy as np

# fallback when M3F_LOADER_SO is unset: the in-repo build output
_REPO_SO = os.path.join(os.path.dirname(__file__), "..", "..", "..",
                        "native", "loader", "libm3f_loader.so")

_lib: Optional[ctypes.CDLL] = None
_lib_checked = False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_checked
    if _lib_checked:
        return _lib
    _lib_checked = True
    # env read here (not at import) so setting it after import still works;
    # an explicit override that doesn't exist is a deployment mistake the
    # user asked us to use — warn instead of silently falling back to cv2
    override = os.environ.get("M3F_LOADER_SO", "")
    if override and not os.path.exists(override):
        print(f"WARNING: M3F_LOADER_SO={override} does not exist; "
              f"falling back to the in-repo loader / cv2", flush=True)
        override = ""
    path = next((os.path.abspath(p) for p in (override, _REPO_SO)
                 if p and os.path.exists(p)), None)
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.m3f_decode_jpeg_batch.restype = ctypes.c_int
        lib.m3f_decode_jpeg_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ]
        if lib.m3f_loader_self_test() != 42:
            return None
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def native_available() -> bool:
    return _load_lib() is not None


def decode_jpeg_batch(paths: Sequence[str], size: int,
                      n_threads: int = 0,
                      out: Optional[np.ndarray] = None) -> tuple:
    """Decode+resize a batch of JPEGs → (uint8 [n, size, size, 3], ok_mask).

    Missing/undecodable files produce zeroed slots with ok=False (the caller
    marks those frames invalid, same as the cv2 path in affwild2.py).
    """
    n = len(paths)
    if out is None:
        out = np.empty((n, size, size, 3), dtype=np.uint8)
    lib = _load_lib()
    if lib is not None:
        arr = (ctypes.c_char_p * n)(
            *[p.encode() if p and os.path.exists(p) else b"" for p in paths])
        ok_u8 = np.zeros(n, dtype=np.uint8)
        n_threads = n_threads or min(8, os.cpu_count() or 1)
        lib.m3f_decode_jpeg_batch(
            arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            size, size, n_threads,
            ok_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        # per-slot status from C: missing files AND corrupt/undecodable
        # JPEGs both come back ok=0 (slot zeroed), matching the cv2 path
        return out, ok_u8.astype(bool)
    ok = np.ones(n, dtype=bool)
    # ---- cv2 fallback ----
    import cv2
    for i, p in enumerate(paths):
        img = cv2.imread(p, cv2.IMREAD_COLOR) if p and os.path.exists(p) else None
        if img is None:
            out[i] = 0
            ok[i] = False
            continue
        if img.shape[:2] != (size, size):
            img = cv2.resize(img, (size, size), interpolation=cv2.INTER_LINEAR)
        out[i] = img[..., ::-1]  # BGR → RGB
    return out, ok


class Prefetcher:
    """Background-thread prefetch of an iterator (depth-bounded queue).

    Wraps any batch iterator; keeps up to ``depth`` ready batches so the
    host pipeline runs ahead of device compute (SURVEY §7 step 6).
    """

    _DONE = object()

    def __init__(self, it: Iterator, depth: int = 2):
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._err: Optional[BaseException] = None
        self._stop = False
        self._thread = threading.Thread(target=self._run, args=(it,), daemon=True)
        self._thread.start()

    def _run(self, it):
        try:
            for item in it:
                # bounded put so close() can interrupt a producer blocked on
                # a full queue (consumer stopped early — fit() hit num_steps
                # on an endless stream)
                while not self._stop:
                    try:
                        self._q.put(item, timeout=0.2)
                        break
                    except queue.Full:
                        continue
                if self._stop:
                    return
        except BaseException as e:  # surfaced on the consumer side
            self._err = e
        finally:
            while not self._stop:
                try:
                    self._q.put(self._DONE, timeout=0.2)
                    break
                except queue.Full:
                    continue

    def __iter__(self):
        return self

    def __next__(self):
        if self._stop:
            raise StopIteration
        item = self._q.get()
        if item is self._DONE:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item

    def close(self):
        """Stop the producer thread and drop its buffered batches.

        Without this, a consumer that stops early leaves the thread blocked
        on the full queue for process life, pinning ``depth`` ready batches
        (tens of MB for fusion shapes) and the underlying stream's decode
        cache. Idempotent; the Prefetcher is drained and unusable after.
        """
        self._stop = True
        for _ in range(2):           # once to unblock, once after it exits
            try:
                while True:
                    self._q.get_nowait()
            except queue.Empty:
                pass
            self._thread.join(timeout=5.0)
