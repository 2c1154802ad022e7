"""ctypes bindings for the native host-data library (native/libmcdata.so).

Native equivalents of the host-side hot loops the reference delegates to
C/C++ dependencies (torchaudio kaldi fbank, pointnet2 ops — SURVEY.md
§2.11).  Every entry point has a numpy fallback; ``native_available()``
reports whether the shared library was found (build with
``make -C native``).
"""

from __future__ import annotations

import ctypes
import os
import threading
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False
_LOAD_LOCK = threading.Lock()


def _find_lib() -> Optional[str]:
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    native_dir = os.path.join(here, "native")
    so = os.path.join(native_dir, "libmcdata.so")
    # Explicit override wins over the bundled build (otherwise a
    # once-built native/libmcdata.so would silently shadow MCDATA_LIB).
    for cand in (os.environ.get("MCDATA_LIB", ""), so):
        if cand and os.path.exists(cand):
            return cand
    # The binary is not checked in (unreviewable blob); build it from
    # source on first use.  Failure falls through to the numpy paths.
    if os.path.exists(os.path.join(native_dir, "Makefile")):
        import subprocess
        try:
            subprocess.run(["make", "-C", native_dir, "-s"], timeout=120,
                           capture_output=True, check=True)
        except Exception:
            return None
        if os.path.exists(so):
            return so
    return None


def _load() -> Optional[ctypes.CDLL]:
    # Serialized: first use can come concurrently from PrefetchLoader
    # worker threads, and _find_lib may run `make` — two racing builds
    # writing libmcdata.so while a third thread CDLLs the half-written
    # file would crash the loader.
    global _LIB, _TRIED
    with _LOAD_LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        return _load_locked()


def _load_locked() -> Optional[ctypes.CDLL]:
    global _LIB
    path = _find_lib()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.mc_fbank.restype = ctypes.c_int
    lib.mc_fbank.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_float,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_int,
        ctypes.c_int]
    lib.mc_fps.restype = None
    lib.mc_fps.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int32)]
    lib.mc_knn.restype = None
    lib.mc_knn.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32)]
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def fbank_native(waveform: np.ndarray, num_mel_bins: int = 128,
                 sample_frequency: float = 16000.0,
                 frame_length_ms: float = 25.0,
                 frame_shift_ms: float = 10.0,
                 preemphasis: float = 0.97,
                 remove_dc_offset: bool = True,
                 num_threads: int = 4) -> Optional[np.ndarray]:
    """Native kaldi fbank; None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    wav = np.ascontiguousarray(waveform, np.float32)
    win = int(sample_frequency * frame_length_ms / 1000)
    hop = int(sample_frequency * frame_shift_ms / 1000)
    if len(wav) < win:
        return np.zeros((0, num_mel_bins), np.float32)
    num_frames = 1 + (len(wav) - win) // hop
    out = np.empty((num_frames, num_mel_bins), np.float32)
    written = lib.mc_fbank(_fptr(wav), len(wav), _fptr(out), num_mel_bins,
                           sample_frequency, frame_length_ms,
                           frame_shift_ms, preemphasis,
                           int(remove_dc_offset), num_threads)
    assert written == num_frames, (written, num_frames)
    return out


def fps_native(xyz: np.ndarray, npoint: int,
               start_index: int = 0) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(xyz, np.float32)
    if npoint <= 0:
        return np.empty((0,), np.int32)
    if pts.shape[0] <= 0 or not (0 <= start_index < pts.shape[0]):
        raise ValueError(
            f"fps_native: n={pts.shape[0]}, start_index={start_index}")
    out = np.empty((npoint,), np.int32)
    lib.mc_fps(_fptr(pts), pts.shape[0], npoint, start_index,
               out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out


def knn_native(xyz: np.ndarray, centers: np.ndarray,
               k: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(xyz, np.float32)
    ctr = np.ascontiguousarray(centers, np.float32)
    out = np.empty((ctr.shape[0], k), np.int32)
    lib.mc_knn(_fptr(pts), pts.shape[0], _fptr(ctr), ctr.shape[0], k,
               out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out
