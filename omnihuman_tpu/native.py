"""ctypes bindings for the native data-plane library (cpp/omnidata.cpp).

Gives the host-side hot loops (Gaussian heatmap synthesis over 308
keypoints × frames, uint8→float frame conversion, PCM decode) a real C++
implementation with std::thread parallelism — the TPU-native counterpart
of the performance the reference outsourced to external CUDA wheels.
Falls back to the NumPy implementations transparently when the shared
library hasn't been built (`make -C cpp`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib_path() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "cpp", "libomnidata.so")


def load_library(build_if_missing: bool = True) -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path) and build_if_missing:
        try:
            subprocess.run(["make", "-C", os.path.dirname(path)],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        i16p = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")
        lib.gaussian_heatmaps.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, f32p]
        lib.frames_to_float.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32p]
        lib.pcm16_to_float_mono.argtypes = [
            i16p, ctypes.c_longlong, ctypes.c_int, f32p]
        lib.omnidata_version.restype = ctypes.c_int
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return load_library() is not None


def gaussian_heatmaps(keypoints: np.ndarray, heatmap_size: Tuple[int, int],
                      sigma: float = 2.0,
                      conf_threshold: float = 0.1) -> np.ndarray:
    """[T, K, 3] keypoints → [T, K, H, W] float32 heatmaps."""
    kp = np.ascontiguousarray(keypoints, np.float32)
    t, k, _ = kp.shape
    h, w = heatmap_size
    lib = load_library()
    if lib is not None:
        out = np.empty((t, k, h, w), np.float32)
        lib.gaussian_heatmaps(kp, t, k, h, w, float(sigma),
                              float(conf_threshold), out)
        return out
    # numpy fallback
    from omnihuman_tpu.omni.dataset import generate_heatmaps
    return np.stack([generate_heatmaps(kp[i], (h, w), sigma,
                                       conf_threshold)
                     for i in range(t)])


def frames_to_float(frames: np.ndarray) -> np.ndarray:
    """[T, H, W, C] uint8 → [C, T, H, W] float32 in [-1, 1]."""
    fr = np.ascontiguousarray(frames, np.uint8)
    t, h, w, c = fr.shape
    lib = load_library()
    if lib is not None:
        out = np.empty((c, t, h, w), np.float32)
        lib.frames_to_float(fr, t, h, w, c, out)
        return out
    return (fr.astype(np.float32) / 127.5 - 1.0).transpose(3, 0, 1, 2)


def pcm16_to_float_mono(pcm: np.ndarray, channels: int = 1) -> np.ndarray:
    """[N] int16 interleaved → [N/channels] float32 mono in [-1, 1]."""
    x = np.ascontiguousarray(pcm, np.int16)
    frames = x.size // channels
    lib = load_library()
    if lib is not None:
        out = np.empty((frames,), np.float32)
        lib.pcm16_to_float_mono(x, x.size, channels, out)
        return out
    y = x.astype(np.float32) / 32768.0
    if channels > 1:
        y = y.reshape(-1, channels).mean(-1)
    return y
