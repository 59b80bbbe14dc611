"""Pitch extraction (RAPT-style NCCF + Viterbi).

Replaces ``pysptk.rapt`` (reference import_blizzard_2023.py:110-111: 60-400 Hz,
hop 240). The fast path is the in-repo C++ implementation (``native/pitch.cpp``, built
on demand via make, loaded with ctypes); a vectorized numpy fallback implements the same
algorithm when no compiler is available. Host-side data-plane code — pitch is a training
*target*, not on the accelerator hot path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libttscube_dsp.so")

_lib = None
_lib_tried = False


def _load_native():
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.ttscube_rapt.restype = ctypes.c_int
        lib.ttscube_rapt.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
            ctypes.c_int, ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def rapt_pitch(x: np.ndarray, sr: int = 24000, hop: int = 240,
               fmin: float = 60.0, fmax: float = 400.0,
               use_native: bool = True) -> np.ndarray:
    """f0 per hop-frame (Hz, 0 = unvoiced) for a mono float waveform."""
    x = np.ascontiguousarray(np.asarray(x, np.float32))
    num_frames = len(x) // hop + 1
    lib = _load_native() if use_native else None
    if lib is not None:
        out = np.zeros(num_frames, np.float32)
        n = lib.ttscube_rapt(
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x), sr, hop,
            fmin, fmax, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            num_frames)
        return out[:n]
    return _rapt_numpy(x, sr, hop, fmin, fmax)


def _rapt_numpy(x: np.ndarray, sr: int, hop: int, fmin: float, fmax: float) -> np.ndarray:
    """Vectorized numpy twin of native/pitch.cpp."""
    min_lag = max(2, int(sr / fmax))
    max_lag = int(sr / fmin)
    win = max_lag * 2
    num_frames = len(x) // hop + 1
    need = win + max_lag

    VOICING_BIAS, TRANS_COST, VOICE_SWITCH = 0.35, 0.6, 0.25
    K = 8

    cands = []  # per frame: list[(lag, nccf)]
    for t in range(num_frames):
        start = t * hop
        fc = [(0, 0.0)]
        if len(x) - start >= need:
            s = x[start : start + win]
            e0 = float(s @ s) + 1e-9
            lags = np.arange(min_lag, max_lag + 1)
            # sliding windows at each lag — stride-tricked matrix
            seg = np.lib.stride_tricks.sliding_window_view(
                x[start : start + win + max_lag], win)
            shifted = seg[lags]  # (L, win)
            num = shifted @ s
            el = np.einsum("ij,ij->i", shifted, shifted) + 1e-9
            nccf = num / np.sqrt(e0 * el)
            best_any = float(nccf.max()) if len(nccf) else 0.0
            # peaks
            interior = np.arange(1, len(nccf) - 1)
            is_peak = (nccf[interior] > nccf[interior - 1]) & \
                      (nccf[interior] >= nccf[interior + 1]) & \
                      (nccf[interior] > 0.3 * best_any) & (nccf[interior] > 0.2)
            peak_idx = interior[is_peak]
            order = np.argsort(-nccf[peak_idx])
            for i in peak_idx[order][: K - 1]:
                fc.append((int(lags[i]), float(nccf[i])))
        cands.append(fc)

    # Viterbi
    INF = 1e30
    cost_prev = None
    back = []
    for t, fc in enumerate(cands):
        local = np.array([VOICING_BIAS if lag == 0 else 1.0 - v for lag, v in fc])
        if t == 0:
            cost_prev = local
            back.append(np.full(len(fc), -1, np.int32))
            continue
        pc = cands[t - 1]
        trans = np.zeros((len(pc), len(fc)))
        for i, (li, _) in enumerate(pc):
            for j, (lj, _) in enumerate(fc):
                if li and lj:
                    trans[i, j] = TRANS_COST * abs(np.log(li / lj))
                elif (li != 0) != (lj != 0):
                    trans[i, j] = VOICE_SWITCH
        total = cost_prev[:, None] + trans
        arg = np.argmin(total, axis=0)
        cost_prev = total[arg, np.arange(len(fc))] + local
        back.append(arg.astype(np.int32))

    out = np.zeros(num_frames, np.float32)
    j = int(np.argmin(cost_prev))
    for t in range(num_frames - 1, -1, -1):
        lag = cands[t][j][0]
        out[t] = 0.0 if lag == 0 else sr / lag
        j = int(back[t][j]) if t > 0 else j
    return out
