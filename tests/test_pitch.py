"""Pitch tracker tests: native C++ build + accuracy on synthetic signals + numpy-twin
agreement (replacement for the reference's pysptk.rapt dependency)."""

import numpy as np
import pytest

from ttscube_tpu.dsp.pitch import _load_native, rapt_pitch


def make_signal(sr=24000):
    """1.2 s: 0.2 s silence, 0.5 s 220 Hz, 0.3 s 330 Hz, 0.2 s noise."""
    rng = np.random.default_rng(0)
    t1 = np.arange(int(0.5 * sr)) / sr
    t2 = np.arange(int(0.3 * sr)) / sr
    sig = np.concatenate([
        np.zeros(int(0.2 * sr)),
        0.6 * np.sin(2 * np.pi * 220 * t1) + 0.2 * np.sin(2 * np.pi * 440 * t1),
        0.5 * np.sin(2 * np.pi * 330 * t2),
        0.05 * rng.standard_normal(int(0.2 * sr)),
    ]).astype(np.float32)
    return sig


def _check_track(f0, sr=24000, hop=240):
    # voiced region 1: frames ~[0.2s .. 0.65s] → 220 Hz (leave margin at edges)
    a, b = int(0.25 * sr / hop), int(0.6 * sr / hop)
    seg = f0[a:b]
    assert np.median(seg) == pytest.approx(220, rel=0.05), np.median(seg)
    # voiced region 2: ~330 Hz
    a, b = int(0.75 * sr / hop), int(0.95 * sr / hop)
    seg = f0[a:b]
    assert np.median(seg) == pytest.approx(330, rel=0.05), np.median(seg)
    # silence mostly unvoiced
    lead = f0[: int(0.15 * sr / hop)]
    assert np.mean(lead == 0) > 0.7


def test_native_builds_and_tracks():
    lib = _load_native()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    f0 = rapt_pitch(make_signal())
    assert f0.shape[0] == len(make_signal()) // 240 + 1
    _check_track(f0)


def test_numpy_fallback_tracks():
    f0 = rapt_pitch(make_signal(), use_native=False)
    _check_track(f0)


def test_native_and_numpy_agree():
    lib = _load_native()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    sig = make_signal()
    a = rapt_pitch(sig, use_native=True)
    b = rapt_pitch(sig, use_native=False)
    voiced = (a > 0) & (b > 0)
    assert voiced.mean() > 0.5
    np.testing.assert_allclose(a[voiced], b[voiced], rtol=0.05)
    # voicing decisions mostly agree
    assert np.mean((a > 0) == (b > 0)) > 0.85
