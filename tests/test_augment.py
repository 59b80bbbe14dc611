"""Tests for the working augmentation chain (data/augment.py — the reference's
cube/io_utils/audio.py intent, which is broken/dead code upstream)."""

import numpy as np

from ttscube_tpu.data.augment import (add_noise, add_real_noise, add_reverb, alter,
                                      downsample)

SR = 24000


def _tone(f=440.0, seconds=0.5, sr=SR):
    t = np.arange(int(seconds * sr)) / sr
    return (0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32)


def test_alter_prob_zero_is_identity():
    x = _tone()
    rng = np.random.default_rng(0)
    y = alter(x, rng, SR, prob=0.0)
    assert y is x


def test_alter_deterministic_per_seed():
    x = _tone()
    y1 = alter(x, np.random.default_rng(7), SR, prob=1.0)
    y2 = alter(x, np.random.default_rng(7), SR, prob=1.0)
    np.testing.assert_array_equal(y1, y2)
    assert y1.shape == x.shape and y1.dtype == np.float32


def test_add_noise_level():
    x = np.zeros(SR, np.float32)
    y = add_noise(x, np.random.default_rng(1), level=0.01)
    rms = float(np.sqrt(np.mean(y**2)))
    assert 1e-3 < rms < 2e-2  # white noise near the requested level
    assert y.shape == x.shape


def test_add_reverb_adds_tail_and_keeps_peak_bounded():
    x = np.zeros(SR, np.float32)
    x[1000] = 1.0  # impulse: reverb must smear energy after it
    y = add_reverb(x, np.random.default_rng(2), SR)
    assert y.shape == x.shape
    assert np.max(np.abs(y)) <= 1.0 + 1e-6
    tail = y[1200:12000]
    assert float(np.sqrt(np.mean(tail**2))) > 1e-4, "no reverb tail"


def test_downsample_removes_high_band():
    t = np.arange(SR) / SR
    hi = (0.5 * np.sin(2 * np.pi * 10000.0 * t)).astype(np.float32)  # 10 kHz tone
    y = downsample(hi, np.random.default_rng(5), SR)  # 8k round trip kills it;
    # 16k keeps it — seed 5 first draw decides; assert on the energy RATIO instead
    e_in = float(np.mean(hi**2))
    e_out = float(np.mean(y**2))
    assert y.shape == hi.shape
    assert e_out < e_in * 1.1  # never creates energy
    lo = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    z = downsample(lo, np.random.default_rng(5), SR)
    assert float(np.mean((z - lo) ** 2)) < 1e-3  # in-band signal survives round trip


def test_add_real_noise_mixes_file(tmp_path):
    from ttscube_tpu.utils.wavio import write_wav

    noise = (0.3 * np.random.default_rng(0).standard_normal(SR)).astype(np.float32)
    f = str(tmp_path / "noise.wav")
    write_wav(f, np.asarray(noise * 32767, np.int16), SR)
    x = np.zeros(SR // 2, np.float32)
    y = add_real_noise(x, np.random.default_rng(3), [f], SR)
    assert y.shape == x.shape
    assert float(np.sqrt(np.mean(y**2))) > 0.01  # noise actually mixed in


def test_vocoder_dataset_augment(tmp_path):
    from ttscube_tpu.data.datasets import VocoderDataset

    from ttscube_tpu.utils.wavio import write_wav

    rng = np.random.default_rng(0)
    wav = (0.4 * np.sin(2 * np.pi * 220.0 * np.arange(SR) / SR)
           + 0.05 * rng.standard_normal(SR)).astype(np.float32)
    write_wav(str(tmp_path / "utt.wav"), np.asarray(wav * 32767, np.int16), SR)

    seg = 24000 // 2  # hop-aligned segment
    clean = VocoderDataset(str(tmp_path), max_segment_size=seg, random_start=False,
                           cache_dir=str(tmp_path / "cache"))
    w0, wl0, m0 = clean[0]
    aug = VocoderDataset(str(tmp_path), max_segment_size=seg, random_start=False,
                         cache_dir=str(tmp_path / "cache"), augment_prob=1.0,
                         augment_seed=4)
    w1, wl1, m1 = aug[0]
    assert w1.shape == w0.shape and wl1.shape == wl0.shape and m1.shape == m0.shape
    assert not np.allclose(w1, w0), "augmentation did not alter the audio"
    assert not np.allclose(m1, m0), "mel not recomputed from augmented audio"
    # the cache still holds the CLEAN features
    w2, _, m2 = clean[0]
    np.testing.assert_array_equal(w2, w0)
    np.testing.assert_array_equal(m2, m0)
