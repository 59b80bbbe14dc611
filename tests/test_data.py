"""Data layer tests: tokenizer, encodings, collates, wav IO — against a synthetic corpus
in the reference's on-disk format (SURVEY.md §3.5 output contract)."""

import json
import os

import numpy as np
import pytest

from ttscube_tpu.data.collate import CubeganCollate, PhonemizerCollate, VocoderCollate
from ttscube_tpu.data.datasets import CubeganDataset, batch_iterator
from ttscube_tpu.data.encodings import CubeganEncodings, PhonemizerEncodings
from ttscube_tpu.data.text import SimpleTokenizer, Text2Feat, Lexicon
from ttscube_tpu.utils.wavio import read_wav, write_wav


def test_simple_tokenizer_matches_reference_semantics():
    toks = SimpleTokenizer()("Don't feel bad, ok?")
    words = [t.word for t in toks]
    assert words == ["Don't", " ", "feel", " ", "bad", ",", " ", "ok", "?"]
    assert [t.is_word for t in toks] == [True, False, True, False, True, False, False, True, False]


def test_wav_roundtrip(tmp_path):
    sr = 24000
    y = (0.5 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)).astype(np.float32)
    p = str(tmp_path / "t.wav")
    write_wav(p, y, sr)
    y2, sr2 = read_wav(p)
    assert sr2 == sr and y2.shape == y.shape
    np.testing.assert_allclose(y2, y, atol=1e-4)
    y3, sr3 = read_wav(p, target_sr=2400)
    assert sr3 == 2400 and abs(len(y3) - 2400) <= 1


def make_corpus(tmp_path, n=4):
    """Write a synthetic corpus in the reference import format
    ({id}.{wav,mgc,pitch,json}, SURVEY §3.5)."""
    os.makedirs(str(tmp_path), exist_ok=True)
    rng = np.random.default_rng(0)
    phones = ["a", "b", "c", "d", "e"]
    for i in range(n):
        P = int(rng.integers(4, 8))
        utt_phones = [phones[int(k)] for k in rng.integers(0, 5, P)]
        durs = rng.integers(2, 6, P)
        f2p = [p for p, d in enumerate(durs) for _ in range(d)]
        F = len(f2p)
        meta = {
            "id": f"utt{i}",
            "orig_text": "x" * P,
            "phones": utt_phones,
            "words": ["w1", "w2"],
            "phon2word": [0] * (P // 2) + [1] * (P - P // 2),
            "frame2phon": f2p,
            "speaker": f"spk{i % 2}",
            "left_context": "left words here",
            "right_context": "right words",
        }
        base = str(tmp_path / f"utt{i}")
        json.dump(meta, open(base + ".json", "w"))
        np.save(base + ".mgc", rng.standard_normal((F, 80)).astype(np.float32))
        np.save(base + ".pitch", (rng.uniform(0, 300, F)).astype(np.float32))
        os.rename(base + ".mgc.npy", base + ".mgc")
        os.rename(base + ".pitch.npy", base + ".pitch")
        write_wav(base + ".wav", rng.uniform(-0.3, 0.3, F * 240).astype(np.float32), 24000)
    return tmp_path


def test_cubegan_dataset_and_collate(tmp_path):
    make_corpus(tmp_path)
    ds = CubeganDataset(str(tmp_path))
    assert len(ds) == 4
    ex = ds[0]
    assert ex["mgc"].shape[1] == 80
    # silence zeroing: first phone's frames have zero audio
    f2p = ex["meta"]["frame2phon"]
    first_phone_frames = sum(1 for p in f2p if p == 0)
    assert np.all(ex["audio"][: first_phone_frames * 240] == 0)

    enc = CubeganEncodings()
    enc.compute(ds)
    assert len(enc.speaker2int) == 2 and enc.max_duration >= 2
    path = str(tmp_path / "enc.json")
    enc.save(path)
    enc2 = CubeganEncodings(path)
    assert enc2.phon2int == enc.phon2int

    collate = CubeganCollate(enc, min_frames=8, bucket_frames=8, bucket_phones=8)
    batches = list(batch_iterator(ds, 2, collate, shuffle=True))
    assert len(batches) == 2
    b = batches[0]
    B, N = b["x_char"].shape
    F = b["y_frame2phone"].shape[1]
    assert b["y_mgc"].shape == (B, F, 80)
    assert b["y_audio"].shape == (B, F * 240)
    assert b["y_frame_mask"].shape == (B, F)
    assert N % 8 == 0 and F % 8 == 0  # bucketed
    # durations derived from frame2phon counts, padded phones have dur 0 + mask false
    assert np.all(b["y_dur"][b["x_char"] == 0] == 0)
    # y_dur matches frame counts for valid rows
    i = 0
    f2p_row = b["y_frame2phone"][i][: b["n_frames"][i]]
    counts = np.bincount(f2p_row, minlength=N)
    np.testing.assert_array_equal(b["y_dur"][i][: len(counts)], np.clip(counts, 0, 100)[:N])


def test_phonemizer_collate_and_encodings():
    examples = [
        {"orig_text": "ab cd", "phones": ["A", "B", "_", "C", "D"],
         "phon2word": [0, 0, 1, 2, 2], "words": ["ab", " ", "cd"]},
        {"orig_text": "Hi", "phones": ["H", "I"], "phon2word": [0, 0], "words": ["Hi"]},
    ]
    enc = PhonemizerEncodings()
    enc.compute(examples)
    assert enc.graphemes["PAD"] == 0 and "a" in enc.graphemes
    collate = PhonemizerCollate(enc, bucket=4)
    b = collate(examples)
    assert b["x_char"].shape[1] % 4 == 0
    # case flag: 'H' in "Hi" is uppercase
    assert b["x_case"][1, 0] == 1 and b["x_case"][1, 1] == 0
    # y_new_word: within-word → 1; word advance by k → k+1 (reference io_phonemizer.py:98-107)
    np.testing.assert_array_equal(b["y_new_word"][0, :5], [1, 2, 2, 1, 2])
    assert b["x_num_words"][0] == 3
    np.testing.assert_array_equal(b["x_word_start"][0, :3], [0, 2, 3])
    np.testing.assert_array_equal(b["x_word_stop"][0, :3], [2, 3, 5])


def test_vocoder_collate():
    rng = np.random.default_rng(1)
    ex = [(rng.standard_normal(100).astype(np.float32),
           rng.standard_normal(10).astype(np.float32),
           rng.standard_normal((5, 80)).astype(np.float32)),
          (rng.standard_normal(60).astype(np.float32),
           rng.standard_normal(6).astype(np.float32),
           rng.standard_normal((3, 80)).astype(np.float32))]
    b = VocoderCollate()(ex)
    assert b["x"].shape == (2, 100) and b["mel"].shape == (2, 5, 80)
    assert b["mel"][1, 4, 0] == -5.0 and b["x"][1, 99] == 0.0


def test_text2feat_lexicon_override():
    lex = Lexicon()
    lex.word2phones = {"hello": ["h", "@", "l", "oU"]}
    calls = []

    def fake_g2p(words):
        calls.append(words)
        return [["w", "3r", "l", "d"] for _ in words]

    t2f = Text2Feat(fake_g2p, lex)
    out = t2f("Hello world")
    # leading " " pad becomes a space phone (reference keeps space phones); then the
    # lexicon transcription wins for "Hello"
    assert out["phones"][0] == " "
    assert out["phones"][1:5] == ["h", "@", "l", "oU"]
    assert calls and "world" in calls[0] and "Hello" not in calls[0]
    # phon2word indices point at the right words
    words = out["words"]
    assert words[out["phon2word"][1]] == "Hello"
