"""TextGrid parser + merge tests (reference import_textgrid.py semantics)."""

import numpy as np

from ttscube_tpu.data.importers import (
    align_words,
    fetch_context,
    merge_textgrid,
    scrub_uppercase_phones,
)
from ttscube_tpu.data.text import SimpleTokenizer
from ttscube_tpu.data.textgrid import parse_textgrid, write_textgrid


def make_tg(tmp_path):
    words = [
        {"text": "hello", "start": 0.0, "stop": 0.4},
        {"text": "world", "start": 0.4, "stop": 0.9},
    ]
    phones = [
        {"text": "HH", "start": 0.0, "stop": 0.1},
        {"text": "EH", "start": 0.1, "stop": 0.2},
        {"text": "L", "start": 0.2, "stop": 0.3},
        {"text": "OW", "start": 0.3, "stop": 0.4},
        {"text": "W", "start": 0.4, "stop": 0.55},
        {"text": "ER", "start": 0.55, "stop": 0.7},
        {"text": "L", "start": 0.7, "stop": 0.8},
        {"text": "D", "start": 0.8, "stop": 0.9},
    ]
    utt = [{"text": "hello world", "start": 0.0, "stop": 0.9}]
    p = str(tmp_path / "utt.TextGrid")
    write_textgrid(p, [("words", words), ("phones", phones), ("utt", utt)], 0.9)
    return p, words, phones


def test_parse_roundtrip(tmp_path):
    p, words, phones = make_tg(tmp_path)
    tiers = parse_textgrid(p)
    assert len(tiers) == 3
    assert [w["text"] for w in tiers[0]] == ["hello", "world"]
    assert len(tiers[1]) == 8
    np.testing.assert_allclose(tiers[1][4]["start"], 0.4)
    assert tiers[2][0]["text"] == "hello world"


def test_align_and_merge(tmp_path):
    p, words, phones = make_tg(tmp_path)
    tok = SimpleTokenizer()
    text = " hello world"
    tok_words = tok(text)  # [' ', 'hello', ' ', 'world']
    norm_words = [{"text": " ", "start": 0.0, "stop": 0.0}] + words
    hybrid, phon2word, frame2phon = merge_textgrid(norm_words, phones, tok_words)
    # hello's 4 phones + world's 4 phones present, mapped to the right words
    assert "HH" in hybrid and "D" in hybrid
    wi_hello = [phon2word[i] for i, h in enumerate(hybrid) if h == "HH"][0]
    wi_world = [phon2word[i] for i, h in enumerate(hybrid) if h == "D"][0]
    words_list = [w.word for w in tok_words]
    assert words_list[wi_hello] == "hello"
    assert words_list[wi_world] == "world"
    # 0.9 s at 10 ms → 90 frames; frame 0 sits on the zero-width leading pause
    # (reference semantics: the `while c_pos > stop` loop doesn't advance at c=0)
    assert len(frame2phon) == 90
    assert frame2phon[0] == 0
    assert frame2phon[1] == hybrid.index("HH")
    assert frame2phon[-1] == len(hybrid) - 1


def test_scrub_and_context(tmp_path):
    item = {"phones": ["HH", "bad", "EH", " "]}
    scrub_uppercase_phones(item)
    assert item["phones"] == ["HH", " ", "EH", " "]

    book = tmp_path / "book.txt"
    book.write_text("Intro paragraph here.\n\nSome words before hello world and after.\n\nLast.")
    ds = [{"orig_text": " hello world"}]
    matched = fetch_context(ds, str(book))
    assert matched == 1
    assert ds[0]["left_context"].endswith("before")
    assert ds[0]["right_context"].startswith("and after")
