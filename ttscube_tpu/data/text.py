"""Text frontend: tokenizer + phonemization for inference.

Reference: ``cube/networks/g2p.py:234-264`` (SimpleTokenizer), ``cube/io_utils/io_text.py``
(Text2FeatBlizzard — runs the aligned phonemizer over raw chars, strips '_' deletions and
rebuilds phon2word; Text2Feat — word-level G2P with lexicon override).
"""

from __future__ import annotations

import dataclasses
import json

import jax
import numpy as np

from ttscube_tpu.data.encodings import PhonemizerEncodings


@dataclasses.dataclass
class Token:
    word: str = ""
    transcription: list = dataclasses.field(default_factory=list)
    is_word: bool = False

    def __repr__(self):
        return f'"{self.word}"' if not self.transcription else f"{self.transcription}"


class SimpleTokenizer:
    """Char-class tokenizer: alpha/' runs are words, everything else is a 1-char token
    (reference g2p.py:247-264)."""

    def __call__(self, utterance: str) -> list[Token]:
        tokens = []
        cb = ""
        for ch in utterance:
            if ch.isalpha() or ch == "'":
                cb += ch
            else:
                if cb:
                    tokens.append(Token(word=cb, is_word=True))
                    cb = ""
                tokens.append(Token(word=ch, is_word=False))
        if cb:
            tokens.append(Token(word=cb, is_word=True))
        return tokens


class Text2FeatBlizzard:
    """Sentence-level text → {words, phones, phon2word} via the aligned phonemizer.

    Reference ``io_text.py:14-61``: paragraph markers '§', 1:1 char→phoneme labeling with
    '_' deletions stripped, phon2word rebuilt by walking char positions.
    """

    def __init__(self, encodings: PhonemizerEncodings, phonemizer, params):
        self.encodings = encodings
        self.phonemizer = phonemizer  # ttscube_tpu.models.phonemizer.Phonemizer
        self.params = params  # bare param tree (no {"params": ...} wrapper)
        self.tokenizer = SimpleTokenizer()
        self.int2phon = [" "] * len(encodings.phonemes)
        for g, idx in encodings.phonemes.items():
            self.int2phon[idx] = g
        # pin the phonemizer to the host CPU backend: its input shape is (1, len(text))
        # so every new text length is a fresh trace — on the TPU relay that is a ~5-7 s
        # remote compile PER TEXT LENGTH, on CPU it is milliseconds, and the tiny
        # BiLSTM labeler runs in ~ms either way. Placement follows the committed
        # devices of the arguments (same recipe as data/importers.py import_audio).
        try:
            self._cpu = jax.local_devices(backend="cpu")[0]
            self.params = jax.device_put(self.params, self._cpu)
        except RuntimeError:  # no cpu backend registered — keep default placement
            self._cpu = None
        self._jit_forward = jax.jit(lambda p, X: self.phonemizer.apply({"params": p}, X))

    def __call__(self, text: str) -> dict:
        text = text.replace("\n\n", "§").replace("\n", " ")
        if not text.startswith("§"):
            text = "§" + text
        if not text.endswith("§"):
            text = text + "§"
        tokens = self.tokenizer(text)
        words = [t.word for t in tokens]

        n = len(text)
        x_char = np.zeros((1, n), np.int32)
        x_case = np.zeros((1, n), np.int32)
        for j, g in enumerate(text):
            low = g.lower()
            if low != g:
                x_case[0, j] = 1
            x_char[0, j] = self.encodings.grapheme2int.get(low, 0)
        X = {"x_char": x_char, "x_case": x_case}
        if self._cpu is not None:
            X = jax.device_put(X, self._cpu)
        logits = self._jit_forward(self.params, X)
        pred = np.asarray(logits.argmax(axis=-1))[0]
        phonemes = [self.int2phon[i] for i in pred]

        phon2word = []
        curated = []
        w_index, c_pos = 0, 0
        for ph in phonemes:
            if ph != "_":
                curated.append(ph)
                phon2word.append(w_index)
            c_pos += 1
            if w_index < len(words) and c_pos == len(words[w_index]):
                c_pos = 0
                w_index += 1
        return {"orig_text": text, "words": words, "phones": curated,
                "phon2word": phon2word}


class Lexicon:
    """Word→phones lookup with JSON persistence (reference G2P lexicon g2p.py:88-121)."""

    def __init__(self, filename: str | None = None):
        self.word2phones: dict[str, list[str]] = {}
        if filename is not None:
            self.load(filename)

    def load(self, filename: str):
        self.word2phones = json.load(open(filename))

    def save(self, filename: str):
        json.dump(self.word2phones, open(filename, "w"))

    def __contains__(self, word):
        return word.lower() in self.word2phones

    def __getitem__(self, word):
        return self.word2phones[word.lower()]


class Text2Feat:
    """Word-level G2P frontend with lexicon override (reference io_text.py:64-96).

    `g2p_transcribe(words: list[str]) -> list[list[str]]` is the model hook (see
    ttscube_tpu.models.g2p); the lexicon wins when it knows the word (g2p.py:193-194).
    """

    def __init__(self, g2p_transcribe, lexicon: Lexicon | None = None):
        self.g2p_transcribe = g2p_transcribe
        self.lexicon = lexicon or Lexicon()
        self.tokenizer = SimpleTokenizer()

    def __call__(self, text: str) -> dict:
        text = text.replace("\n\n", " ").replace("\n", " ")
        if not text.startswith(" "):
            text = " " + text
        if not text.endswith(" "):
            text = text + " "
        tokens = self.tokenizer(text)
        need_g2p = [t.word for t in tokens if t.is_word and t.word not in self.lexicon]
        transcriptions = dict(zip(need_g2p, self.g2p_transcribe(need_g2p))) if need_g2p else {}

        words, phones, phon2word = [], [], []
        for i, t in enumerate(tokens):
            words.append(t.word)
            if t.is_word:
                trans = self.lexicon[t.word] if t.word in self.lexicon else transcriptions.get(t.word, [])
            else:
                trans = [t.word] if t.word == " " else []
            for ph in trans:
                if ph != "_":
                    phones.append(ph)
                    phon2word.append(i)
        return {"orig_text": text, "words": words, "phones": phones,
                "phon2word": phon2word}
