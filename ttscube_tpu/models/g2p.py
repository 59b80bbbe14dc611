"""Word-level grapheme→phoneme Seq2Seq with additive attention.

Reference: ``cube/networks/g2p.py:26-231`` + ``cube/networks/modules.py:208-314``.
2-layer BiLSTM(200) encoder; 2-layer LSTM(200) decoder; per-step attention; EOS-or-10×len
stopping. The reference steps the decoder in a Python loop with host-side EOS tracking
(modules.py:271-297); here it is one `lax.scan` with static max length and an EOS mask.

Faithful quirk kept: the attention query is the *cell* state of the last decoder layer
(reference ``decoder_hidden[-1][-1]`` modules.py:271 — indexing the (h, c) tuple picks c).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from ttscube_tpu.models.blocks import Attention
from ttscube_tpu.models.languasito import MaskedEmbed
from ttscube_tpu.ops.rnn import LSTM, LSTMCell

PAD, UNK, EOS = 0, 1, 2


@dataclasses.dataclass(frozen=True)
class Seq2SeqConfig:
    num_input_tokens: int
    num_output_tokens: int
    embedding_size: int = 100
    encoder_size: int = 200
    encoder_layers: int = 2
    decoder_size: int = 200
    decoder_layers: int = 2


class _S2SStep(nn.Module):
    config: Seq2SeqConfig

    @nn.compact
    def __call__(self, carry, xs, enc):
        c = self.config
        states, last_emb, done = carry
        teacher_tok, use_teacher = xs

        query = states[-1][1]  # cell state of last decoder layer (see module docstring)
        _, weighted = Attention(att_proj_size=c.decoder_size, name="att")(query, enc)
        h = jnp.concatenate([weighted, last_emb], axis=-1)
        new_states = []
        for i, st in enumerate(states):
            st, h = LSTMCell(c.decoder_size, name=f"dec_cell_{i}")(st, h)
            new_states.append(st)
        logits = nn.Dense(c.num_output_tokens, name="output",
                          kernel_init=nn.initializers.xavier_uniform())(h)
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        tok = jnp.where(use_teacher, teacher_tok, pred)
        last_emb = MaskedEmbed(c.num_output_tokens, c.embedding_size, name="output_emb")(tok)
        done = done | (pred == EOS)
        return (tuple(new_states), last_emb, done), (logits, done)


class Seq2Seq(nn.Module):
    """__call__(x, gs_output=None, max_steps=None) → (B, T, num_output_tokens) logits.

    Teacher-forced when `gs_output` is given (T = gs_output length); otherwise greedy
    free-running for `max_steps` (default 10× input length) returning logits + done mask.
    """

    config: Seq2SeqConfig

    @nn.compact
    def __call__(self, x, gs_output=None, max_steps: int | None = None):
        c = self.config
        B, S = x.shape
        emb = MaskedEmbed(c.num_input_tokens, c.embedding_size, name="input_emb")(x)
        enc, _ = LSTM(c.encoder_size, num_layers=c.encoder_layers, bidirectional=True,
                      name="encoder")(emb)
        teacher = gs_output is not None
        T = gs_output.shape[1] if teacher else (max_steps or 10 * S)
        if teacher:
            toks_t = jnp.swapaxes(gs_output, 0, 1).astype(jnp.int32)
            use_t = jnp.ones((T, B), bool)
        else:
            toks_t = jnp.zeros((T, B), jnp.int32)
            use_t = jnp.zeros((T, B), bool)

        states0 = tuple(LSTMCell.initial_state(B, c.decoder_size)
                        for _ in range(c.decoder_layers))
        carry0 = (states0, jnp.zeros((B, c.embedding_size)), jnp.zeros((B,), bool))
        scanned = nn.scan(
            _S2SStep,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=(0, nn.broadcast),
            out_axes=0,
        )(c, name="step")
        _, (logits, done) = scanned(carry0, (toks_t, use_t), enc)
        return jnp.swapaxes(logits, 0, 1), jnp.swapaxes(done, 0, 1)


def seq2seq_loss(logits, targets):
    """CE with ignore_index=PAD (reference g2p.py:296-351 training loop)."""
    mask = targets != PAD
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, jnp.clip(targets, 0)[..., None], axis=-1)[..., 0]
    return (nll * mask).sum() / jnp.maximum(mask.sum(), 1)


def greedy_decode(logits, done):
    """Post-process free-run outputs: argmax tokens, zeroed after the first EOS."""
    toks = jnp.argmax(logits, axis=-1)
    emitted_before_done = jnp.concatenate(
        [jnp.zeros_like(done[:, :1]), done[:, :-1]], axis=1)
    return jnp.where(emitted_before_done, 0, toks)


# -- G2P orchestration (reference cube/networks/g2p.py:26-231) -------------------------


class G2PDataset:
    """Tab-separated word→phones file (reference g2p.py:267-280)."""

    def __init__(self, path: str):
        self.examples = []
        for line in open(path):
            parts = line.strip().split("\t")
            if len(parts) != 2:
                continue
            self.examples.append((parts[0], parts[1].split(" ")))


class G2P:
    """Word-level G2P: vocab management, lexicon override, batched transcription.

    File contract mirrors the reference: `{base}.encodings` (token2int/label2int/
    label_list JSON), `{base}.best`/`.last` weights; tab-separated lexicon.
    TPU notes: word batches are padded to char buckets so the jitted encoder/decoder
    executables are reused across calls; greedy decode runs as a scan with a static
    max length.
    """

    MAX_PHONES = 48  # static free-run decode bound (words, not sentences)

    def __init__(self):
        import jax

        self.token2int = {"<PAD>": 0, "<UNK>": 1, "<EOS>": 2}
        self.label2int = {"<PAD>": 0, "<UNK>": 1, "<EOS>": 2}
        self.label_list = ["<PAD>", "<UNK>", "<EOS>"]
        self.lookup: dict[str, list[str]] = {}
        self.model: Seq2Seq | None = None
        self.params = None
        # LRU-bounded: one executable per bucketed word length; a long-tail corpus
        # sweep would otherwise accumulate executables without bound
        from collections import OrderedDict

        self._jit_cache = OrderedDict()
        self._jit_cache_max = 16
        self._jax = jax
        from ttscube_tpu.data.text import SimpleTokenizer

        self.simple_tokenizer = SimpleTokenizer()

    # -- persistence -------------------------------------------------------------

    def save(self, base: str):
        import json

        json.dump({"token2int": self.token2int, "label2int": self.label2int,
                   "label_list": self.label_list}, open(base + ".encodings", "w"),
                  indent=2)

    def load(self, base: str, load_last: bool = False):
        import json
        import os

        from ttscube_tpu.utils.checkpoint import load_params

        obj = json.load(open(base + ".encodings"))
        self.token2int = obj["token2int"]
        self.label2int = obj["label2int"]
        self.label_list = obj["label_list"]
        self.initialize_network()
        for ext in ([".last"] if load_last else [".best", ".model", ".last"]):
            if os.path.exists(base + ext):
                self.params = load_params(base + ext, self._jax.device_get(self.params))
                return
        raise FileNotFoundError(f"no weights found at {base}.best/.model/.last")

    def load_lexicon(self, path: str):
        for line in open(path):
            parts = line.strip().split("\t")
            if len(parts) != 2:
                continue
            self.lookup[parts[0].lower()] = parts[1].split(" ")

    # -- setup -------------------------------------------------------------------

    def update_encodings(self, dataset: G2PDataset, cutoff: int = 2):
        """Chars/phones seen ≥ cutoff times enter the vocab (reference g2p.py:63-86)."""
        t2c, l2c = {}, {}
        for word, trans in dataset.examples:
            for ch in word.lower():
                t2c[ch] = t2c.get(ch, 0) + 1
            for ph in trans:
                l2c[ph] = l2c.get(ph, 0) + 1
        for tok, n in t2c.items():
            if n >= cutoff:
                self.token2int[tok] = len(self.token2int)
        for lab, n in l2c.items():
            if n >= cutoff:
                self.label2int[lab] = len(self.label2int)
                self.label_list.append(lab)

    def initialize_network(self):
        import jax
        import jax.numpy as jnp

        self.model = Seq2Seq(Seq2SeqConfig(num_input_tokens=len(self.token2int),
                                           num_output_tokens=len(self.label2int)))
        x0 = jnp.zeros((1, 4), jnp.int32)
        y0 = jnp.zeros((1, 4), jnp.int32)
        self.params = self.model.init(jax.random.PRNGKey(0), x0, y0)["params"]

    # -- batching ----------------------------------------------------------------

    @staticmethod
    def _bucket(n: int, step: int = 4) -> int:
        return max(step, ((n + step - 1) // step) * step)

    def encode_words(self, words: list[str]):
        import numpy as np

        max_len = self._bucket(max(len(w) for w in words) + 1)
        x = np.zeros((len(words), max_len), np.int32)
        for i, w in enumerate(words):
            for j, ch in enumerate(w.lower()):
                x[i, j] = self.token2int.get(ch, UNK)
            x[i, len(w)] = EOS
        return x

    def encode_labels(self, transcriptions: list[list[str]]):
        import numpy as np

        max_len = self._bucket(max(len(t) for t in transcriptions) + 1)
        y = np.zeros((len(transcriptions), max_len), np.int32)
        for i, t in enumerate(transcriptions):
            for j, ph in enumerate(t):
                y[i, j] = self.label2int.get(ph, UNK)
            y[i, len(t)] = EOS
        return y

    # -- inference ---------------------------------------------------------------

    def transcribe(self, words: list[str]) -> list[list[str]]:
        import jax.numpy as jnp
        import numpy as np

        if not words:
            return []
        x = self.encode_words(words)
        key = ("free", x.shape[1])
        if key in self._jit_cache:
            self._jit_cache.move_to_end(key)
        else:
            self._jit_cache[key] = self._jax.jit(
                lambda p, x: self.model.apply({"params": p}, x,
                                              max_steps=self.MAX_PHONES))
            while len(self._jit_cache) > self._jit_cache_max:
                self._jit_cache.popitem(last=False)
        logits, done = self._jit_cache[key](self.params, jnp.asarray(x))
        toks = np.asarray(greedy_decode(logits, done))
        out = []
        for row in toks:
            tr = []
            for t in row:
                if t == EOS:
                    break
                if t not in (PAD, UNK):
                    tr.append(self.label_list[t])
            out.append(tr)
        return out

    def __call__(self, utterance: str, trace: bool = False):
        """Tokenize + transcribe with lexicon override (reference g2p.py:174-210)."""
        tokens = self.simple_tokenizer(utterance)
        words = [t.word.lower() for t in tokens if t.is_word]
        transcriptions = self.transcribe(words) if words else []
        trace_words = []
        i = 0
        for token in tokens:
            if token.is_word:
                token.transcription = transcriptions[i]
                i += 1
                if token.word.lower() in self.lookup:
                    token.transcription = self.lookup[token.word.lower()]
            elif token.word == " ":
                token.transcription = [" "]
            elif token.word in ("-", '"'):
                token.transcription = ["_"]
            else:
                token.transcription = [""]
            trace_words.append({"word": token.word,
                                "transcription": token.transcription})
        return (tokens, trace_words) if trace else tokens

    def evaluate(self, dataset: G2PDataset, batch_size: int = 64) -> float:
        """Word accuracy (exact transcription match; reference g2p.py:212-225)."""
        err, total = 0, len(dataset.examples)
        for i in range(0, total, batch_size):
            batch = dataset.examples[i : i + batch_size]
            preds = self.transcribe([w for w, _ in batch])
            for (_, gold), pred in zip(batch, preds):
                if pred != gold:
                    err += 1
        return 1.0 - err / max(total, 1)
