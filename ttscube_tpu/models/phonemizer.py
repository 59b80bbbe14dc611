"""Grapheme→phoneme models.

* `Phonemizer` — aligned char-level sequence labeler (reference
  ``cube/networks/phonemizer.py:12-103``): char+case emb → 3×conv+tanh → 2×BiLSTM(200) →
  softmax over phonemes, 1:1 char→phoneme with '_' as deletion. Non-autoregressive — this
  is the live synthesis path (Text2FeatBlizzard, ``io_text.py:26-55``) and maps perfectly
  to TPU: one fused forward, no scan.

* `PhonemizerM2M` — attention seq2seq variant (reference ``phonemizer.py:125-285``):
  LSTM decoder attending only within the current word's encoder span, with an
  "advance-N-words" head. The reference's per-step host bookkeeping (numpy `index_word`,
  re-sliced encoder spans, ``:106-122,188-204``) becomes a `lax.scan` whose carry holds
  the word index; span restriction is an attention *mask* built from word start/stop
  arrays — no host syncs, static max decode length.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from ttscube_tpu.models.blocks import Attention
from ttscube_tpu.models.languasito import MaskedEmbed
from ttscube_tpu.ops.conv import Conv1d
from ttscube_tpu.ops.rnn import LSTM, LSTMCell


@dataclasses.dataclass(frozen=True)
class PhonemizerConfig:
    num_graphemes: int
    num_phonemes: int
    char_emb: int = 32
    case_emb: int = 8
    conv_size: int = 256
    conv_layers: int = 3
    rnn_size: int = 200
    rnn_layers: int = 2
    max_word_skip: int = 20  # the M2M "advance-N-words" head size


class _CharEncoder(nn.Module):
    config: PhonemizerConfig

    @nn.compact
    def __call__(self, x_char, x_case):
        c = self.config
        h_char = nn.Embed(c.num_graphemes, c.char_emb, name="char_emb")(x_char)
        h_case = nn.Embed(2, c.case_emb, name="case_emb")(x_case)
        h = jnp.concatenate([h_char, h_case], axis=-1)
        for i in range(c.conv_layers):
            h = jnp.tanh(Conv1d(c.conv_size, 3, name=f"conv_{i}")(h))
        h, _ = LSTM(c.rnn_size, num_layers=c.rnn_layers, bidirectional=True, name="rnn")(h)
        return h  # (B, S, 400)


class Phonemizer(nn.Module):
    """Aligned sequence labeler: returns (B, S, num_phonemes) logits."""

    config: PhonemizerConfig

    @nn.compact
    def __call__(self, X):
        h = _CharEncoder(self.config, name="encoder")(X["x_char"], X["x_case"])
        return nn.Dense(self.config.num_phonemes, name="output",
                        kernel_init=nn.initializers.xavier_uniform())(h)


def phonemizer_loss(logits, y_phon):
    """CE with ignore_index=0 (reference phonemizer.py:30,50-56)."""
    mask = y_phon != 0
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, jnp.clip(y_phon, 0)[..., None], axis=-1)[..., 0]
    return (nll * mask).sum() / jnp.maximum(mask.sum(), 1)


def phonemizer_accuracy(logits, y_phon):
    """PACC/SACC counters (reference validation_epoch_end phonemizer.py:69-92):
    an error is counted only where both target and prediction are non-pad."""
    pred = jnp.argmax(logits, axis=-1)
    tgt_valid = y_phon != 0
    err = (pred != y_phon) & tgt_valid & (pred != 0)
    n_phones = tgt_valid.sum()
    n_perr = err.sum()
    n_serr = (err.sum(axis=-1) > 0).sum()
    return {"phones": n_phones, "perr": n_perr, "seqs": y_phon.shape[0], "serr": n_serr}


class _M2MStep(nn.Module):
    """One decode step, lifted over time with nn.scan (params broadcast across steps).

    Scanned inputs per step: teacher phone/advance ids (ignored when use_teacher=0).
    Broadcast inputs: encoder outputs + word-span arrays.
    """

    config: PhonemizerConfig

    @nn.compact
    def __call__(self, carry, xs, enc, spans):
        c = self.config
        states, dec_out, last_phone, index_word = carry
        teacher_phone, teacher_adv, use_teacher = xs
        word_start, word_stop, num_words = spans

        # span mask: attend only inside the current word's chars (reference
        # `_prepare_encoder_data` phonemizer.py:106-122, clamped to the last word)
        iw = jnp.minimum(index_word, jnp.maximum(num_words - 1, 0))
        start = jnp.take_along_axis(word_start, iw[:, None], axis=1)
        stop = jnp.take_along_axis(word_stop, iw[:, None], axis=1)
        pos = jnp.arange(enc.shape[1])[None, :]
        mask = (pos >= start) & (pos < stop)

        _, weighted = Attention(att_proj_size=100, kernel_size=3, name="att")(
            dec_out, enc, mask=mask)
        phone_emb = MaskedEmbed(c.num_phonemes, 32, name="phon_emb")(last_phone)
        h = jnp.concatenate([phone_emb, weighted], axis=-1)
        new_states = []
        for i, st in enumerate(states):
            st, h = LSTMCell(c.rnn_size, name=f"dec_cell_{i}")(st, h)
            new_states.append(st)
        dec_out = h
        phon_logits = nn.Dense(c.num_phonemes, name="output_phon",
                               kernel_init=nn.initializers.xavier_uniform())(dec_out)
        nw_logits = nn.Dense(c.max_word_skip, name="output_next_word",
                             kernel_init=nn.initializers.xavier_uniform())(dec_out)

        pred_phone = jnp.argmax(phon_logits, axis=-1).astype(jnp.int32)
        pred_adv = jnp.clip(jnp.argmax(nw_logits, axis=-1).astype(jnp.int32) - 1, 0)
        last_phone = jnp.where(use_teacher, teacher_phone, pred_phone)
        advance = jnp.where(use_teacher, jnp.clip(teacher_adv - 1, 0), pred_adv)
        index_word = index_word + advance
        return (tuple(new_states), dec_out, last_phone, index_word), \
            (phon_logits, nw_logits, index_word)


class PhonemizerM2M(nn.Module):
    """Seq2seq phonemizer with per-word span attention.

    Batch keys: x_char/x_case (B,S); x_word_start/x_word_stop (B,W) char spans per word;
    x_num_words (B,). Teacher forcing uses y_phon (B,T) + y_new_word (B,T).
    Free-run decodes `max_steps` and returns logits + a finished mask.
    """

    config: PhonemizerConfig

    @nn.compact
    def __call__(self, X, max_steps: int | None = None):
        c = self.config
        B, S = X["x_char"].shape
        enc = _CharEncoder(c, name="encoder")(X["x_char"], X["x_case"])
        teacher = "y_phon" in X
        T = X["y_phon"].shape[1] if teacher else (max_steps or 2 * S)

        if teacher:
            phones_t = jnp.swapaxes(X["y_phon"], 0, 1).astype(jnp.int32)
            adv_t = jnp.swapaxes(X["y_new_word"], 0, 1).astype(jnp.int32)
            use_t = jnp.ones((T, B), bool)
        else:
            phones_t = jnp.zeros((T, B), jnp.int32)
            adv_t = jnp.zeros((T, B), jnp.int32)
            use_t = jnp.zeros((T, B), bool)

        spans = (X["x_word_start"], X["x_word_stop"], X["x_num_words"])
        states0 = tuple(LSTMCell.initial_state(B, c.rnn_size) for _ in range(c.rnn_layers))
        # the reference primes the decoder with one zero-input step (phonemizer.py:170);
        # here the priming state is the zero state and dec_out0 = 0.
        carry0 = (states0, jnp.zeros((B, c.rnn_size)), jnp.zeros((B,), jnp.int32),
                  jnp.zeros((B,), jnp.int32))

        scanned = nn.scan(
            _M2MStep,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=(0, nn.broadcast, nn.broadcast),
            out_axes=0,
        )(c, name="step")
        _, (phon_logits, nw_logits, index_words) = scanned(
            carry0, (phones_t, adv_t, use_t), enc, spans)
        phon_logits = jnp.swapaxes(phon_logits, 0, 1)  # (B, T, P)
        nw_logits = jnp.swapaxes(nw_logits, 0, 1)
        index_words = jnp.swapaxes(index_words, 0, 1)
        finished = index_words >= X["x_num_words"][:, None]
        return phon_logits, nw_logits, finished


def m2m_loss(phon_logits, nw_logits, y_phon, y_new_word):
    """CE(phon) + CE(next-word), both ignore_index=0 (reference phonemizer.py:209-219)."""
    return phonemizer_loss(phon_logits, y_phon) + phonemizer_loss(nw_logits, y_new_word)
