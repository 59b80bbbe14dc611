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
