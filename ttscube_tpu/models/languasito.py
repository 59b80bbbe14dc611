"""Languasito2 — the two-tower duration/pitch/conditioning text encoder.

Reference: ``cube/networks/modules.py:805-1095``. Two parallel towers over phonemes:
  * text tower (`_t`): duration (101-way classification over frames) + pitch/VUV
  * GAN tower (`_g`): 80-dim frame-level conditioning for the HiFi-GAN generator

TPU redesign vs the reference:
  * length regulation (durations → frames) is a device-side gather
    (``ops/length_regulator.py``) instead of host Python loops (modules.py:946-953);
  * the word-level LM conditioning gather (phon2word) is `take_along_axis` instead of
    host-built numpy indices (modules.py:1079-1082);
  * all shapes static: collates provide dense `y_frame2phone` + masks.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ttscube_tpu.ops.conv import Conv1d
from ttscube_tpu.ops.length_regulator import durations_to_frame2phone, regulate_length
from ttscube_tpu.ops.rnn import LSTM

PHON_EMB_SIZE = 64
SPEAKER_EMB_SIZE = 128
CHAR_CNN_SIZE = 256
CHAR_CNN_KS = 3
CHAR_CNN_NL = 3
CHAR_RNN_NL = 2
CHAR_RNN_SIZE = 256
DUR_RNN_SIZE = 256
DUR_RNN_LAYERS = 2
PITCH_RNN_SIZE = 256
PITCH_RNN_LAYERS = 2
COND_RNN_SIZE = 64
COND_RNN_LAYERS = 2
COND_SIZE = 80
EXTERNAL_COND = 512  # 2 × 256 BiLSTM over the LM embeddings


@dataclasses.dataclass(frozen=True)
class LanguasitoConfig:
    num_phones: int
    num_speakers: int
    max_pitch: float
    max_duration: int
    cond_type: Optional[str] = None  # None | "fasttext" | "hf"
    lm_dim: Optional[int] = None  # override the x_words feature dim (hf hidden size)

    @property
    def lm_input_dim(self) -> int:
        if self.lm_dim is not None:
            return self.lm_dim
        return {"fasttext": 300, "hf": 768}.get(self.cond_type, 0)


class MaskedEmbed(nn.Module):
    """Embedding with torch padding_idx=0 semantics (row 0 pinned to zero)."""

    num_embeddings: int
    features: int

    @nn.compact
    def __call__(self, ids):
        table = self.param("embedding", nn.initializers.normal(1.0),
                           (self.num_embeddings, self.features))
        out = jnp.take(table, ids, axis=0)
        return out * (ids != 0)[..., None]


class _Tower(nn.Module):
    """Shared front: phone emb → char CNN → char BiLSTM; plus speaker emb and LM cond."""

    config: LanguasitoConfig

    @nn.compact
    def __call__(self, x_char, x_speaker, x_words=None, x_phon2word=None):
        c = self.config
        phone_emb = MaskedEmbed(c.num_phones + 1, PHON_EMB_SIZE, name="phon_emb")(x_char)
        speaker_emb = MaskedEmbed(c.num_speakers + 1, SPEAKER_EMB_SIZE, name="speaker_emb")(x_speaker)
        h = phone_emb
        for i in range(CHAR_CNN_NL):
            h = jnp.tanh(Conv1d(CHAR_CNN_SIZE, CHAR_CNN_KS, w_init_gain="tanh",
                                name=f"char_cnn_{i}")(h))
        h, _ = LSTM(CHAR_RNN_SIZE, num_layers=CHAR_RNN_NL, bidirectional=True,
                    name="char_rnn")(h)
        # speaker_emb: (B, 1, 128) repeated along phones (reference modules.py:934)
        spk = jnp.broadcast_to(speaker_emb, (h.shape[0], h.shape[1], SPEAKER_EMB_SIZE))
        h = jnp.concatenate([h, spk], axis=-1)
        if c.cond_type is not None:
            cond, _ = LSTM(256, num_layers=2, bidirectional=True, name="lm")(x_words)
            # word→phone gather (reference _get_cond_selection modules.py:1079-1082)
            cond_sel = jnp.take_along_axis(cond, x_phon2word[:, :, None], axis=1)
            h = jnp.concatenate([h, cond_sel], axis=-1)
        return h


class Languasito2(nn.Module):
    """Returns (dur_logits, pitch, vuv, conditioning). See module docstring for keys."""

    config: LanguasitoConfig

    def setup(self):
        c = self.config
        self.tower_t = _Tower(c, name="tower_t")
        self.tower_g = _Tower(c, name="tower_g")
        self.dur_rnn = LSTM(DUR_RNN_SIZE, num_layers=DUR_RNN_LAYERS, bidirectional=True,
                            name="dur_rnn")
        self.dur_output = nn.Dense(c.max_duration + 1, name="dur_output",
                                   kernel_init=nn.initializers.xavier_uniform())
        self.pitch_rnn = LSTM(PITCH_RNN_SIZE, num_layers=PITCH_RNN_LAYERS,
                              bidirectional=True, name="pitch_rnn")
        self.pitch_output = nn.Dense(2, name="pitch_output",
                                     kernel_init=nn.initializers.xavier_uniform())
        self.cond_rnn = LSTM(COND_RNN_SIZE, num_layers=COND_RNN_LAYERS, bidirectional=True,
                             name="cond_rnn")
        self.cond_output = nn.Dense(COND_SIZE, name="cond_output",
                                    kernel_init=nn.initializers.xavier_uniform())

    def text_forward(self, X, frame2phone=None):
        """Phone-level dur logits; frame-level pitch & vuv (reference modules.py:916-960)."""
        h = self.tower_t(X["x_char"], X["x_speaker"], X.get("x_words"), X.get("x_phon2word"))
        hidden_dur, _ = self.dur_rnn(h)
        dur_logits = self.dur_output(hidden_dur)
        if frame2phone is None:
            frame2phone = X["y_frame2phone"]
        hf = regulate_length(h, frame2phone)
        hidden_pitch, _ = self.pitch_rnn(hf)
        po = self.pitch_output(hidden_pitch)
        pitch = jax.nn.sigmoid(po[:, :, 0])
        vuv = jax.nn.sigmoid(po[:, :, 1])
        return dur_logits, pitch, vuv

    def cond_forward(self, X, frame2phone=None, pitch=None):
        """Frame-level 80-d conditioning (reference modules.py:962-994)."""
        h = self.tower_g(X["x_char"], X["x_speaker"], X.get("x_words"), X.get("x_phon2word"))
        if frame2phone is None:
            frame2phone = X["y_frame2phone"]
        if pitch is None:
            pitch = X["y_pitch"]
        hf = regulate_length(h, frame2phone)
        pitch_n = (pitch / self.config.max_pitch)[:, :, None]
        hf = jnp.concatenate([hf, pitch_n], axis=-1)
        hidden, _ = self.cond_rnn(hf)
        return self.cond_output(hidden)

    def __call__(self, X):
        dur_logits, pitch, vuv = self.text_forward(X)
        cond = self.cond_forward(X)
        return dur_logits, pitch, vuv, cond

    def infer(self, X, max_frames: int):
        """Free synthesis: predict durations, expand, predict pitch, build conditioning.

        Reference ``inference`` (modules.py:1001-1009): vuv rounded to binary, pitch
        rescaled by max_pitch and masked by vuv.
        """
        h_t = self.tower_t(X["x_char"], X["x_speaker"], X.get("x_words"), X.get("x_phon2word"))
        hidden_dur, _ = self.dur_rnn(h_t)
        dur_logits = self.dur_output(hidden_dur)
        durs = jnp.argmax(dur_logits, axis=-1)
        phone_mask = (X["x_char"] != 0)
        durs = durs * phone_mask
        n_valid = phone_mask.sum(axis=-1)
        frame2phone, frame_mask = durations_to_frame2phone(durs, n_valid, max_frames)

        hf = regulate_length(h_t, frame2phone)
        po = self.pitch_output(self.pitch_rnn(hf)[0])
        pitch = jax.nn.sigmoid(po[:, :, 0])
        vuv = jnp.round(jax.nn.sigmoid(po[:, :, 1]))
        pitch = pitch * self.config.max_pitch * vuv

        cond = self.cond_forward(X, frame2phone=frame2phone, pitch=pitch)
        return cond, {"durations": durs, "pitch": pitch, "vuv": vuv,
                      "frame2phone": frame2phone, "frame_mask": frame_mask}


class Languasito(nn.Module):
    """Languasito v1 — superseded single-tower variant (reference modules.py:592-802;
    not instantiated in the reference's live code but part of the inventory).

    One shared front; `_rnn_overlay` BiLSTM(512) at frame rate feeds a *classification*
    pitch head (max_pitch+1 ways) and the conditioning RNN (input = overlay ⊕ pitch)."""

    config: LanguasitoConfig

    @nn.compact
    def __call__(self, X, frame2phone=None, pitch=None):
        c = self.config
        h = _Tower(c, name="tower")(X["x_char"], X["x_speaker"], X.get("x_words"),
                                    X.get("x_phon2word"))
        hidden_dur, _ = LSTM(DUR_RNN_SIZE, num_layers=DUR_RNN_LAYERS, bidirectional=True,
                             name="dur_rnn")(h)
        dur_logits = nn.Dense(c.max_duration + 1, name="dur_output",
                              kernel_init=nn.initializers.xavier_uniform())(hidden_dur)
        if frame2phone is None:
            frame2phone = X["y_frame2phone"]
        hf = regulate_length(h, frame2phone)
        overlay, _ = LSTM(512, num_layers=1, bidirectional=True, name="rnn_overlay")(hf)
        hp, _ = LSTM(PITCH_RNN_SIZE, num_layers=1, bidirectional=True,
                     name="pitch_rnn")(overlay)
        pitch_logits = nn.Dense(int(c.max_pitch) + 1, name="pitch_output",
                                kernel_init=nn.initializers.xavier_uniform())(hp)
        if pitch is None:
            pitch = X["y_pitch"]
        hc = jnp.concatenate([overlay, (pitch / c.max_pitch)[:, :, None]], axis=-1)
        hcond, _ = LSTM(256, num_layers=1, bidirectional=True, name="rnn_cond")(hc)
        cond = nn.Dense(COND_SIZE, name="cond_output",
                        kernel_init=nn.initializers.xavier_uniform())(hcond)
        return dur_logits, pitch_logits, cond


def languasito_losses(dur_logits, pitch, vuv, batch, max_pitch: float):
    """Duration CE (ignore-index → mask) + VUV-weighted pitch L1 + VUV L1.

    Reference ``cubegan.py:107-112``: CE over durations with ignore_index on padding;
    pitch loss = mean(|t/max_pitch − p| · vuv_t) + mean(|vuv_t − vuv_p|).

    Deliberate improvement over the reference: the pitch/VUV means are taken over the
    VALID frames (`y_frame_mask`) instead of the padded batch — the reference's plain
    ``torch.mean`` over padding biases the loss toward zero-pitch/unvoiced frames in
    proportion to how much a batch is padded (SURVEY §7 "padding discipline"). Batches
    without a frame mask fall back to the reference idiom.
    """
    t_dur = batch["y_dur"]
    dur_mask = batch["x_char"] != 0
    logp = jax.nn.log_softmax(dur_logits, axis=-1)
    t_dur_safe = jnp.clip(t_dur, 0, dur_logits.shape[-1] - 1)
    nll = -jnp.take_along_axis(logp, t_dur_safe[..., None], axis=-1)[..., 0]
    loss_duration = (nll * dur_mask).sum() / jnp.maximum(dur_mask.sum(), 1)

    t_pitch = batch["y_pitch"]
    t_vuv = (t_pitch > 1).astype(jnp.float32)
    F = min(t_pitch.shape[1], pitch.shape[1])
    pitch_l1 = jnp.abs(t_pitch[:, :F] / max_pitch - pitch[:, :F]) * t_vuv[:, :F]
    vuv_l1 = jnp.abs(t_vuv[:, :F] - vuv[:, :F])
    fmask = batch.get("y_frame_mask")
    if fmask is None:
        # reference idiom: plain means over the padded batch (cubegan.py:111-112)
        loss_pitch = jnp.mean(pitch_l1) + jnp.mean(vuv_l1)
    else:
        m = fmask[:, :F].astype(jnp.float32)
        denom = jnp.maximum(m.sum(), 1.0)
        loss_pitch = (pitch_l1 * m).sum() / denom + (vuv_l1 * m).sum() / denom
    return loss_duration, loss_pitch
