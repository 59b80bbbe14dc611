"""CubenetTextcoder — legacy Tacotron-like autoregressive acoustic model.

Reference: ``cube/networks/textcoder.py``. Phoneme encoder (emb → char CNN → BiLSTM) →
duration head; length-regulated overlay BiLSTM; pitch classification head; AR mel decoder
(PreNet on the previous group's last mel frame + 2-layer LSTM(512) emitting `pframes`
frames per step + PostNet residual).

TPU redesign: teacher-forced training is fully parallel (the PreNet input is just the
strided/shifted target mel); free-running inference is an `nn.scan` over decoder groups
(the reference loops on the host, textcoder.py:177-183). PreNet dropout stays ON at
inference (Tacotron-2 trick kept by the reference, modules.py:163) via a "dropout" rng
stream. Inference lives in `TextcoderInfer` (scan-lifted cells have a different param
layout; `textcoder_infer_params` remaps the training tree).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from ttscube_tpu.models.blocks import PostNet, PreNet
from ttscube_tpu.models.languasito import MaskedEmbed
from ttscube_tpu.ops.conv import Conv1d
from ttscube_tpu.ops.length_regulator import durations_to_frame2phone, regulate_length
from ttscube_tpu.ops.rnn import LSTM, LSTMCell

MEL_SIZE = 80
PRENET_SIZE = 256
MEL_RNN_SIZE = 512
MEL_RNN_LAYERS = 2
OVERLAY_RNN_SIZE = 512


@dataclasses.dataclass(frozen=True)
class TextcoderConfig:
    num_phones: int
    num_speakers: int
    max_pitch: int
    max_duration: int
    pframes: int = 3
    lr: float = 2e-4


class _TextEncoder(nn.Module):
    config: TextcoderConfig

    @nn.compact
    def __call__(self, x_char, x_speaker):
        c = self.config
        h = MaskedEmbed(c.num_phones + 1, 64, name="phon_emb")(x_char)
        spk = MaskedEmbed(c.num_speakers + 1, 128, name="speaker_emb")(x_speaker)
        for i in range(3):
            h = jnp.tanh(Conv1d(256, 3, w_init_gain="tanh", name=f"char_cnn_{i}")(h))
        h, _ = LSTM(256, num_layers=2, bidirectional=True, name="rnn_char")(h)
        spk = jnp.broadcast_to(spk, (h.shape[0], h.shape[1], 128))
        return jnp.concatenate([h, spk], axis=-1)


def _run_encoder(cfg: TextcoderConfig, X):
    """Shared front-end; call inside a compact method (creates named submodules)."""
    enc = _TextEncoder(cfg, name="encoder")(X["x_char"], X["x_speaker"])
    hidden_dur, _ = LSTM(256, num_layers=2, bidirectional=True, name="dur_rnn")(enc)
    dur_logits = nn.Dense(cfg.max_duration + 1, name="dur_output",
                          kernel_init=nn.initializers.xavier_uniform())(hidden_dur)
    return enc, dur_logits


def _run_overlay_and_pitch(cfg: TextcoderConfig, enc, frame2phone):
    # decoder runs at pframes-grouped rate: phone of frame jj·pframes
    # (reference `_expand` textcoder.py:291-302)
    f2p_group = frame2phone[:, :: cfg.pframes]
    hidden = regulate_length(enc, f2p_group)
    hidden, _ = LSTM(OVERLAY_RNN_SIZE, num_layers=2, bidirectional=True,
                     name="rnn_overlay")(hidden)
    hp, _ = LSTM(256, num_layers=2, bidirectional=True, name="pitch_rnn")(hidden)
    pitch_logits = nn.Dense(cfg.max_pitch + 1, name="pitch_output",
                            kernel_init=nn.initializers.xavier_uniform())(hp)
    return hidden, pitch_logits


class CubenetTextcoder(nn.Module):
    """Teacher-forced pass → (dur_logits, pitch_logits, mel_pre, mel_post)."""

    config: TextcoderConfig

    def _prepare_mel(self, mel):
        """Teacher input per decoder group: previous group's last frame, −5 go frame
        (reference `_prepare_mel` textcoder.py:304-308)."""
        c = self.config
        last_of_group = mel[:, c.pframes - 1 :: c.pframes][:, :-1]
        go = jnp.full((mel.shape[0], 1, MEL_SIZE), -5.0)
        return jnp.concatenate([go, last_of_group], axis=1)

    @nn.compact
    def __call__(self, X, train: bool = False):
        c = self.config
        enc, dur_logits = _run_encoder(c, X)
        hidden, pitch_logits = _run_overlay_and_pitch(c, enc, X["y_frame2phone"])
        cond_mel = self._prepare_mel(X["y_mgc"])
        T_dec = min(hidden.shape[1], cond_mel.shape[1])
        rng = self.make_rng("dropout")
        pm = PreNet(sizes=(PRENET_SIZE, PRENET_SIZE), name="prenet")(cond_mel[:, :T_dec], rng=rng)
        h = jnp.concatenate([hidden[:, :T_dec], pm], axis=-1)
        h, _ = LSTM(MEL_RNN_SIZE, num_layers=MEL_RNN_LAYERS, name="mel_rnn")(h)
        mel_pre = nn.Dense(MEL_SIZE * c.pframes, name="mel_output",
                           kernel_init=nn.initializers.xavier_uniform())(h)
        mel_pre = mel_pre.reshape(mel_pre.shape[0], -1, MEL_SIZE)
        post = PostNet(name="postnet")(mel_pre, train=train)
        return dur_logits, pitch_logits, mel_pre, mel_pre + post


class _MelDecoderStep(nn.Module):
    config: TextcoderConfig

    @nn.compact
    def __call__(self, carry, hidden_t):
        c = self.config
        states, last_mel = carry
        rng = self.make_rng("dropout")
        pm = PreNet(sizes=(PRENET_SIZE, PRENET_SIZE), name="prenet")(last_mel, rng=rng)
        h = jnp.concatenate([hidden_t, pm], axis=-1)
        new_states = []
        for i, st in enumerate(states):
            st, h = LSTMCell(MEL_RNN_SIZE, name=f"mel_cell_{i}")(st, h)
            new_states.append(st)
        out = nn.Dense(MEL_SIZE * c.pframes, name="mel_output",
                       kernel_init=nn.initializers.xavier_uniform())(h)
        last_mel = out[:, -MEL_SIZE:]
        return (tuple(new_states), last_mel), out


class TextcoderInfer(nn.Module):
    """Free-running synthesis → ((B, T_dec·pframes, 80) post-net mel, frame mask).

    Apply with params from `textcoder_infer_params(train_params)` and rng streams
    {"dropout"} (PreNet dropout stays on).
    """

    config: TextcoderConfig
    max_frames: int = 1200

    @nn.compact
    def __call__(self, X):
        c = self.config
        enc, dur_logits = _run_encoder(c, X)
        durs = jnp.argmax(dur_logits, axis=-1) * (X["x_char"] != 0)
        n_valid = (X["x_char"] != 0).sum(axis=-1)
        frame2phone, frame_mask = durations_to_frame2phone(durs, n_valid, self.max_frames)
        hidden, _ = _run_overlay_and_pitch(c, enc, frame2phone)

        B = hidden.shape[0]
        step = nn.scan(
            _MelDecoderStep,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=0,
            out_axes=0,
        )(c, name="ar")
        states0 = tuple(LSTMCell.initial_state(B, MEL_RNN_SIZE)
                        for _ in range(MEL_RNN_LAYERS))
        carry0 = (states0, jnp.full((B, MEL_SIZE), -5.0))
        _, outs = step(carry0, jnp.swapaxes(hidden, 0, 1))
        mel = jnp.swapaxes(outs, 0, 1).reshape(B, -1, MEL_SIZE)
        post = PostNet(name="postnet")(mel, train=False)
        return mel + post, frame_mask


def textcoder_infer_params(variables):
    """Remap training variables → TextcoderInfer's tree (mel_rnn layers → ar/mel_cell_i)."""
    params = dict(variables["params"])
    ar = {}
    rnn = params.pop("mel_rnn")
    for i in range(MEL_RNN_LAYERS):
        ar[f"mel_cell_{i}"] = {"wi": rnn[f"wi_l{i}"], "wh": rnn[f"wh_l{i}"],
                               "b": rnn[f"b_l{i}"]}
    ar["prenet"] = params.pop("prenet")
    ar["mel_output"] = params.pop("mel_output")
    params["ar"] = ar
    out = {"params": params}
    if "batch_stats" in variables:
        out["batch_stats"] = variables["batch_stats"]
    return out


def textcoder_losses(outputs, batch, config: TextcoderConfig):
    """CE(dur) + CE(pitch) + L1(pre) + L1(post) (reference training_step :191-226)."""
    dur_logits, pitch_logits, mel_pre, mel_post = outputs
    dur_mask = batch["x_char"] != 0
    t_dur = jnp.clip(batch["y_dur"], 0, config.max_duration)
    logp = jax.nn.log_softmax(dur_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, t_dur[..., None], axis=-1)[..., 0]
    loss_dur = (nll * dur_mask).sum() / jnp.maximum(dur_mask.sum(), 1)

    # pitch targets at group rate: last frame of each group (reference _prepare_pitch)
    t_pitch = batch["y_pitch"][:, config.pframes - 1 :: config.pframes]
    T = min(t_pitch.shape[1], pitch_logits.shape[1])
    t_pitch_i = jnp.clip(t_pitch[:, :T].astype(jnp.int32), 0, config.max_pitch)
    mask_p = batch["y_frame_mask"][:, config.pframes - 1 :: config.pframes][:, :T]
    logp = jax.nn.log_softmax(pitch_logits[:, :T], axis=-1)
    nll = -jnp.take_along_axis(logp, t_pitch_i[..., None], axis=-1)[..., 0]
    loss_pitch = (nll * mask_p).sum() / jnp.maximum(mask_p.sum(), 1)

    t_mel = batch["y_mgc"]
    T = min(t_mel.shape[1], mel_pre.shape[1])
    fmask = batch["y_frame_mask"][:, :T, None]
    denom = jnp.maximum(fmask.sum() * MEL_SIZE, 1)
    loss_pre = (jnp.abs(mel_pre[:, :T] - t_mel[:, :T]) * fmask).sum() / denom
    loss_post = (jnp.abs(mel_post[:, :T] - t_mel[:, :T]) * fmask).sum() / denom
    total = loss_dur + loss_pitch + loss_pre + loss_post
    return {"loss": total, "loss_dur": loss_dur, "loss_pitch": loss_pitch,
            "loss_mel_pre": loss_pre, "loss_mel_post": loss_post}
