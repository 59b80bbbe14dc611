"""TPU-native transformer encoder for LM conditioning.

The reference embeds a live HuggingFace ``AutoModel`` inside Cubegan and trains it with
its own Adam at lr 1e-6 (``cube/networks/cubegan.py:56`` construct, ``:88-89`` forward
in training_step, ``:299-302`` opt_b). TPU redesign: a flax BERT-architecture encoder
(post-LN, erf-GELU) whose params live under ``params["hf"]`` — the `b` optimizer
partition — with a weight importer for *local* torch BERT checkpoints, so pretrained
conditioning works without any hub/network dependency.

All shapes static; the 512-token context window is materialized by the collate
(``data/collate.py``), so the encoder itself is one dense batched pass that XLA maps
straight onto the MXU.
"""

from __future__ import annotations

import dataclasses
import json
import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class LMConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    dropout: float = 0.1
    pad_token_id: int = 0

    @classmethod
    def from_local_dir(cls, model_dir: str) -> "LMConfig":
        """Build from a HF-style config.json in a local model directory."""
        cfg = json.load(open(os.path.join(model_dir, "config.json")))
        return cls(
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg.get("hidden_size", 768),
            num_layers=cfg.get("num_hidden_layers", 12),
            num_heads=cfg.get("num_attention_heads", 12),
            intermediate_size=cfg.get("intermediate_size", 3072),
            max_position=cfg.get("max_position_embeddings", 512),
            type_vocab_size=cfg.get("type_vocab_size", 2),
            layer_norm_eps=cfg.get("layer_norm_eps", 1e-12),
            dropout=cfg.get("hidden_dropout_prob", 0.1),
            pad_token_id=cfg.get("pad_token_id", 0),
        )

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)


class _SelfAttention(nn.Module):
    config: LMConfig

    @nn.compact
    def __call__(self, h, bias, deterministic: bool):
        c = self.config
        B, T, H = h.shape
        hd = c.hidden_size // c.num_heads
        dense = lambda name: nn.Dense(c.hidden_size, name=name)
        q = dense("query")(h).reshape(B, T, c.num_heads, hd)
        k = dense("key")(h).reshape(B, T, c.num_heads, hd)
        v = dense("value")(h).reshape(B, T, c.num_heads, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
        probs = jax.nn.softmax(scores + bias, axis=-1)
        probs = nn.Dropout(c.dropout, name="attn_drop")(probs, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, T, H)
        out = nn.Dense(c.hidden_size, name="output")(ctx)
        return nn.Dropout(c.dropout, name="out_drop")(out, deterministic=deterministic)


class _EncoderLayer(nn.Module):
    config: LMConfig

    @nn.compact
    def __call__(self, h, bias, deterministic: bool):
        c = self.config
        a = _SelfAttention(c, name="attn")(h, bias, deterministic)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="attn_ln")(h + a)
        f = nn.Dense(c.intermediate_size, name="ff_in")(h)
        f = jax.nn.gelu(f, approximate=False)  # BERT's erf GELU
        f = nn.Dense(c.hidden_size, name="ff_out")(f)
        f = nn.Dropout(c.dropout, name="ff_drop")(f, deterministic=deterministic)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="ff_ln")(h + f)


class TransformerEncoder(nn.Module):
    """Returns the last hidden state (B, T, hidden) — the reference's
    ``AutoModel(x_tok_ids)['last_hidden_state']`` (cubegan.py:67-68,88-89)."""

    config: LMConfig

    @nn.compact
    def __call__(self, tok_ids, attn_mask=None, deterministic: bool = True):
        c = self.config
        if attn_mask is None:
            attn_mask = tok_ids != c.pad_token_id
        pos = jnp.arange(tok_ids.shape[1])[None, :]
        h = nn.Embed(c.vocab_size, c.hidden_size, name="word_emb")(tok_ids)
        h = h + nn.Embed(c.max_position, c.hidden_size, name="pos_emb")(pos)
        h = h + nn.Embed(c.type_vocab_size, c.hidden_size,
                         name="type_emb")(jnp.zeros_like(tok_ids))
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="emb_ln")(h)
        h = nn.Dropout(c.dropout, name="emb_drop")(h, deterministic=deterministic)
        bias = jnp.where(attn_mask[:, None, None, :], 0.0,
                         jnp.finfo(jnp.float32).min)
        for i in range(c.num_layers):
            h = _EncoderLayer(c, name=f"layer_{i}")(h, bias, deterministic)
        return h


# -- torch BERT weight import ------------------------------------------------------


def _t(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w, np.float32).T)


def params_from_torch_bert(state_dict, config: LMConfig):
    """Map a torch ``BertModel`` state_dict (HF naming; with or without a 'bert.'
    prefix, pooler ignored) onto TransformerEncoder's param tree."""
    sd = {}
    for k, v in state_dict.items():
        k = k[5:] if k.startswith("bert.") else k
        sd[k] = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                           np.float32)

    def ln(prefix):
        return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}

    def dense(prefix):
        return {"kernel": _t(sd[prefix + ".weight"]), "bias": sd[prefix + ".bias"]}

    params = {
        "word_emb": {"embedding": sd["embeddings.word_embeddings.weight"]},
        "pos_emb": {"embedding": sd["embeddings.position_embeddings.weight"]},
        "type_emb": {"embedding": sd["embeddings.token_type_embeddings.weight"]},
        "emb_ln": ln("embeddings.LayerNorm"),
    }
    for i in range(config.num_layers):
        p = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "attn": {
                "query": dense(p + ".attention.self.query"),
                "key": dense(p + ".attention.self.key"),
                "value": dense(p + ".attention.self.value"),
                "output": dense(p + ".attention.output.dense"),
            },
            "attn_ln": ln(p + ".attention.output.LayerNorm"),
            "ff_in": dense(p + ".intermediate.dense"),
            "ff_out": dense(p + ".output.dense"),
            "ff_ln": ln(p + ".output.LayerNorm"),
        }
    return params


def load_local_lm(model_dir: str):
    """(LMConfig, params or None) from a local HF-style model directory.

    Reads config.json; imports pytorch_model.bin / model.safetensors when present
    (random init otherwise — the caller decides whether that's acceptable)."""
    config = LMConfig.from_local_dir(model_dir)
    params = None
    bin_path = os.path.join(model_dir, "pytorch_model.bin")
    st_path = os.path.join(model_dir, "model.safetensors")
    if os.path.exists(bin_path):
        import torch

        params = params_from_torch_bert(
            torch.load(bin_path, map_location="cpu", weights_only=True), config)
    elif os.path.exists(st_path):
        from safetensors.numpy import load_file

        params = params_from_torch_bert(load_file(st_path), config)
    return config, params
