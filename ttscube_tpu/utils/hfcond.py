"""HF-conditioning inference frontend for TTSCube.

The reference builds an ``HFTokenizer`` from the conditioning spec at API load
(api.py:32-35) and feeds `words_hf` with empty left/right context windows
(api.py:54-57). Same here, network-free: the tokenizer must resolve from the local
model directory named in the packaged yaml's conditioning spec.
"""

from __future__ import annotations

import os

import yaml

from ttscube_tpu.utils.hf import HFTokenizer


class HFCondFrontend:
    def __init__(self, model_dir: str):
        self.tokenizer = HFTokenizer(model_dir)

    @classmethod
    def from_packaged(cls, model_path: str) -> "HFCondFrontend":
        # exports since r4 carry the tokenizer files next to the model as
        # '<model>.hf/' (scripts/export_model.py) — prefer that, it makes the
        # download portable across machines
        packaged = model_path + ".hf"
        if os.path.isdir(packaged):
            return cls(packaged)
        conf = yaml.safe_load(open(model_path + ".yaml"))
        spec = conf.get("conditioning") or ""
        if ":" not in spec:
            raise ValueError(f"'{model_path}.yaml' conditioning spec '{spec}' names no "
                             "tokenizer directory")
        model_dir = spec.split(":", 1)[1]
        if not os.path.isdir(model_dir):
            raise FileNotFoundError(
                f"hf-conditioned model: tokenizer directory '{model_dir}' (from the "
                f"packaged conditioning spec) not found locally — place the HF "
                "tokenizer files there or retrain with a portable path")
        return cls(model_dir)

    def __call__(self, meta: dict) -> dict:
        """Add HF token metadata to a Text2Feat meta dict (reference api.py:54-57)."""
        meta["words_hf"] = self.tokenizer(meta["words"])
        meta["words_left_hf"] = {"tok_ids": [], "word2tok": {}}
        meta["words_right_hf"] = {"tok_ids": [], "word2tok": {}}
        return meta
