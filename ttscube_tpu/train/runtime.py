"""Devset synthesis + spectrogram rendering (reference ``cube/io_utils/runtime.py``)."""

from __future__ import annotations

import os

import numpy as np


def render_spectrogram(mgc: np.ndarray, output_file: str):
    """(T, n_mels) → grayscale PNG, low bands at the bottom (reference runtime.py:25-38,
    vectorized instead of the per-pixel loop)."""
    from PIL import Image

    mgc = np.asarray(mgc, np.float32)
    lo, hi = float(mgc.min()), float(mgc.max())
    norm = (mgc - lo) / max(hi - lo, 1e-9)
    gray = (norm.T[::-1] * 255).astype(np.uint8)  # (mels, T), flipped
    Image.fromarray(np.stack([gray] * 3, axis=-1)).save(output_file)


def synthesize_devset(textcoder, textcoder_variables, generator, generator_params,
                      dataset, collate, output_path: str,
                      forced_synthesis: bool = True, limit: int = -1,
                      max_frames: int = 1024, sample_rate: int = 24000):
    """Textcoder → mel → standalone HiFi-GAN generator devset synthesis (reference
    ``synthesize_devset`` runtime.py:41-80, incl. the log10→ln mel base conversion at
    runtime.py:77 before feeding the vocoder). Writes PNG + wav per utterance."""
    import math

    import jax
    import jax.numpy as jnp

    from ttscube_tpu.models.textcoder import TextcoderInfer, textcoder_infer_params
    from ttscube_tpu.utils.wavio import write_wav

    os.makedirs(output_path, exist_ok=True)
    n = len(dataset) if limit == -1 else min(limit, len(dataset))
    infer_mod = TextcoderInfer(textcoder.config, max_frames=max_frames)
    infer_vars = textcoder_infer_params(textcoder_variables)
    ln10 = math.log(10.0)

    @jax.jit
    def forced(variables, batch, rng):
        out = textcoder.apply(variables, batch, train=False, rngs={"dropout": rng})
        return out[3]  # post-net mel

    @jax.jit
    def free(variables, batch, rng):
        mel, _ = infer_mod.apply(variables, batch, rngs={"dropout": rng})
        return mel

    @jax.jit
    def vocode(p, mel):
        # features are log10-mel; the GAN generator expects natural-log mel
        return generator.apply({"params": p}, mel * ln10)

    rng = jax.random.PRNGKey(0)
    for i in range(n):
        example = dataset[i]
        batch = collate([example])
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        rng, sub = jax.random.split(rng)
        if forced_synthesis:
            mel = forced(textcoder_variables, batch, sub)
        else:
            Xi = {k: v for k, v in batch.items() if k.startswith("x_")}
            mel = free(infer_vars, Xi, sub)
        mel_np = np.asarray(jax.device_get(mel))[0]
        render_spectrogram(mel_np, os.path.join(output_path,
                                                f"{example['meta']['id']}.png"))
        audio = np.asarray(jax.device_get(vocode(generator_params, mel)))[0]
        write_wav(os.path.join(output_path, f"{example['meta']['id']}.wav"),
                  audio, sample_rate)


def synthesize_from_checkpoint(base: str, dev_folder: str, out_folder: str,
                               limit: int = -1, free: bool = True,
                               which: str = ".last"):
    """Rebuild a Cubegan from trainer artifacts (`{base}.yaml` + `{base}.encodings` +
    `{base}{which}`) and synthesize a devset folder — the standalone equivalent of the
    trainer's periodic `on_epoch_end` generation (scripts/train_cubegan.py), used by
    quality drives to synthesize from the *final* weights regardless of the
    epoch-generation cadence. Reference: ``cubegan_synthesize_dataset`` driven by
    runtime.py:112-132's `__main__` in /root/reference/cube/io_utils/runtime.py."""
    import jax

    from ttscube_tpu.data.collate import CubeganCollate
    from ttscube_tpu.data.datasets import CubeganDataset
    from ttscube_tpu.data.encodings import CubeganEncodings
    from ttscube_tpu.models.cubegan import Cubegan, CubeganConfig, create_train_state
    from ttscube_tpu.models.languasito import LanguasitoConfig
    from ttscube_tpu.utils.checkpoint import load_config, load_params
    from ttscube_tpu.utils.wordvec import make_word_embedder

    conf = load_config(base)
    cond_spec = conf.get("conditioning")
    cond_type = cond_spec.split(":")[0] if cond_spec else None
    lm = None
    lm_config = None
    hf_tokenizer = None
    if cond_type == "hf":
        from ttscube_tpu.models.lm import LMConfig, TransformerEncoder
        from ttscube_tpu.utils.hf import HFTokenizer

        lm_config = LMConfig(**conf["lm_config"])
        lm = TransformerEncoder(lm_config)
        hf_tokenizer = HFTokenizer(cond_spec.split(":", 1)[1])

    encodings = CubeganEncodings(base + ".encodings")
    cfg = CubeganConfig(
        languasito=LanguasitoConfig(
            num_phones=len(encodings.phon2int),
            num_speakers=len(encodings.speaker2int),
            max_pitch=encodings.max_pitch,
            max_duration=encodings.max_duration,
            cond_type=cond_type,
            lm_dim=lm_config.hidden_size if lm_config is not None else None),
        sample_rate=conf.get("sample_rate", 24000),
        hop_size=conf.get("hop_size", 240))
    model = Cubegan(cfg, lm=lm)
    hf_cond = cond_type == "hf"
    dataset = CubeganDataset(dev_folder, hf_tokenizer=hf_tokenizer,
                             hop_size=cfg.hop_size, sample_rate=cfg.sample_rate)
    collate = CubeganCollate(encodings, word_embedder=make_word_embedder(cond_spec),
                             hop=cfg.hop_size, hf_conditioning=hf_cond,
                             bucket_tokens=512 if hf_cond else 64,
                             bucket_words=8 if hf_cond else 1)
    import jax.numpy as jnp
    example = {k: jnp.asarray(v) for k, v in collate([dataset[0]]).items()}
    state = create_train_state(model, jax.random.PRNGKey(0), example)
    params = load_params(base + which, jax.device_get(state.params))
    infer_params = {"lang": params["lang"], "gen": params["gen"]}
    if "hf" in params:
        infer_params["hf"] = params["hf"]
    cubegan_synthesize_dataset(model, infer_params, dataset, collate, out_folder,
                               limit=limit, free=free)


def cubegan_synthesize_dataset(model, params, dataset, collate, output_path: str,
                               limit: int = -1, free: bool = True,
                               max_frames: int = 2048, speaker: str | None = None):
    """Synthesize a devset to wav files (reference runtime.py:83-109).

    `free=True` predicts durations/pitch; `free=False` is forced synthesis using the
    batch's alignments.
    """
    import jax
    import jax.numpy as jnp

    from ttscube_tpu.utils.wavio import write_wav

    os.makedirs(output_path, exist_ok=True)
    n = len(dataset) if limit == -1 else min(limit, len(dataset))

    def _free(p, x):
        audio, aux = model.infer(p, x, max_frames=max_frames)
        return audio, aux["frame_mask"].sum(axis=1)

    infer_free = jax.jit(_free)
    infer_forced = jax.jit(model.forward)

    for i in range(n):
        example = dataset[i]
        if speaker is not None:
            example["meta"]["speaker"] = speaker
        batch = collate([example])
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        if free:
            Xi = {k: v for k, v in batch.items() if k.startswith("x_")}
            audio, n_frames = jax.device_get(infer_free(params, Xi))
            # trim the static max_frames program output to the predicted duration
            audio = audio[:, : int(n_frames[0]) * model.config.hop_size]
        else:
            audio = jax.device_get(infer_forced(params, batch))
            # the collate pads the frame axis to its bucket; trim the synthesized
            # tail back to the example's real frames (the free path above already
            # trims to the *predicted* frame count) — untrimmed padding audio was
            # inflating forced-synthesis MCD by several dB
            if "n_frames" in batch:
                audio = audio[:, : int(batch["n_frames"][0]) * model.config.hop_size]
            elif "y_frame_mask" in batch:
                nf = int(np.asarray(batch["y_frame_mask"])[0].sum())
                audio = audio[:, : nf * model.config.hop_size]
        audio = np.asarray(audio)[0]
        write_wav(os.path.join(output_path, f"{example['meta']['id']}.wav"),
                  audio, model.config.sample_rate)
