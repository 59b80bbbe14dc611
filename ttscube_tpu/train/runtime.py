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

    infer_free = jax.jit(lambda p, x: model.infer(p, x, max_frames=max_frames)[0])
    infer_forced = jax.jit(model.forward)

    for i in range(n):
        example = dataset[i]
        if speaker is not None:
            example["meta"]["speaker"] = speaker
        batch = collate([example])
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        if free:
            Xi = {k: v for k, v in batch.items() if k.startswith("x_")}
            audio = infer_free(params, Xi)
        else:
            audio = infer_forced(params, batch)
        audio = np.asarray(jax.device_get(audio))[0]
        write_wav(os.path.join(output_path, f"{example['meta']['id']}.wav"),
                  audio, model.config.sample_rate)
