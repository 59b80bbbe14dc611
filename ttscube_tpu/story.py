"""StoryCube — long-form narration with background-music mixdown and per-paragraph time
metadata (reference ``cube/story.py``)."""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

from ttscube_tpu.api import TTSCube
from ttscube_tpu.utils.wavio import read_wav

SR = 24000


class StoryCube:
    """`base_model` may be a downloadable model name (TTSCube.load), a local model
    base path pair "path/to/cubegan:path/to/phonemizer", or an already-constructed
    TTSCube instance — so locally trained models work without packaging/downloading."""

    def __init__(self, base_model, music_path: str | None = None):
        if isinstance(base_model, TTSCube):
            self._cube = base_model
        elif isinstance(base_model, str) and ":" in base_model:
            cubegan_base, phonemizer_base = base_model.split(":", 1)
            self._cube = TTSCube(cubegan_base, phonemizer_base)
        else:
            self._cube = TTSCube.load(base_model)
        if music_path is None and isinstance(base_model, str) and ":" not in base_model:
            music_path = os.path.join(str(Path.home()), ".ttscube", "models",
                                      base_model, "music.wav")
        self._default_music = (read_wav(music_path, target_sr=SR)[0]
                               if music_path and os.path.exists(music_path)
                               else np.zeros(SR))

    def __call__(self, text: str, speaker: str = "none",
                 background_music_path: str | None = None) -> dict:
        parts = text.split("\n\n")
        chunks = [np.zeros(SR * 5, np.float32)]  # 5 s intro
        metadata = [{"name": "intro", "start": 0, "end": 5, "text": ""}]
        start = 5.0
        for part in parts:
            audio = self._cube(part, speaker=speaker).astype(np.float32) / 32767.0
            chunks.append(audio)
            chunks.append(np.zeros(SR, np.float32))  # 1 s pause
            dur = len(audio) / SR + 1
            metadata.append({"name": "paragraph", "text": part,
                             "start": start, "end": start + dur})
            start += dur
        chunks.append(np.zeros(SR * 5, np.float32))  # 5 s outro
        voice = np.concatenate(chunks)

        music = self._default_music
        if background_music_path is not None:
            music, _ = read_wav(background_music_path, target_sr=SR)
        tiled = np.resize(music, voice.shape[0]) if len(music) else np.zeros_like(voice)
        mix = np.clip(tiled * 0.30 + voice, -1.0, 1.0)
        return {"audio": (mix * 32700).astype(np.int16), "meta": metadata}
