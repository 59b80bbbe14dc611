"""TTSCube — the public synthesis API (reference ``cube/api.py``).

Usage:
    cube = TTSCube("path/to/cubegan", "path/to/phonemizer")   # local artifacts
    cube = TTSCube.load("blizzard2023")                        # download by name
    audio_int16 = cube("Hello world!", speaker="neb")

TPU design: synthesis is two jitted stages — (1) the text tower predicts durations and
the total frame count comes back to the host (one small sync, same as the reference's
duration argmax at modules.py:946); (2) the full expand→pitch→conditioning→HiFi-GAN
graph runs at a *bucketed* static frame count, so repeated calls reuse cached
executables per bucket instead of recompiling per utterance length.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import yaml

from ttscube_tpu.data.collate import CubeganCollate
from ttscube_tpu.data.encodings import CubeganEncodings, PhonemizerEncodings
from ttscube_tpu.data.text import Text2FeatBlizzard
from ttscube_tpu.models.cubegan import Cubegan, CubeganConfig
from ttscube_tpu.models.languasito import LanguasitoConfig
from ttscube_tpu.models.phonemizer import Phonemizer, PhonemizerConfig
from ttscube_tpu.utils.checkpoint import load_params
from ttscube_tpu.utils.repository import download_model

FRAME_BUCKET = 256
MAX_FRAMES = 8192
CHAR_BUCKET = 32


class TTSCube:
    def __init__(self, model_path: str, phonemizer_path: str):
        import jax
        import jax.numpy as jnp

        from ttscube_tpu.models.hifigan import HifiganConfig

        encodings = CubeganEncodings(model_path + ".encodings")
        conf = yaml.safe_load(open(model_path + ".yaml"))
        cond_type = conf.get("conditioning")
        cond_type = cond_type.split(":")[0] if cond_type else None
        self.encodings = encodings
        hifi_kwargs = {k: (tuple(tuple(x) if isinstance(x, list) else x for x in v)
                           if isinstance(v, list) else v)
                       for k, v in (conf.get("hifigan") or {}).items()}
        # serving defaults (a checkpoint yaml can opt out of either explicitly):
        # fused pallas tail resblocks (1.73x e2e at B=32, exact vs the flax path;
        # above fuse_max_batch the plain-XLA path runs) + bf16-resident activations
        # between generator convs (the generator is HBM-bound: 1.44x generator-only
        # at B=128, no extra matmul rounding — the MXU reads fp32 inputs at bf16
        # precision anyway; see HifiganConfig.storage_dtype)
        hifi_kwargs.setdefault("fused_tail", True)
        hifi_kwargs.setdefault("storage_dtype", "bfloat16")
        lm = None
        lm_config = None
        if cond_type == "hf":
            from ttscube_tpu.models.lm import LMConfig, TransformerEncoder

            lm_config = LMConfig(**conf["lm_config"])
            lm = TransformerEncoder(lm_config)
        self.config = CubeganConfig(
            languasito=LanguasitoConfig(
                num_phones=len(encodings.phon2int),
                num_speakers=len(encodings.speaker2int),
                max_pitch=encodings.max_pitch,
                max_duration=encodings.max_duration,
                cond_type=cond_type,
                lm_dim=lm_config.hidden_size if lm_config is not None else None),
            hifigan=HifiganConfig(**hifi_kwargs),
            sample_rate=conf.get("sample_rate", 24000),
            hop_size=conf.get("hop_size", 240),
        )
        self.model = Cubegan(self.config, train=False, lm=lm)

        # conditioned models need a word_embedder to produce x_words at inference
        # (reference api.py:22-25 rebuilds the fastText model; we ship the table)
        word_embedder = None
        self.hf_frontend = None
        if cond_type == "fasttext":
            from ttscube_tpu.utils.wordvec import WordVectors

            wv_path = model_path + ".wordvec.npz"
            if not os.path.exists(wv_path):
                raise FileNotFoundError(
                    f"model is fasttext-conditioned but '{wv_path}' is missing — "
                    "re-export with scripts/export_model.py --wordvec <table>")
            word_embedder = WordVectors.load_npz(wv_path)
        elif cond_type == "hf":
            from ttscube_tpu.utils.hfcond import HFCondFrontend

            self.hf_frontend = HFCondFrontend.from_packaged(model_path)
        # bucket_words: pad the word axis (x_words/x_word2tok) to multiples of 8 so
        # requests with nearby word counts share one jit trace — without it every
        # distinct word count is a fresh ~20-40 s TPU compile that warmup can't cover
        self.collate = CubeganCollate(encodings, word_embedder=word_embedder,
                                      hop=self.config.hop_size,
                                      hf_conditioning=cond_type == "hf",
                                      bucket_words=8)

        # synthesis params template {lang, gen} → load msgpack. Commit the tree to
        # the accelerator ONCE: load_params returns host numpy arrays, and passing
        # those to a jitted call re-uploads the whole model per dispatch (~2 s/call
        # through the TPU relay, measured).
        template = self._init_template()
        self.params = jax.device_put(load_params(model_path + ".model", template))

        # phonemizer frontend
        penc = PhonemizerEncodings(phonemizer_path + ".encodings")
        pcfg = PhonemizerConfig(num_graphemes=len(penc.graphemes),
                                num_phonemes=len(penc.phonemes))
        pmodel = Phonemizer(pcfg)
        ptemplate = jax.device_get(pmodel.init(
            jax.random.PRNGKey(0),
            {"x_char": jnp.zeros((1, 8), jnp.int32),
             "x_case": jnp.zeros((1, 8), jnp.int32)})["params"])
        pparams = load_params(phonemizer_path + ".model", ptemplate)
        self.text2feat = Text2FeatBlizzard(penc, pmodel, pparams)

        self._dur_fn = jax.jit(self._durations)
        self._infer_cache = {}

    def _init_template(self):
        import jax
        import jax.numpy as jnp

        def init(rng):
            batch = {
                "x_char": jnp.zeros((1, 8), jnp.int32),
                "x_speaker": jnp.zeros((1, 1), jnp.int32),
                "y_frame2phone": jnp.zeros((1, 16), jnp.int32),
                "y_pitch": jnp.zeros((1, 16), jnp.float32),
            }
            if self.config.languasito.cond_type is not None:
                batch["x_words"] = jnp.zeros(
                    (1, 4, self.config.languasito.lm_input_dim), jnp.float32)
                batch["x_phon2word"] = jnp.zeros((1, 8), jnp.int32)
            lang = self.model.languasito.init(rng, batch)["params"]
            gen = self.model.generator.init(jax.random.fold_in(rng, 1),
                                            jnp.zeros((1, 4, 80)))["params"]
            params = {"lang": lang, "gen": gen}
            if self.model.lm is not None:
                params["hf"] = self.model.lm.init(
                    jax.random.fold_in(rng, 2), jnp.zeros((1, 8), jnp.int32))["params"]
            return params

        if jax.default_backend() == "cpu":
            return jax.device_get(init(jax.random.PRNGKey(0)))
        return jax.device_get(jax.jit(init)(jax.random.PRNGKey(0)))

    def _durations(self, params, X):
        import jax.numpy as jnp

        from ttscube_tpu.models.languasito import Languasito2

        X = self.model.lm_condition(params, X)
        dur_logits, _, _ = self.model.languasito.apply(
            {"params": params["lang"]}, X,
            method=lambda m, X: m.text_forward(
                X, frame2phone=jnp.zeros((X["x_char"].shape[0], 1), jnp.int32)))
        durs = jnp.argmax(dur_logits, axis=-1) * (X["x_char"] != 0)
        return durs.sum()

    def _infer_at(self, max_frames: int):
        import jax

        if max_frames not in self._infer_cache:
            self._infer_cache[max_frames] = jax.jit(
                lambda p, x: self.model.infer(p, x, max_frames=max_frames)[0])
        return self._infer_cache[max_frames]

    def warmup(self, frame_buckets=(FRAME_BUCKET, 2 * FRAME_BUCKET),
               char_lens=(CHAR_BUCKET, 2 * CHAR_BUCKET), speaker: str = "none"):
        """Precompile the duration pass and the synthesis executables for the given
        (text-length, frame-budget) buckets so first real requests don't pay the
        ~20-40 s jit compile. Serving deployments call this once at startup.

        Inputs are built through the REAL text→phonemizer→collate path (`_prepare`) —
        not hand-assembled arrays — so the warmed trace signatures (key set, bucketed
        phone/word/token axes, conditioning arrays) exactly match live requests."""
        import jax

        for n in char_lens:
            # a synthetic text whose phonemization lands near the n-phone collate
            # bucket: the aligned phonemizer maps chars ~1:1 (minus '_' deletions), so
            # ~n chars of short words is close enough — and whatever bucket results
            # is, by construction, a signature real requests produce
            text = " ".join("ab" for _ in range(max(1, n // 3)))[: max(n - 1, 2)]
            Xi = self._prepare(text, speaker)
            jax.block_until_ready(self._dur_fn(self.params, Xi))
            for b in frame_buckets:
                jax.block_until_ready(self._infer_at(b)(self.params, Xi))

    @staticmethod
    def load(model_name: str) -> "TTSCube":
        base = os.path.join(str(Path.home()), ".ttscube", "models", model_name)
        if not os.path.exists(os.path.join(base, "cubegan.model")):
            os.makedirs(base, exist_ok=True)
            download_model(base, model_name)
        return TTSCube(os.path.join(base, "cubegan"), os.path.join(base, "phonemizer"))

    def _prepare(self, text: str, speaker: str):
        """text → phonemize → collate → device input dict (the jit trace signature)."""
        import jax.numpy as jnp

        meta = self.text2feat(text)
        meta["speaker"] = speaker
        meta["frame2phon"] = [0]  # placeholder; free synthesis predicts durations
        if self.hf_frontend is not None:
            meta = self.hf_frontend(meta)
        example = {"meta": meta, "mgc": np.zeros((8, 80), np.float32),
                   "pitch": np.zeros((8,), np.float32)}
        X = self.collate([example])
        # the collate buckets the phone axis (multiples of bucket_phones=32), so texts
        # of nearby lengths share one executable rather than compiling per length
        return {k: jnp.asarray(v) for k, v in X.items() if k.startswith("x_")}

    def __call__(self, text: str, speaker: str = "none") -> np.ndarray:
        import jax

        Xi = self._prepare(text, speaker)
        total = int(jax.device_get(self._dur_fn(self.params, Xi)))
        total = max(total, 1)  # all-unknown phones predict 0 frames; emit 1 frame of
        # silence instead of a zero-length array
        bucket = int(np.clip(
            ((total + FRAME_BUCKET - 1) // FRAME_BUCKET) * FRAME_BUCKET,
            FRAME_BUCKET, MAX_FRAMES))
        audio = self._infer_at(bucket)(self.params, Xi)
        audio = np.asarray(jax.device_get(audio))[0]
        audio = audio[: total * self.config.hop_size]
        return np.asarray(np.clip(audio, -1, 1) * 32767, dtype=np.int16)


if __name__ == "__main__":
    import sys

    from ttscube_tpu.utils.wavio import write_wav

    model = TTSCube.load(sys.argv[1] if len(sys.argv) > 1 else "blizzard2023")
    audio = model("Hello! This is a speech synthesis test.", speaker="neb")
    write_wav("tmp.wav", audio, 24000)
