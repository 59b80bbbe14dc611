"""Vocoder xRT harness (reference ``cube/networks/vocoder.py`` ``__main__`` :193-261:
loads a model, vocodes a wav, prints "generated {N} s of audio in {T}").

Modes:
  --model hifigan  : feed-forward HiFi-GAN generator (the live Cubegan vocoder path)
  --model wavernn  : chunk-parallel dual WaveRNN (legacy AR path)
Random weights by default (throughput is weight-independent); optionally --load.
"""

import os
import sys
import time
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(args):
    import numpy as np
    import jax
    import jax.numpy as jnp

    frames = args.seconds * 24000 // 240
    mel = jax.random.normal(jax.random.PRNGKey(0), (args.batch, frames, 80)) - 4.0

    if args.model == "hifigan":
        from ttscube_tpu.models.hifigan import Generator, HifiganConfig

        g = Generator(HifiganConfig())
        params = jax.jit(g.init)(jax.random.PRNGKey(0), jnp.zeros((1, 8, 80)))

        @jax.jit
        def run(p, m):
            return jnp.abs(g.apply(p, m)).mean()

        float(run(params, mel))
        t0 = time.perf_counter()
        float(run(params, mel))
        wall = time.perf_counter() - t0
    else:
        from ttscube_tpu.models.wavernn import CubenetVocoder, VocoderConfig

        voc = CubenetVocoder(VocoderConfig(output=args.output))
        x = jnp.zeros((1, frames * 240))
        x_low = jnp.zeros((1, frames * 24))
        params = voc.init(jax.random.PRNGKey(0), mel[:1], x, x_low)

        t0 = time.perf_counter()
        _, audio = voc.infer(params, mel[:1], jax.random.PRNGKey(1),
                             num_chunks=args.chunks)
        np.asarray(jax.device_get(audio))
        wall = time.perf_counter() - t0

    audio_sec = args.batch * args.seconds if args.model == "hifigan" else args.seconds
    print(f"generated {audio_sec:.1f} seconds of audio in {wall:.3f}s "
          f"-> {audio_sec / wall:.1f}x real-time")


if __name__ == "__main__":
    parser = ArgumentParser(description="ttscube_tpu vocoder xRT harness")
    parser.add_argument("--model", choices=["hifigan", "wavernn"], default="hifigan")
    parser.add_argument("--seconds", type=int, default=10)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--chunks", type=int, default=20)
    parser.add_argument("--output", default="mol")
    main(parser.parse_args())
