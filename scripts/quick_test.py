"""Smoke/overfit harness (the reference's ``scripts/quick_test.py`` idea, done properly:
its constructor calls were stale, SURVEY §4). Builds a 2-example batch from a processed
corpus and runs an N-step overfit loop on the Cubegan GAN step, printing losses — loss
must drop or something is broken."""

import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(args):
    import jax
    import jax.numpy as jnp

    from ttscube_tpu.data.collate import CubeganCollate
    from ttscube_tpu.data.datasets import CubeganDataset
    from ttscube_tpu.data.encodings import CubeganEncodings
    from ttscube_tpu.models.cubegan import (
        Cubegan, CubeganConfig, create_train_state, train_step, val_step)
    from ttscube_tpu.models.hifigan import HifiganConfig
    from ttscube_tpu.models.languasito import LanguasitoConfig

    ds = CubeganDataset(args.folder)
    enc = CubeganEncodings()
    enc.compute(ds)
    cfg = CubeganConfig(
        languasito=LanguasitoConfig(num_phones=len(enc.phon2int),
                                    num_speakers=len(enc.speaker2int),
                                    max_pitch=enc.max_pitch,
                                    max_duration=enc.max_duration),
        hifigan=HifiganConfig(upsample_initial_channel=args.channels),
        mpd_channels=(16, 64) if args.small else (32, 128, 512, 1024),
        msd_width=16 if args.small else 128,
    )
    model = Cubegan(cfg)
    collate = CubeganCollate(enc)
    batch = {k: jnp.asarray(v) for k, v in collate([ds[0], ds[min(1, len(ds) - 1)]]).items()}

    state = create_train_state(model, jax.random.PRNGKey(0), batch)
    step = jax.jit(lambda s, b, r: train_step(model, s, b, r))
    vstep = jax.jit(lambda s, b, r: val_step(model, s, b, r))

    rng = jax.random.PRNGKey(1)
    for i in range(args.steps):
        rng, sub = jax.random.split(rng)
        state, m = step(state, batch, sub)
        if i % args.log_every == 0 or i == args.steps - 1:
            f = jax.device_get(m)
            print(f"step {i}: " + " ".join(f"{k}={float(v):.4f}"
                                           for k, v in sorted(f.items())))
    v = jax.device_get(vstep(state, batch, rng))
    print("final val: " + " ".join(f"{k}={float(x):.4f}" for k, x in sorted(v.items())))


if __name__ == "__main__":
    parser = ArgumentParser(description="ttscube_tpu overfit smoke test")
    parser.add_argument("--folder", default="data/processed/dev")
    parser.add_argument("--steps", type=int, default=1000)
    parser.add_argument("--log-every", dest="log_every", type=int, default=50)
    parser.add_argument("--small", action="store_true",
                        help="small discriminators for fast iteration")
    parser.add_argument("--channels", type=int, default=512,
                        help="generator upsample_initial_channel")
    main(parser.parse_args())
