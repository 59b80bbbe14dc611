"""Legacy textcoder trainer CLI (reference ``scripts/train_textcoder.py``: pframes=3,
devset synthesis via a standalone HiFi-GAN checkpoint)."""

import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _train(args):
    import jax
    import jax.numpy as jnp

    from ttscube_tpu.data.collate import TextcoderCollate
    from ttscube_tpu.data.datasets import CubeganDataset
    from ttscube_tpu.data.encodings import TextcoderEncodings
    from ttscube_tpu.models.textcoder import CubenetTextcoder, TextcoderConfig
    from ttscube_tpu.train.loop import train
    from ttscube_tpu.train.states import (
        create_textcoder_state, textcoder_train_step, textcoder_val_step)
    from ttscube_tpu.utils.checkpoint import save_config

    trainset = CubeganDataset(args.train_folder)
    devset = CubeganDataset(args.dev_folder)
    enc_path = args.output_base + ".encodings"
    encodings = TextcoderEncodings()
    if os.path.exists(enc_path) and args.resume:
        encodings.load(enc_path)
    else:
        encodings.compute(trainset)
        encodings.save(enc_path)
    save_config(args.output_base, {
        "sample_rate": args.sample_rate, "hop_size": args.hop_size,
        "pframes": args.pframes})

    cfg = TextcoderConfig(num_phones=len(encodings.phon2int),
                          num_speakers=len(encodings.speaker2int),
                          max_pitch=int(encodings.max_pitch),
                          max_duration=int(encodings.max_duration),
                          pframes=args.pframes, lr=args.lr)
    model = CubenetTextcoder(cfg)
    collate = TextcoderCollate(encodings, hop=args.hop_size)

    example = {k: jnp.asarray(v) for k, v in collate([trainset[0]]).items()}
    state = create_textcoder_state(model, jax.random.PRNGKey(0), example, lr=args.lr)
    step = jax.jit(lambda s, b, r: textcoder_train_step(model, s, b, r, lr=args.lr))
    vstep = jax.jit(lambda s, b, r: textcoder_val_step(model, s, b, r))

    train(state=state, train_step=step, val_step=vstep,
          trainset=trainset, devset=devset, collate=collate,
          batch_size=args.batch_size, output_base=args.output_base,
          selection_metric="loss", max_epochs=args.max_epochs,
          max_steps=args.max_steps, resume=args.resume,
          cache_batches=args.cache_batches)


if __name__ == "__main__":
    parser = ArgumentParser(description="ttscube_tpu textcoder trainer")
    parser.add_argument("--output-base", dest="output_base", default="data/textcoder")
    parser.add_argument("--train-folder", dest="train_folder",
                        default="data/processed/train")
    parser.add_argument("--dev-folder", dest="dev_folder", default="data/processed/dev")
    parser.add_argument("--batch-size", dest="batch_size", type=int, default=16)
    parser.add_argument("--sample-rate", dest="sample_rate", type=int, default=24000)
    parser.add_argument("--hop-size", dest="hop_size", type=int, default=240)
    parser.add_argument("--pframes", dest="pframes", type=int, default=3)
    parser.add_argument("--lr", dest="lr", type=float, default=2e-4)
    parser.add_argument("--max-epochs", dest="max_epochs", type=int, default=-1)
    parser.add_argument("--max-steps", dest="max_steps", type=int, default=-1)
    parser.add_argument("--cache-batches", dest="cache_batches",
                        action="store_true", default=False,
                        help="iterate a device-resident cache of all collated batches (order reshuffles per epoch, composition frozen) — avoids the axon relay client's per-transfer host-memory leak on long runs; requires the collated set to fit the HBM budget")
    parser.add_argument("--resume", dest="resume", action="store_true")
    _train(parser.parse_args())
