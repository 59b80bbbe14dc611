"""Phonemizer trainer CLI (reference ``scripts/train_phonemizer.py``: trains the M2M
model, selects on PACC/SACC writing `.pacc.best`/`.sacc.best`)."""

import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _train(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ttscube_tpu.data.collate import PhonemizerCollate
    from ttscube_tpu.data.datasets import PhonemizerDataset, batch_iterator
    from ttscube_tpu.data.encodings import PhonemizerEncodings
    from ttscube_tpu.models.phonemizer import Phonemizer, PhonemizerConfig, PhonemizerM2M
    from ttscube_tpu.train.loop import train
    from ttscube_tpu.train.states import (
        create_phonemizer_state, phonemizer_train_step, phonemizer_val_step)
    from ttscube_tpu.utils.checkpoint import save_params

    trainset = PhonemizerDataset(args.train_file)
    devset = PhonemizerDataset(args.dev_file)
    enc_path = args.output_base + ".encodings"
    encodings = PhonemizerEncodings()
    if os.path.exists(enc_path) and args.resume:
        encodings.load(enc_path)
    else:
        encodings.compute(trainset)
        encodings.save(enc_path)

    cfg = PhonemizerConfig(num_graphemes=len(encodings.graphemes),
                           num_phonemes=len(encodings.phonemes))
    model = PhonemizerM2M(cfg) if args.model_type == "m2m" else Phonemizer(cfg)
    collate = PhonemizerCollate(encodings)

    example = {k: jnp.asarray(v) for k, v in collate([trainset[0]]).items()}
    state = create_phonemizer_state(model, jax.random.PRNGKey(0), example, lr=args.lr)
    step = jax.jit(lambda s, b, r: phonemizer_train_step(model, s, b, r, lr=args.lr))
    vstep = jax.jit(lambda s, b, r: phonemizer_val_step(model, s, b, r))

    best = {"pacc": -1.0, "sacc": -1.0}

    def on_epoch_end(epoch, st):
        accs = []
        for batch in batch_iterator(devset, args.batch_size, collate, shuffle=False):
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            accs.append(jax.device_get(vstep(st, batch, jax.random.PRNGKey(0))))
        if not accs:
            return
        pacc = float(np.mean([a["pacc"] for a in accs]))
        sacc = float(np.mean([a["sacc"] for a in accs]))
        if pacc > best["pacc"]:
            best["pacc"] = pacc
            save_params(args.output_base + ".pacc.best", st.params)
        if sacc > best["sacc"]:
            best["sacc"] = sacc
            save_params(args.output_base + ".sacc.best", st.params)
        sys.stdout.write(f"\tPACC={pacc:.4f} SACC={sacc:.4f}\n")

    train(state=state, train_step=step, val_step=vstep,
          trainset=trainset, devset=devset, collate=collate,
          batch_size=args.batch_size, output_base=args.output_base,
          selection_metric="loss", max_epochs=args.max_epochs,
          max_steps=args.max_steps, resume=args.resume,
          on_epoch_end=on_epoch_end, epoch_generation=1,
          cache_batches=args.cache_batches)


if __name__ == "__main__":
    parser = ArgumentParser(description="ttscube_tpu phonemizer trainer")
    parser.add_argument("--output-base", dest="output_base", default="data/phonemizer")
    parser.add_argument("--train-file", dest="train_file",
                        default="data/phonemizer-train.json")
    parser.add_argument("--dev-file", dest="dev_file", default="data/phonemizer-dev.json")
    parser.add_argument("--batch-size", dest="batch_size", type=int, default=32)
    parser.add_argument("--lr", dest="lr", type=float, default=2e-4)
    parser.add_argument("--model-type", dest="model_type", choices=["aligned", "m2m"],
                        default="m2m", help="reference train_phonemizer.py uses m2m")
    parser.add_argument("--max-epochs", dest="max_epochs", type=int, default=-1)
    parser.add_argument("--max-steps", dest="max_steps", type=int, default=-1)
    parser.add_argument("--cache-batches", dest="cache_batches",
                        action="store_true", default=False,
                        help="iterate a device-resident cache of all collated batches (order reshuffles per epoch, composition frozen) — avoids the axon relay client's per-transfer host-memory leak on long runs; requires the collated set to fit the HBM budget")
    parser.add_argument("--resume", dest="resume", action="store_true")
    _train(parser.parse_args())
