"""Dual-WaveRNN vocoder trainer CLI (reference ``scripts/train_vocoder.py``: dual sample
rates 24000/2400, upsample 240, output head mol|gm|beta|mulaw|raw, saves `.lr.best` /
`.hr.best` separately)."""

import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _train(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ttscube_tpu.data.collate import VocoderCollate
    from ttscube_tpu.data.datasets import VocoderDataset, batch_iterator
    from ttscube_tpu.models.wavernn import CubenetVocoder, VocoderConfig
    from ttscube_tpu.train.loop import train
    from ttscube_tpu.train.states import (
        create_vocoder_state, vocoder_train_step, vocoder_val_step)
    from ttscube_tpu.utils.checkpoint import save_config, save_params

    upsample = args.hop_size  # hr samples per mel frame (240 @ 24 kHz / 10 ms)
    cfg = VocoderConfig(
        num_layers_lr=args.layers_lr, layer_size_lr=args.size_lr,
        num_layers_hr=args.layers_hr, layer_size_hr=args.size_hr,
        upsample=upsample, upsample_low=args.sample_rate // args.sample_rate_low,
        output=args.output, lr=args.lr)
    save_config(args.output_base, {
        "sample_rate": args.sample_rate, "sample_rate_low": args.sample_rate_low,
        "hop_size": args.hop_size, "output": args.output,
        "layers_lr": args.layers_lr, "size_lr": args.size_lr,
        "layers_hr": args.layers_hr, "size_hr": args.size_hr})

    voc = CubenetVocoder(cfg)
    trainset = VocoderDataset(args.train_folder, target_sample_rate=args.sample_rate,
                              lowres_sample_rate=args.sample_rate_low,
                              max_segment_size=args.max_segment, hop_size=args.hop_size)
    devset = VocoderDataset(args.dev_folder, target_sample_rate=args.sample_rate,
                            lowres_sample_rate=args.sample_rate_low,
                            max_segment_size=args.max_segment, random_start=False,
                            hop_size=args.hop_size)
    collate = VocoderCollate()

    example = {k: jnp.asarray(v) for k, v in collate(
        [trainset[0] for _ in range(min(2, len(trainset)))]).items()}
    state = create_vocoder_state(voc, jax.random.PRNGKey(0), example)
    step = jax.jit(lambda s, b, r: vocoder_train_step(voc, s, b, r))
    vstep = jax.jit(lambda s, b, r: vocoder_val_step(voc, s, b, r))

    best = {"lr": float("inf"), "hr": float("inf")}

    def on_epoch_end(epoch, st):
        losses = []
        for batch in batch_iterator(devset, args.batch_size, collate, shuffle=False):
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            losses.append(jax.device_get(vstep(st, batch, None)))
        if not losses:
            return
        for k in ("lr", "hr"):
            v = float(np.mean([l[k] for l in losses]))
            if v < best[k]:
                best[k] = v
                save_params(f"{args.output_base}.{k}.best", st.params[k])

    train(state=state, train_step=step, val_step=vstep,
          trainset=trainset, devset=devset, collate=collate,
          batch_size=args.batch_size, output_base=args.output_base,
          selection_metric="loss", max_epochs=args.max_epochs,
          max_steps=args.max_steps, resume=args.resume,
          on_epoch_end=on_epoch_end, epoch_generation=1,
          cache_batches=args.cache_batches)


if __name__ == "__main__":
    parser = ArgumentParser(description="ttscube_tpu vocoder trainer")
    parser.add_argument("--output-base", dest="output_base", default="data/vocoder")
    parser.add_argument("--train-folder", dest="train_folder", default="data/wav-train")
    parser.add_argument("--dev-folder", dest="dev_folder", default="data/wav-dev")
    parser.add_argument("--batch-size", dest="batch_size", type=int, default=16)
    parser.add_argument("--sample-rate", dest="sample_rate", type=int, default=24000)
    parser.add_argument("--sample-rate-low", dest="sample_rate_low", type=int,
                        default=2400)
    parser.add_argument("--hop-size", dest="hop_size", type=int, default=240)
    parser.add_argument("--max-segment", dest="max_segment", type=int, default=24000)
    parser.add_argument("--layers-lr", dest="layers_lr", type=int, default=2)
    parser.add_argument("--size-lr", dest="size_lr", type=int, default=512)
    parser.add_argument("--layers-hr", dest="layers_hr", type=int, default=2)
    parser.add_argument("--size-hr", dest="size_hr", type=int, default=512)
    parser.add_argument("--output", dest="output", default="mol",
                        choices=["mol", "gm", "beta", "mulaw", "raw"])
    parser.add_argument("--lr", dest="lr", type=float, default=1e-4)
    parser.add_argument("--max-epochs", dest="max_epochs", type=int, default=-1)
    parser.add_argument("--max-steps", dest="max_steps", type=int, default=-1)
    parser.add_argument("--cache-batches", dest="cache_batches",
                        action="store_true", default=False,
                        help="iterate a device-resident cache of all collated batches (order reshuffles per epoch, composition frozen) — avoids the axon relay client's per-transfer host-memory leak on long runs; requires the collated set to fit the HBM budget")
    parser.add_argument("--resume", dest="resume", action="store_true")
    _train(parser.parse_args())
