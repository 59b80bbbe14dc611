"""Cubegan trainer CLI (reference ``scripts/train_cubegan.py``).

Same flags/artifacts: dumps `{base}.yaml` + `{base}.encodings`, saves
`{base}.{best,last,opt.last}` per epoch, synthesizes the devset every N epochs, resumes
full state with `--resume`. TPU-native: one jitted GAN step, optional device mesh via
`--mesh-data/--mesh-model`.
"""

import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _train(args):
    import jax

    from ttscube_tpu.data.collate import CubeganCollate
    from ttscube_tpu.data.datasets import CubeganDataset
    from ttscube_tpu.data.encodings import CubeganEncodings
    from ttscube_tpu.models.cubegan import (
        Cubegan, CubeganConfig, create_train_state, train_step, val_step)
    from ttscube_tpu.models.languasito import LanguasitoConfig
    from ttscube_tpu.train.loop import train
    from ttscube_tpu.train.runtime import cubegan_synthesize_dataset
    from ttscube_tpu.utils.checkpoint import save_config

    cond_type = args.lm.split(":")[0] if args.lm else None
    lm = None
    lm_config = None
    lm_params = None
    hf_tokenizer = None
    if cond_type == "hf":
        # in-model transformer conditioning (reference cubegan.py:56,88-89, opt_b
        # :299-302); network-free: the model must be a local directory
        from ttscube_tpu.models.lm import TransformerEncoder, load_local_lm
        from ttscube_tpu.utils.hf import HFTokenizer

        hf_dir = args.lm.split(":", 1)[1]
        if not os.path.isdir(hf_dir):
            raise SystemExit(
                f"--lm hf:<dir>: '{hf_dir}' is not a local model directory. This "
                "environment has no hub access — place a HF-format BERT checkpoint "
                "(config.json + tokenizer files [+ pytorch_model.bin]) there first.")
        try:
            hf_tokenizer = HFTokenizer(hf_dir)
        except Exception as e:
            raise SystemExit(f"--lm hf: could not load a tokenizer from '{hf_dir}': {e}")
        try:
            lm_config, lm_params = load_local_lm(hf_dir)
        except Exception as e:
            raise SystemExit(f"--lm hf: could not read '{hf_dir}/config.json': {e}")
        lm = TransformerEncoder(lm_config)
        if lm_params is None:
            sys.stdout.write(f"WARNING: no weights in {hf_dir}; "
                             "LM encoder starts from random init\n")
    elif args.lm and cond_type != "fasttext":
        raise SystemExit(f"unknown --lm spec '{args.lm}' "
                         "(expected fasttext:<table> or hf:<dir>)")

    config = {"sample_rate": args.sample_rate, "hop_size": args.hop_size,
              "conditioning": args.lm}
    if lm_config is not None:
        config["lm_config"] = lm_config.to_dict()
    save_config(args.output_base, config)
    sys.stdout.write("=================Config=================\n")
    sys.stdout.write(open(args.output_base + ".yaml").read())
    sys.stdout.write("========================================\n\n")

    trainset = CubeganDataset(args.train_folder, hf_tokenizer=hf_tokenizer,
                              hop_size=args.hop_size, sample_rate=args.sample_rate)
    devset = CubeganDataset(args.dev_folder, hf_tokenizer=hf_tokenizer,
                            hop_size=args.hop_size, sample_rate=args.sample_rate)
    sys.stdout.write(f"train={len(trainset)} dev={len(devset)} examples\n")

    enc_path = args.output_base + ".encodings"
    encodings = CubeganEncodings()
    if os.path.exists(enc_path) and args.resume:
        encodings.load(enc_path)
    else:
        encodings.compute(trainset)
        encodings.save(enc_path)

    cfg = CubeganConfig(
        languasito=LanguasitoConfig(
            num_phones=len(encodings.phon2int),
            num_speakers=len(encodings.speaker2int),
            max_pitch=encodings.max_pitch,
            max_duration=encodings.max_duration,
            cond_type=cond_type,
            lm_dim=lm_config.hidden_size if lm_config is not None else None),
        lr=args.lr,
        sample_rate=args.sample_rate,
        hop_size=args.hop_size,
    )
    if args.fused_tail_train or args.compute_dtype != "float32":
        from dataclasses import replace as _dc_replace
        from ttscube_tpu.models.hifigan import HifiganConfig
        # fused_tail_train: final-stage generator forward+backward as fused pallas
        # kernels (ops/pallas_resblock.fused_tail_stage_grad custom VJP; TPU-only;
        # auto-falls back above hifigan.fused_train_max_batch).
        # compute_dtype=bfloat16: generator + discriminator convs on the MXU at bf16
        # with fp32 accumulation (params/grads/optimizer stay fp32).
        cfg = _dc_replace(
            cfg,
            hifigan=HifiganConfig(fused_tail_train=args.fused_tail_train,
                                  compute_dtype=args.compute_dtype),
            disc_compute_dtype=args.compute_dtype)
    model = Cubegan(cfg, lm=lm)
    from ttscube_tpu.utils.wordvec import make_word_embedder
    # HF conditioning adds two more varying batch axes (tokens, words); at exact
    # widths every new (chars, mel, tokens, words) combo retraces + recompiles the
    # full GAN step (minutes each on the TPU relay — measured ~7 s/step amortized
    # over a 6-speaker corpus vs ~0.2 s/step steady). Pin the token axis to the
    # reference's fixed 512-token window (io_cubegan.py:246-277) and bucket the
    # word axis so the executable count stays O(mel buckets).
    hf_cond = cond_type == "hf"
    collate = CubeganCollate(encodings, word_embedder=make_word_embedder(args.lm),
                             hop=args.hop_size, hf_conditioning=hf_cond,
                             bucket_tokens=512 if hf_cond else 64,
                             bucket_words=8 if hf_cond else 1)

    example = collate([trainset[0]])
    import jax.numpy as jnp
    example = {k: jnp.asarray(v) for k, v in example.items()}
    state = create_train_state(model, jax.random.PRNGKey(0), example)
    if lm_params is not None:
        # graft the imported pretrained encoder over the random init (moments are
        # zeros at init, so only the params need replacing)
        state = state.replace(params=dict(state.params, hf=jax.device_put(lm_params)))

    if args.mesh_data * args.mesh_model > 1:
        from ttscube_tpu.parallel.mesh import make_mesh, make_parallel_train_step
        mesh = make_mesh(data=args.mesh_data, model=args.mesh_model)
        step = make_parallel_train_step(model, mesh, train_step)
    else:
        step = jax.jit(lambda s, b, r: train_step(model, s, b, r))
    vstep = jax.jit(lambda s, b, r: val_step(model, s, b, r))

    def on_epoch_end(epoch, st):
        out = "generated_files/free/"
        os.makedirs(out, exist_ok=True)
        infer_params = {"lang": st.params["lang"], "gen": st.params["gen"]}
        cubegan_synthesize_dataset(model, infer_params, devset, collate, out,
                                   limit=args.generation_limit)

    train(state=state, train_step=step, val_step=vstep,
          trainset=trainset, devset=devset, collate=collate,
          batch_size=args.batch_size, output_base=args.output_base,
          selection_metric="loss_mel", max_epochs=args.max_epochs,
          max_steps=args.max_steps, resume=args.resume,
          on_epoch_end=on_epoch_end if args.epoch_generation > 0 else None,
          epoch_generation=max(args.epoch_generation, 1),
          opt_save_every=args.opt_save_every,
          defer_best_saves=args.defer_best_saves,
          cache_batches=args.cache_batches)


if __name__ == "__main__":
    parser = ArgumentParser(description="ttscube_tpu Cubegan trainer")
    parser.add_argument("--output-base", dest="output_base", default="data/cubegan")
    parser.add_argument("--batch-size", dest="batch_size", type=int, default=16)
    parser.add_argument("--train-folder", dest="train_folder",
                        default="data/processed/train")
    parser.add_argument("--dev-folder", dest="dev_folder", default="data/processed/dev")
    parser.add_argument("--sample-rate", dest="sample_rate", type=int, default=24000)
    parser.add_argument("--hop-size", dest="hop_size", type=int, default=240)
    parser.add_argument("--lr", dest="lr", type=float, default=2e-4)
    parser.add_argument("--epoch-generation", dest="epoch_generation", type=int,
                        default=10, help="synthesize devset every N epochs (0=never)")
    parser.add_argument("--generation-limit", dest="generation_limit", type=int,
                        default=-1)
    parser.add_argument("--lm", dest="lm", default=None,
                        help="conditioning: fasttext:<LANG> or hf:<model>")
    parser.add_argument("--max-epochs", dest="max_epochs", type=int, default=-1)
    parser.add_argument("--max-steps", dest="max_steps", type=int, default=-1)
    parser.add_argument("--mesh-data", dest="mesh_data", type=int, default=1)
    parser.add_argument("--mesh-model", dest="mesh_model", type=int, default=1)
    parser.add_argument("--opt-save-every", dest="opt_save_every", type=int, default=1,
                        help="epochs between full-state .opt.last saves (default 1)")
    parser.add_argument("--fused-tail-train", dest="fused_tail_train",
                        action="store_true",
                        help="fused pallas forward+backward for the generator's final "
                             "stage (TPU; ~10%% faster GAN step at the default crop; "
                             "auto-falls back above hifigan.fused_train_max_batch)")
    parser.add_argument("--compute-dtype", dest="compute_dtype", default="float32",
                        choices=["float32", "bfloat16"],
                        help="generator+discriminator conv compute dtype (bfloat16 = "
                             "MXU bf16 with fp32 accumulation; params/grads stay fp32)")
    parser.add_argument("--no-defer-best-saves", dest="defer_best_saves",
                        action="store_false", default=True,
                        help="persist .best immediately on every improving epoch "
                        "(default: keep improving params device-side and persist on "
                        "the --opt-save-every cadence — the per-improvement 392 MB "
                        "relay fetch otherwise dominates short epochs, measured "
                        "~46 s/epoch vs ~11 s in the r4 quality drive)")
    parser.add_argument("--no-cache-batches", dest="cache_batches",
                        action="store_false", default=True,
                        help="re-collate + re-transfer every batch each step instead "
                        "of iterating a device-resident batch cache (the default "
                        "cache freezes batch composition but keeps per-epoch order "
                        "shuffling and per-step crop/noise randomness; it exists "
                        "because the axon relay client leaks host memory on every "
                        "host->device transfer — ~22 MB/step OOM-killed a 128 GB box "
                        "at step ~5.8k of a 30k-step drive)")
    parser.add_argument("--resume", dest="resume", action="store_true")
    _train(parser.parse_args())
