"""Per-phase GAN train-step profile on the current backend (VERDICT r3 item 4).

Where does a Cubegan training millisecond go at a given batch?  Phases (reference
training_step cubegan.py:85-189 — its hot path IS training):

  * train_step       — the full jitted GAN step (D-then-G, 2 optimizer updates)
  * forward          — gan_forward (languasito fwd + crop + generator fwd @ 50 frames)
  * forward+pullback — jax.vjp(gan_forward) + pullback with unit cotangents; minus
                       `forward` ≈ the generator/conditioning backward
  * languasito_fwd   — conditioning net alone (full uncropped frame axis)
  * generator_fwd    — HiFi-GAN generator alone at the crop shape
  * d_value_grad     — discriminator loss fwd+bwd (MPD+MSD on (y, ŷ_detached))
  * mpd_fwd / msd_fwd — discriminator forwards split (round-2: MSD's grouped k=41
                       convs were 5.8 ms ≫ MPD 0.9 at B=4)
  * gt_value_grad    — G/T losses fwd + grad wrt *outputs* (mel L1, FM, adv, dur/pitch)
  * mel_pair         — the two GAN mel spectrograms alone
  * optimizer        — both optax multi_transform updates + apply_updates, given grads

All phases trace under the training unroll (default 1, override with --unroll to
measure VERDICT item 9) and time with ``utils.profiling.device_timer`` (reps inside
ONE jitted fori_loop, scalar fetch — relay-safe). Compile wall time per phase is
reported too: on the axon relay compile cost is a first-class design constraint.

Usage:
    python scripts/profile_train.py --batch 16 [--frames 500] [--reps 10]
        [--fused-tail-train] [--unroll 1] [--json /tmp/profile.json]
"""

import json
import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(args):
    import jax

    if args.cpu:
        # the JAX_PLATFORMS env var alone LOSES to the axon plugin (see
        # .claude/skills/verify/SKILL.md) — a "CPU" smoke run without this config
        # update lands on the shared TPU relay and can abort a training drive's
        # in-flight compile (happened in round 5)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from ttscube_tpu.models.cubegan import (
        TRAIN_FRAMES, Cubegan, CubeganConfig, create_train_state, make_optimizer,
        train_step)
    from ttscube_tpu.models.hifigan import HifiganConfig
    from ttscube_tpu.models.languasito import LanguasitoConfig
    from ttscube_tpu.ops.length_regulator import durations_to_frame2phone_np
    from ttscube_tpu.ops.rnn import unroll_override
    from ttscube_tpu.utils.profiling import device_timer

    B, F, N = args.batch, args.frames, 100
    on_tpu = jax.default_backend() == "tpu"
    cfg = CubeganConfig(
        languasito=LanguasitoConfig(num_phones=64, num_speakers=8, max_pitch=400,
                                    max_duration=100),
        hifigan=HifiganConfig(
            fused_tail_train=args.fused_tail_train and on_tpu,
            fused_train_max_batch=max(args.fused_max_batch, B),
            compute_dtype=args.compute_dtype),
        disc_compute_dtype=args.compute_dtype)
    model = Cubegan(cfg, train=True)

    rng = np.random.default_rng(0)
    durs = rng.integers(3, 8, (B, N)).astype(np.int32)
    n_valid = np.full((B,), N, np.int32)
    f2p, fmask = durations_to_frame2phone_np(durs, n_valid, F)
    batch = {
        "x_char": jnp.asarray(rng.integers(1, 64, (B, N)).astype(np.int32)),
        "x_speaker": jnp.asarray(rng.integers(1, 8, (B, 1)).astype(np.int32)),
        "y_frame2phone": jnp.asarray(f2p),
        "y_frame_mask": jnp.asarray(fmask),
        "y_pitch": jnp.asarray((rng.uniform(80, 300, (B, F)) * np.asarray(fmask))
                               .astype(np.float32)),
        "y_dur": jnp.asarray(durs),
        "y_audio": jnp.asarray((0.1 * rng.standard_normal((B, F * 240)))
                               .astype(np.float32)),
        "n_frames": jnp.asarray(np.asarray(fmask).sum(axis=1).astype(np.int32)),
    }
    state = create_train_state(model, jax.random.PRNGKey(0), batch)
    key = jax.random.PRNGKey(1)
    txs = make_optimizer(model.config)
    UN = args.unroll

    # ---- phase functions (params/state as ARGS — closures inline them as HLO
    # constants and the relay rejects the compile with HTTP 413) ----

    def f_train_step(state, batch, key):
        with unroll_override(UN):
            new_state, metrics = train_step(model, state, batch, key)
        # Depend on EVERY updated param leaf: a single-leaf dependence lets XLA
        # dead-code-eliminate the weight grads + optimizer updates of every other
        # leaf — measured 2.40 vs 5.74 GF on the tiny test model (58% of the step
        # DCE'd), which is exactly the r4 "145.6 ms profiler vs 212.2 ms bench"
        # discrepancy (bench's device_timer reduces the full output tree).
        return metrics["loss_g"] + sum(jnp.mean(l.astype(jnp.float32))
                                       for l in jax.tree.leaves(new_state.params))

    def f_forward(params, batch, key):
        with unroll_override(UN):
            pg = {k: v for k, v in params.items() if k not in ("mpd", "msd")}
            outs, y_w = model.gan_forward(pg, batch, key, TRAIN_FRAMES)
        # reduce every output so no head of the forward is dead code
        return y_w.mean() + sum(jnp.mean(o.astype(jnp.float32))
                                for o in jax.tree.leaves(outs))

    def f_forward_pullback(params, batch, key):
        with unroll_override(UN):
            pg = {k: v for k, v in params.items() if k not in ("mpd", "msd")}
            outs, pull, y_w = jax.vjp(
                lambda p: model.gan_forward(p, batch, key, TRAIN_FRAMES),
                pg, has_aux=True)
            cots = jax.tree.map(jnp.ones_like, outs)
            (grads,) = pull(cots)
        return sum(jnp.mean(l) for l in jax.tree.leaves(grads))

    def f_languasito(params, batch):
        with unroll_override(UN):
            dur_logits, pitch, vuv, cond = model.languasito.apply(
                {"params": params["lang"]}, batch)
        return cond.mean() + dur_logits.mean()

    cond_w = jnp.asarray(rng.standard_normal((B, TRAIN_FRAMES, 80)).astype(np.float32))
    y_w = jnp.asarray((0.1 * rng.standard_normal((B, TRAIN_FRAMES * 240)))
                      .astype(np.float32))
    y_hat = jnp.asarray((0.1 * rng.standard_normal((B, TRAIN_FRAMES * 240)))
                        .astype(np.float32))

    def f_generator(params, cond_w):
        return model.generator.apply({"params": params["gen"]}, cond_w).mean()

    def f_d_value_grad(params, spectral, y_w, y_hat):
        pd = {"mpd": params["mpd"], "msd": params["msd"]}
        (loss, _), grads = jax.value_and_grad(
            lambda p: model.d_loss(p, spectral, y_w, y_hat, update_spectral=True),
            has_aux=True)(pd)
        return loss + sum(jnp.mean(l) for l in jax.tree.leaves(grads))

    def f_mpd(params, y_w, y_hat):
        rs, gs, _, _ = model.mpd.apply({"params": params["mpd"]}, y_w, y_hat)
        return sum(jnp.mean(r) for r in rs) + sum(jnp.mean(g) for g in gs)

    def f_msd(params, spectral, y_w, y_hat):
        rs, gs, _, _ = model.msd.apply(
            {"params": params["msd"], "spectral": spectral}, y_w, y_hat)
        return sum(jnp.mean(r) for r in rs) + sum(jnp.mean(g) for g in gs)

    def f_gt_value_grad(params, spectral, batch, outs_proxy, y_w):
        pd = {"mpd": params["mpd"], "msd": params["msd"]}

        def out_loss(outs):
            loss, _ = model.gt_losses(pd, spectral, batch, outs, y_w)
            return loss

        loss, grads = jax.value_and_grad(out_loss)(outs_proxy)
        return loss + sum(jnp.mean(l) for l in jax.tree.leaves(grads))

    def f_mel_pair(y_w, y_hat):
        return jnp.abs(model.mel(y_w) - model.mel(y_hat)).mean()

    # fabricated grads tree shaped like params for the optimizer phase
    def f_optimizer(state, key):
        grads = jax.tree.map(
            lambda p: (p * 0 + jax.random.uniform(key, ())).astype(p.dtype),
            state.params)
        import optax
        d_up, new_d = txs["d"].update(grads, state.opt_state["d"], state.params)
        p1 = optax.apply_updates(state.params, d_up)
        g_up, new_g = txs["gtb"].update(grads, state.opt_state["gtb"], p1)
        p2 = optax.apply_updates(p1, g_up)
        # reduce every updated param AND both new moment trees — a partial
        # dependence lets XLA skip the unused leaves' update math entirely
        return sum(jnp.mean(l.astype(jnp.float32))
                   for l in jax.tree.leaves((p2, new_d, new_g)))

    # dur/pitch/vuv proxies for gt phase (shapes as gan_forward returns them)
    with unroll_override(UN):
        pg0 = {k: v for k, v in state.params.items() if k not in ("mpd", "msd")}
        outs0, y_w0 = jax.jit(
            lambda p, b, k: model.gan_forward(p, b, k, TRAIN_FRAMES))(pg0, batch, key)

    phases = [
        ("train_step", f_train_step, (state, batch, key)),
        ("forward", f_forward, (state.params, batch, key)),
        ("forward+pullback", f_forward_pullback, (state.params, batch, key)),
        ("languasito_fwd", f_languasito, (state.params, batch)),
        ("generator_fwd", f_generator, (state.params, cond_w)),
        ("d_value_grad", f_d_value_grad, (state.params, state.spectral, y_w0, outs0[3])),
        ("mpd_fwd", f_mpd, (state.params, y_w, y_hat)),
        ("msd_fwd", f_msd, (state.params, state.spectral, y_w, y_hat)),
        ("gt_value_grad", f_gt_value_grad,
         (state.params, state.spectral, batch, outs0, y_w0)),
        ("mel_pair", f_mel_pair, (y_w, y_hat)),
        ("optimizer", f_optimizer, (state, key)),
    ]

    results = {}
    total = None
    print(f"# backend={jax.default_backend()} B={B} F={F} crop={TRAIN_FRAMES} "
          f"unroll={UN} fused_tail_train={cfg.hifigan.fused_tail_train} "
          f"compute_dtype={args.compute_dtype} reps={args.reps}")
    for name, fn, fargs in phases:
        if args.only and name not in args.only:
            continue
        sec, compile_s = device_timer(fn, *fargs, reps=args.reps,
                                      return_compile_time=True)
        results[name] = {"ms": round(sec * 1e3, 3), "compile_s": round(compile_s, 1)}
        pct = f" {100*sec*1e3/total:5.1f}%" if (total and name != "train_step") else ""
        print(f"{name:<18} {sec*1e3:9.3f} ms{pct}   (compile {compile_s:.1f}s)")
        if name == "train_step":
            total = sec * 1e3
        sys.stdout.flush()
    if "forward" in results and "forward+pullback" in results:
        bwd = results["forward+pullback"]["ms"] - results["forward"]["ms"]
        results["backward(derived)"] = {"ms": round(bwd, 3)}
        print(f"{'backward(derived)':<18} {bwd:9.3f} ms")
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"batch": B, "frames": F, "unroll": UN,
                       "fused_tail_train": cfg.hifigan.fused_tail_train,
                       "compute_dtype": args.compute_dtype,
                       "backend": jax.default_backend(), "phases": results}, f,
                      indent=2)
        print(f"-> {args.json}")


if __name__ == "__main__":
    ap = ArgumentParser(description="per-phase Cubegan train-step profile")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=500)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--unroll", type=int, default=1,
                    help="scan unroll for the traced phases (training default 1)")
    ap.add_argument("--fused-tail-train", action="store_true")
    ap.add_argument("--fused-max-batch", type=int, default=0,
                    help="raise hifigan.fused_train_max_batch for the measurement "
                         "(the profiler always lifts it to --batch)")
    ap.add_argument("--compute-dtype", default="float32",
                    help="hifigan compute dtype (bfloat16 runs generator convs on the "
                         "MXU at bf16 with fp32 accumulation)")
    ap.add_argument("--only", nargs="*", default=None,
                    help="subset of phase names to run")
    ap.add_argument("--json", default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (config update, not just env — "
                         "never touches the TPU relay)")
    main(ap.parse_args())
