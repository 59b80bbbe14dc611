"""Benchmark harness: end-to-end synthesis throughput (xRT) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} — the headline metric
is serving xRT; the same object carries training-side fields ("train_step_ms",
"train_mfu_pct") measured on a full GAN training step with the fused-tail custom VJP
(the reference's training hot path, cubegan.py:85-189 — it publishes no numbers, so
vs_baseline stays the serving ratio; see BASELINE.md).

Train numbers here are the honest ones: device_timer reduces EVERY output leaf, so
nothing is dead-code-eliminated. The r4 "212.2 ms (bench) vs 145.6 ms
(profile_train --batch 16)" discrepancy was the profiler DCE-ing ~58% of the step's
FLOPs (unreduced param leaves); scripts/profile_train.py now reduces every leaf and
the two agree (see CLAUDE.md round-5 notes).
Baseline target (BASELINE.md): >= 200x real-time 24 kHz synthesis per v5e chip.
vs_baseline = measured_xRT / 200.

Workload: batched free synthesis through the full flagship stack — Languasito2 text
tower (durations) -> length regulation -> pitch -> GAN tower conditioning -> full-size
HiFi-GAN v1 generator -> 24 kHz waveform (reference call stack SURVEY.md §3.1).
"""

import json
import time

import numpy as np

# v5e per-chip peak (bf16 MXU). MFU is reported against this even for fp32 steps —
# it answers "how far from the chip's ceiling", not "how well-tuned is fp32".
V5E_PEAK_FLOPS = 197e12


def train_bench(fused: bool = True, B: int = 4, F: int = 500,
                compute_dtype: str = "float32"):
    """GAN train-step time + MFU at the round-2 profile shape (B=4, F=500).

    Returns (step_ms, mfu_pct or None). Uses the fused-tail custom-VJP training path
    (HifiganConfig.fused_tail_train) when `fused`; the flax path otherwise.
    `compute_dtype="bfloat16"` runs generator + discriminator convs at bf16 (fp32
    accumulation/params) — the trainer's real mixed-precision mode
    (train_cubegan.py --compute-dtype)."""
    import jax
    import jax.numpy as jnp

    from ttscube_tpu.models.cubegan import (Cubegan, CubeganConfig,
                                            create_train_state, train_step)
    from ttscube_tpu.models.hifigan import HifiganConfig
    from ttscube_tpu.models.languasito import LanguasitoConfig
    from ttscube_tpu.ops.length_regulator import durations_to_frame2phone_np
    from ttscube_tpu.utils.profiling import device_timer

    on_tpu = jax.default_backend() == "tpu"
    cfg = CubeganConfig(
        languasito=LanguasitoConfig(num_phones=64, num_speakers=8, max_pitch=400,
                                    max_duration=100),
        hifigan=HifiganConfig(fused_tail_train=fused and on_tpu,
                              compute_dtype=compute_dtype),
        disc_compute_dtype=compute_dtype)
    model = Cubegan(cfg, train=True)

    rng = np.random.default_rng(0)
    N = 100
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

    # device_timer reduces EVERY leaf of (new_state, metrics), so nothing in the
    # step is dead code. This is why bench's number is the honest one: r4's
    # profile_train returned loss_g + one param leaf, XLA DCE'd 58% of the step's
    # FLOPs (measured via cost_analysis on the tiny test model), and the profiler
    # read 145.6 ms where this harness read 212.2 ms at the same B=16 shape.
    # profile_train now reduces all param leaves too — the two agree.
    def step_fn(state, batch, rng_key):
        new_state, metrics = train_step(model, state, batch, rng_key)
        return new_state, metrics

    key = jax.random.PRNGKey(1)
    sec = device_timer(step_fn, state, batch, key, reps=10)
    step_ms = sec * 1e3

    mfu = None
    mfu_err = None
    try:
        cost = (jax.jit(step_fn).lower(state, batch, key).compile()
                .cost_analysis())
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        if flops > 0:
            mfu = 100.0 * flops / (sec * V5E_PEAK_FLOPS)
        else:
            mfu_err = "cost_analysis returned no flops"
    except Exception as e:  # surfaced as train_mfu_error in the JSON line — a silent
        # pass here would make a cost_analysis() regression look like a removed field
        mfu_err = f"{type(e).__name__}: {e}"[:200]
    return step_ms, mfu, mfu_err


def main(batch: int = 128, chunk: int = 0, fused: bool = True):
    import jax
    import jax.numpy as jnp

    from ttscube_tpu.models.cubegan import Cubegan, CubeganConfig
    from ttscube_tpu.models.languasito import LanguasitoConfig

    from ttscube_tpu.models.hifigan import HifiganConfig

    # default serving batch 128 in one generator program; --batch 256 --chunk 256
    # streams the generator in windows (generate_chunked) to stay inside HBM
    B, N, MAX_FRAMES = batch, 64, 512
    cfg = CubeganConfig(
        languasito=LanguasitoConfig(num_phones=64, num_speakers=8, max_pitch=400,
                                    max_duration=100),
        # serving defaults as api.py sets them: fused pallas tail (wins up to
        # fuse_max_batch; plain XLA above) + bf16-resident inter-conv activations
        # (the generator is HBM-bound: 214.5 -> 149.1 ms generator-only at B=128)
        hifigan=HifiganConfig(fused_tail=fused, storage_dtype="bfloat16"))
    model = Cubegan(cfg, train=False)

    rng = np.random.default_rng(0)
    batch = {
        "x_char": jnp.asarray(rng.integers(1, 64, (B, N)).astype(np.int32)),
        "x_speaker": jnp.asarray(rng.integers(1, 8, (B, 1)).astype(np.int32)),
    }

    def init(rng_key):
        variables = model.languasito.init(rng_key, {
            "x_char": batch["x_char"], "x_speaker": batch["x_speaker"],
            "y_frame2phone": jnp.zeros((B, MAX_FRAMES), jnp.int32),
            "y_pitch": jnp.zeros((B, MAX_FRAMES), jnp.float32),
        })
        gen = model.generator.init(jax.random.fold_in(rng_key, 1),
                                   jnp.zeros((1, 8, 80)))
        return {"lang": variables["params"], "gen": gen["params"]}

    params = jax.jit(init)(jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    # NOTE: through the remote-TPU relay, block_until_ready is not a reliable barrier —
    # timing must fetch a scalar reduction of the output to the host. Inputs vary per
    # call so nothing can be cached.
    @jax.jit
    def infer_sum(p, xc, xs):
        audio, _ = model.infer(p, {"x_char": xc, "x_speaker": xs},
                               max_frames=MAX_FRAMES,
                               chunk_frames=chunk if chunk > 0 else None)
        return jnp.abs(audio).mean()

    iters = 4
    char_batches = [jnp.asarray(rng.integers(1, 64, (B, N)).astype(np.int32))
                    for _ in range(iters + 1)]
    float(infer_sum(params, char_batches[0], batch["x_speaker"]))  # warm-up compile

    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        s = infer_sum(params, char_batches[i + 1], batch["x_speaker"])
        float(s)  # host fetch = true completion barrier
        times.append(time.perf_counter() - t0)
    wall = float(np.median(times))

    audio_seconds = B * MAX_FRAMES * cfg.hop_size / cfg.sample_rate
    xrt = audio_seconds / wall
    record = {
        "metric": "e2e_synthesis_xRT",
        "value": round(xrt, 1),
        "unit": "audio_sec/wall_sec/chip",
        "vs_baseline": round(xrt / 200.0, 2),
    }
    try:
        step_ms, mfu, mfu_err = train_bench(fused=fused)
        record["train_step_ms"] = round(step_ms, 2)
        if mfu is not None:
            record["train_mfu_pct"] = round(mfu, 2)
        if mfu_err is not None:
            record["train_mfu_error"] = mfu_err
    except Exception as e:  # train metrics are best-effort; never break the contract
        record["train_error"] = f"{type(e).__name__}: {e}"[:200]
    try:
        # the trainer's real workload (batch 16, reference train_cubegan.py:160);
        # fused_tail_train auto-gates itself by fused_train_max_batch
        step_ms, mfu, mfu_err = train_bench(fused=fused, B=16)
        record["train_step_ms_b16"] = round(step_ms, 2)
        if mfu is not None:
            record["train_mfu_pct_b16"] = round(mfu, 2)
        if mfu_err is not None:
            record["train_mfu_error_b16"] = mfu_err
    except Exception as e:
        record["train_error_b16"] = f"{type(e).__name__}: {e}"[:200]
    try:
        # same workload in the trainer's bf16 mixed-precision mode — the r4 B=16
        # profile showed the step is discriminator-fmap-HBM-bound, so bf16 compute
        # (which halves that traffic) is the headline training lever
        step_ms, mfu, mfu_err = train_bench(fused=fused, B=16,
                                            compute_dtype="bfloat16")
        record["train_step_ms_b16_bf16"] = round(step_ms, 2)
        if mfu is not None:
            record["train_mfu_pct_b16_bf16"] = round(mfu, 2)
        if mfu_err is not None:
            record["train_mfu_error_b16_bf16"] = mfu_err
    except Exception as e:
        record["train_error_b16_bf16"] = f"{type(e).__name__}: {e}"[:200]
    print(json.dumps(record))


if __name__ == "__main__":
    from argparse import ArgumentParser

    ap = ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=0,
                    help="generator window frames (0 = whole utterance)")
    ap.add_argument("--no-fused", action="store_true",
                    help="disable the pallas fused generator tail")
    args = ap.parse_args()
    main(batch=args.batch, chunk=args.chunk, fused=not args.no_fused)
