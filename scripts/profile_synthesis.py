"""Per-phase serving profile of Cubegan.infer on the current backend.

Reproduces the round-3 bottleneck analysis in CLAUDE.md ("Performance status
(round 3, serving)") as an in-tree tool: where does an e2e synthesis millisecond
go at a given batch?  Phases:

  * languasito.infer — text tower + duration + length regulation + pitch + GAN
    tower conditioning (reference modules.py:916-994)
  * generator prefix k (k = 0..n_stages) — conv_pre + the first k upsample
    stages via ``generator_apply_fused(..., max_stages=k)``; per-stage cost is
    the successive difference
  * generator full + e2e, for each requested variant (plain fp32, bf16-resident
    storage, fused pallas tail)

All timings use ``utils.profiling.device_timer`` (reps inside ONE jitted
fori_loop, scalar fetch) — through the axon relay a bare ``block_until_ready``
is not a reliable barrier and each round trip has a ~28 ms floor.

Usage: ``python scripts/profile_synthesis.py --batch 128 [--frames 512] [--reps 10]``
"""

import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ttscube_tpu.models.cubegan import Cubegan, CubeganConfig
    from ttscube_tpu.models.hifigan import HifiganConfig
    from ttscube_tpu.models.hifigan_fused import generator_apply_fused
    from ttscube_tpu.models.languasito import Languasito2, LanguasitoConfig
    from ttscube_tpu.utils.profiling import device_timer

    B, N, F = args.batch, 64, args.frames
    cfg = CubeganConfig(
        languasito=LanguasitoConfig(num_phones=64, num_speakers=8, max_pitch=400,
                                    max_duration=100),
        hifigan=HifiganConfig())
    model = Cubegan(cfg, train=False)

    rng = np.random.default_rng(0)
    x_char = jnp.asarray(rng.integers(1, 64, (B, N)).astype(np.int32))
    x_speaker = jnp.asarray(rng.integers(1, 8, (B, 1)).astype(np.int32))

    def init(rng_key):
        variables = model.languasito.init(rng_key, {
            "x_char": x_char, "x_speaker": x_speaker,
            "y_frame2phone": jnp.zeros((B, F), jnp.int32),
            "y_pitch": jnp.zeros((B, F), jnp.float32),
        })
        gen = model.generator.init(jax.random.fold_in(rng_key, 1),
                                   jnp.zeros((1, 8, 80)))
        return {"lang": variables["params"], "gen": gen["params"]}

    params = jax.jit(init)(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    ms = lambda fn, *a: device_timer(fn, *a, reps=args.reps) * 1e3

    # -- conditioning stack -------------------------------------------------------
    def lang_infer(p, xc, xs):
        return model.languasito.apply({"params": p["lang"]},
                                      {"x_char": xc, "x_speaker": xs}, F,
                                      method=Languasito2.infer)

    t_lang = ms(lang_infer, params, x_char, x_speaker)
    print(f"languasito.infer (B={B}, F={F}): {t_lang:.1f} ms", flush=True)
    cond, _ = jax.jit(lang_infer)(params, x_char, x_speaker)
    cond = jax.block_until_ready(cond)

    variants = [("plain fp32", dict(fuse_channels=(), storage_dtype=None)),
                ("plain bf16-storage", dict(fuse_channels=(),
                                            storage_dtype=jnp.bfloat16)),
                ("fused tail + bf16", dict(fuse_channels=(32,),
                                           storage_dtype=jnp.bfloat16,
                                           fuse_max_batch=10**9))]
    if args.polyphase:
        # polyphase-decomposed dilated MRF convs (zero FLOP inflation) at the
        # given stage widths — the VERDICT-r3-item-5 experiment
        pc = tuple(int(c) for c in args.polyphase.split(","))
        variants += [
            (f"polyphase {pc} fp32", dict(fuse_channels=(), storage_dtype=None,
                                          polyphase_channels=pc)),
            (f"polyphase {pc} bf16-storage", dict(fuse_channels=(),
                                                  storage_dtype=jnp.bfloat16,
                                                  polyphase_channels=pc))]
    if args.only:
        pats = [p.strip() for p in args.only.split(",")]
        variants = [(n, kw) for n, kw in variants if any(p in n for p in pats)]
    n_stages = len(cfg.hifigan.upsample_rates)
    for name, kw in variants:
        gen = lambda p, c: generator_apply_fused(p["gen"], c, cfg.hifigan, **kw)
        t_gen = ms(gen, params, cond)
        line = f"generator [{name}]: {t_gen:.1f} ms"
        if args.per_stage and "fused" not in name:
            prev = 0.0
            stage_ms = []
            for k in range(n_stages + 1):
                pre = lambda p, c, _k=k: generator_apply_fused(
                    p["gen"], c, cfg.hifigan, max_stages=_k, **kw)
                t = ms(pre, params, cond)
                stage_ms.append(t - prev)
                prev = t
            widths = [cfg.hifigan.upsample_initial_channel // 2 ** (i + 1)
                      for i in range(n_stages)]
            detail = ", ".join(
                ["conv_pre %.1f" % stage_ms[0]]
                + [f"stage{i}/C={w} {d:.1f}"
                   for i, (w, d) in enumerate(zip(widths, stage_ms[1:]))])
            line += f"  ({detail})"
        print(line, flush=True)

    # -- e2e ----------------------------------------------------------------------
    if not args.e2e:
        return
    for name, hcfg in [
            ("plain fp32", HifiganConfig(fused_tail=False)),
            ("serving default", HifiganConfig(fused_tail=True,
                                              storage_dtype="bfloat16"))]:
        m = Cubegan(CubeganConfig(languasito=cfg.languasito, hifigan=hcfg),
                    train=False)

        def e2e(p, xc, xs):
            audio, _ = m.infer(p, {"x_char": xc, "x_speaker": xs}, max_frames=F)
            return jnp.abs(audio.astype(jnp.float32)).mean()

        t = ms(e2e, params, x_char, x_speaker)
        xrt = (B * F * cfg.hop_size / cfg.sample_rate) / (t / 1e3)
        print(f"e2e Cubegan.infer [{name}]: {t:.1f} ms ({xrt:.0f}x real-time)",
              flush=True)


if __name__ == "__main__":
    ap = ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--frames", type=int, default=512)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--no-per-stage", dest="per_stage", action="store_false")
    ap.add_argument("--polyphase", default=None,
                    help="comma-separated stage widths to ALSO measure with "
                         "polyphase-decomposed dilated convs (e.g. '32,64')")
    ap.add_argument("--only", default=None,
                    help="comma-separated substrings — measure only generator "
                         "variants whose name matches (keeps the relay compile "
                         "count down when another job shares the TPU)")
    ap.add_argument("--no-e2e", dest="e2e", action="store_false",
                    help="skip the e2e Cubegan.infer section")
    main(ap.parse_args())
