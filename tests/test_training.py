"""Training-harness integration tests: loop + checkpoints + resume on a synthetic corpus
(SURVEY §4 layer 3 — the quick_test.py overfit idea, done properly)."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full tier; fast tier = -m 'not slow'

import jax
import jax.numpy as jnp

from tests.test_data import make_corpus
from ttscube_tpu.data.collate import CubeganCollate, PhonemizerCollate
from ttscube_tpu.data.datasets import CubeganDataset
from ttscube_tpu.data.encodings import CubeganEncodings, PhonemizerEncodings
from ttscube_tpu.models.cubegan import Cubegan, create_train_state, train_step, val_step
from ttscube_tpu.models.phonemizer import Phonemizer, PhonemizerConfig
from ttscube_tpu.train.loop import train
from ttscube_tpu.train.states import (
    create_phonemizer_state,
    phonemizer_train_step,
    phonemizer_val_step,
)
from ttscube_tpu.utils.checkpoint import load_params, load_train_state
from tests.test_cubegan import tiny_model


def test_cubegan_loop_checkpoints_and_resume(tmp_path):
    make_corpus(tmp_path / "corpus", n=4)
    ds = CubeganDataset(str(tmp_path / "corpus"))
    enc = CubeganEncodings()
    enc.compute(ds)
    model = tiny_model()
    collate = CubeganCollate(enc, min_frames=60, bucket_frames=60, bucket_phones=16)

    example = {k: jnp.asarray(v) for k, v in collate([ds[0], ds[1]]).items()}
    state = create_train_state(model, jax.random.PRNGKey(0), example)
    step = jax.jit(lambda s, b, r: train_step(model, s, b, r))
    vstep = jax.jit(lambda s, b, r: val_step(model, s, b, r))

    base = str(tmp_path / "model" / "cubegan")
    final = train(state=state, train_step=step, val_step=vstep,
                  trainset=ds, devset=ds, collate=collate, batch_size=2,
                  output_base=base, selection_metric="loss_mel",
                  max_epochs=2, log_every=1)
    assert os.path.exists(base + ".best")
    assert os.path.exists(base + ".last")
    assert os.path.exists(base + ".opt.last")
    assert int(jax.device_get(final.step)) == 4  # 2 epochs x 2 batches

    # checkpoint round trip
    params = load_params(base + ".last", jax.device_get(final.params))
    a = jax.tree.leaves(params)[0]
    b = jax.tree.leaves(jax.device_get(final.params))[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # resume restores full state including the global step
    resumed = train(state=state, train_step=step, val_step=vstep,
                    trainset=ds, devset=ds, collate=collate, batch_size=2,
                    output_base=base, selection_metric="loss_mel",
                    max_epochs=0, resume=True)
    assert int(jax.device_get(resumed.step)) == 4


def test_phonemizer_overfits_two_examples():
    """Aligned phonemizer must overfit a 2-example dataset quickly (loss → ~0)."""
    examples = [
        {"orig_text": "abcd ef", "phones": ["A", "B", "C", "D", "_", "E", "F"],
         "phon2word": [0, 0, 0, 0, 1, 2, 2], "words": ["abcd", " ", "ef"]},
        {"orig_text": "fedb ca", "phones": ["F", "E", "D", "B", "_", "C", "A"],
         "phon2word": [0, 0, 0, 0, 1, 2, 2], "words": ["fedb", " ", "ca"]},
    ]
    enc = PhonemizerEncodings()
    enc.compute(examples)
    model = Phonemizer(PhonemizerConfig(num_graphemes=len(enc.graphemes),
                                        num_phonemes=len(enc.phonemes),
                                        conv_size=64, rnn_size=32))
    collate = PhonemizerCollate(enc, bucket=8)
    batch = {k: jnp.asarray(v) for k, v in collate(examples).items()}
    state = create_phonemizer_state(model, jax.random.PRNGKey(0), batch, lr=1e-2)
    step = jax.jit(lambda s, b: phonemizer_train_step(model, s, b, lr=1e-2))

    first = None
    for i in range(60):
        state, m = step(state, batch)
        if first is None:
            first = float(m["loss"])
    last = float(m["loss"])
    assert last < first * 0.2, (first, last)

    metrics = jax.device_get(phonemizer_val_step(model, state, batch))
    assert float(metrics["pacc"]) > 0.9

def test_synthesize_dataset_free_and_forced_trim(tmp_path):
    """cubegan_synthesize_dataset must trim the bucket-padded program output back to
    real audio in BOTH modes: free -> predicted frames x hop, forced -> the example's
    n_frames x hop. Untrimmed forced padding inflated the r4 quality-drive
    teacher-forced MCD diagnostics by several dB."""
    from ttscube_tpu.train.runtime import cubegan_synthesize_dataset
    from ttscube_tpu.utils.wavio import read_wav

    make_corpus(tmp_path / "corpus", n=2)
    ds = CubeganDataset(str(tmp_path / "corpus"))
    enc = CubeganEncodings()
    enc.compute(ds)
    model = tiny_model()
    # bucket_frames far above the real frame counts so padding is observable
    collate = CubeganCollate(enc, min_frames=96, bucket_frames=96, bucket_phones=16)

    example = {k: jnp.asarray(v) for k, v in collate([ds[0], ds[1]]).items()}
    state = create_train_state(model, jax.random.PRNGKey(0), example)
    params = {k: v for k, v in jax.device_get(state.params).items()
              if k in ("lang", "gen")}
    hop = model.config.hop_size

    out_forced = tmp_path / "forced"
    cubegan_synthesize_dataset(model, params, ds, collate, str(out_forced),
                               free=False, max_frames=96)
    for i in range(2):
        wav, sr = read_wav(str(out_forced / f"{ds[i]['meta']['id']}.wav"))
        n_frames = int(collate([ds[i]])["n_frames"][0])
        assert n_frames * hop < 96 * hop, "fixture must actually pad"
        assert len(wav) == n_frames * hop, (len(wav), n_frames * hop)

    out_free = tmp_path / "free"
    cubegan_synthesize_dataset(model, params, ds, collate, str(out_free),
                               free=True, max_frames=96)
    for i in range(2):
        wav, sr = read_wav(str(out_free / f"{ds[i]['meta']['id']}.wav"))
        assert len(wav) % hop == 0
        assert 0 < len(wav) <= 96 * hop


def test_bestkeeper_deferred_best_saves(tmp_path):
    """defer_best=True keeps improving params as a device-side reference (zero relay
    fetches) and persists `.best` on the next cadence save — the r4 quality drive
    measured per-improvement 392 MB fetches dominating short epochs (~46 s vs ~11 s).
    Reference save contract: PrintAndSaveCallback, train_cubegan.py:31-77."""
    from collections import namedtuple

    from ttscube_tpu.utils.checkpoint import BestKeeper, load_params

    State = namedtuple("State", ["params", "step"])

    def mk(v):
        return State(params={"w": jnp.full((4,), float(v))}, step=jnp.asarray(0))

    base = str(tmp_path / "m" / "cubegan")
    keeper = BestKeeper(base, "loss")

    # improving epoch, deferred: nothing hits disk
    assert keeper.update(1.0, mk(1), save_opt=False, save_last=False, defer_best=True)
    assert not os.path.exists(base + ".best") and not os.path.exists(base + ".last")
    # non-improving epoch: still nothing
    assert not keeper.update(2.0, mk(2), save_opt=False, save_last=False,
                             defer_best=True)
    assert not os.path.exists(base + ".best")
    # cadence epoch: pending best (epoch-1 params) flushed, .last is current params
    assert not keeper.update(3.0, mk(3), save_opt=True, save_last=True,
                             defer_best=True)
    tpl = {"w": np.zeros((4,), np.float32)}
    np.testing.assert_array_equal(load_params(base + ".best", tpl)["w"],
                                  np.full((4,), 1.0, np.float32))
    np.testing.assert_array_equal(load_params(base + ".last", tpl)["w"],
                                  np.full((4,), 3.0, np.float32))
    assert os.path.exists(base + ".opt.last")

    # improvement landing ON a cadence epoch reuses the single fetch: .best == .last
    keeper2 = BestKeeper(str(tmp_path / "m" / "k2"), "loss")
    assert keeper2.update(0.5, mk(5), save_opt=True, save_last=True, defer_best=True)
    np.testing.assert_array_equal(
        load_params(str(tmp_path / "m" / "k2") + ".best", tpl)["w"],
        np.full((4,), 5.0, np.float32))
    np.testing.assert_array_equal(
        load_params(str(tmp_path / "m" / "k2") + ".last", tpl)["w"],
        np.full((4,), 5.0, np.float32))

    # defer_best=False keeps the legacy immediate-save behavior
    keeper3 = BestKeeper(str(tmp_path / "m" / "k3"), "loss")
    assert keeper3.update(0.1, mk(7), save_opt=False, save_last=False)
    np.testing.assert_array_equal(
        load_params(str(tmp_path / "m" / "k3") + ".best", tpl)["w"],
        np.full((4,), 7.0, np.float32))

    # a newer improvement on a persisting epoch must beat an older pending best
    # (the pending ref is stale the moment a better epoch lands)
    keeper4 = BestKeeper(str(tmp_path / "m" / "k4"), "loss")
    assert keeper4.update(1.0, mk(1), save_opt=False, save_last=False,
                          defer_best=True)
    assert keeper4.update(0.5, mk(9), save_opt=True, save_last=True)
    np.testing.assert_array_equal(
        load_params(str(tmp_path / "m" / "k4") + ".best", tpl)["w"],
        np.full((4,), 9.0, np.float32))


def test_resume_falls_back_on_truncated_opt_checkpoint(tmp_path):
    """A kill mid-.opt.last-write (deadline-stopped drive) leaves a 0-byte file;
    resume must fall back to weights-only from `.last`, not crash or silently
    restart from scratch."""
    import pytest

    from ttscube_tpu.utils.checkpoint import (BestKeeper, load_params,
                                              load_train_state, save_params)

    base = str(tmp_path / "m" / "cubegan")
    BestKeeper(base, "loss")  # mkdir
    params = {"w": jnp.full((4,), 3.0)}
    save_params(base + ".last", params)
    open(base + ".opt.last", "wb").close()  # truncated save

    with pytest.raises(ValueError, match="empty"):
        load_train_state(base + ".opt.last", {"params": params})

    # the trainer's fallback path: load_params on .last still works
    got = load_params(base + ".last", {"w": np.zeros((4,), np.float32)})
    np.testing.assert_array_equal(got["w"], np.full((4,), 3.0, np.float32))


def test_cubegan_loop_cached_batches(tmp_path):
    """cache_batches=True (the train_cubegan default): device-resident batch cache,
    per-epoch order permutation — same step count, finite losses, checkpoints written.
    Exists because the axon relay client leaks host memory per host->device transfer
    (r5: ~22 MB/step OOM-killed a 30k-step drive at step ~5.8k)."""
    make_corpus(tmp_path / "corpus", n=4)
    ds = CubeganDataset(str(tmp_path / "corpus"))
    enc = CubeganEncodings()
    enc.compute(ds)
    model = tiny_model()
    collate = CubeganCollate(enc, min_frames=60, bucket_frames=60, bucket_phones=16)
    example = {k: jnp.asarray(v) for k, v in collate([ds[0], ds[1]]).items()}
    state = create_train_state(model, jax.random.PRNGKey(0), example)
    step = jax.jit(lambda s, b, r: train_step(model, s, b, r))
    vstep = jax.jit(lambda s, b, r: val_step(model, s, b, r))
    base = str(tmp_path / "model" / "cubegan")
    final = train(state=state, train_step=step, val_step=vstep,
                  trainset=ds, devset=ds, collate=collate, batch_size=2,
                  output_base=base, selection_metric="loss_mel",
                  max_epochs=2, log_every=1, cache_batches=True)
    assert int(jax.device_get(final.step)) == 4  # 2 epochs x 2 cached batches
    assert os.path.exists(base + ".last") and os.path.exists(base + ".opt.last")


def test_cubegan_loop_cache_budget_falls_back(tmp_path, capsys):
    """A collated train set over cache_batches_budget must stream (the cache lives in
    HBM; a real-scale corpus cannot be force-cached)."""
    make_corpus(tmp_path / "corpus", n=4)
    ds = CubeganDataset(str(tmp_path / "corpus"))
    enc = CubeganEncodings()
    enc.compute(ds)
    model = tiny_model()
    collate = CubeganCollate(enc, min_frames=60, bucket_frames=60, bucket_phones=16)
    example = {k: jnp.asarray(v) for k, v in collate([ds[0], ds[1]]).items()}
    state = create_train_state(model, jax.random.PRNGKey(0), example)
    step = jax.jit(lambda s, b, r: train_step(model, s, b, r))
    vstep = jax.jit(lambda s, b, r: val_step(model, s, b, r))
    base = str(tmp_path / "model" / "cubegan")
    final = train(state=state, train_step=step, val_step=vstep,
                  trainset=ds, devset=ds, collate=collate, batch_size=2,
                  output_base=base, selection_metric="loss_mel",
                  max_epochs=1, log_every=1, cache_batches=True,
                  cache_batches_budget=1)
    assert int(jax.device_get(final.step)) == 2
    assert "streaming batches instead" in capsys.readouterr().out
