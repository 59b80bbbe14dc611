"""Phonemizer family tests: aligned labeler, M2M seq2seq, word-level G2P."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ttscube_tpu.models.g2p import Seq2Seq, Seq2SeqConfig, greedy_decode, seq2seq_loss
from ttscube_tpu.models.phonemizer import (
    Phonemizer,
    PhonemizerConfig,
    PhonemizerM2M,
    m2m_loss,
    phonemizer_accuracy,
    phonemizer_loss,
)

CFG = PhonemizerConfig(num_graphemes=50, num_phonemes=60)


def char_batch(B=2, S=20, key=0):
    rng = np.random.default_rng(key)
    return {
        "x_char": jnp.asarray(rng.integers(1, 50, (B, S))),
        "x_case": jnp.asarray(rng.integers(0, 2, (B, S))),
    }


def test_aligned_phonemizer_shapes_and_loss():
    model = Phonemizer(CFG)
    X = char_batch()
    params = model.init(jax.random.PRNGKey(0), X)
    logits = jax.jit(model.apply)(params, X)
    assert logits.shape == (2, 20, 60)
    y = jnp.asarray(np.random.default_rng(1).integers(0, 60, (2, 20)))
    loss = phonemizer_loss(logits, y)
    assert 3.0 < float(loss) < 6.0  # ~log(60) at init
    acc = phonemizer_accuracy(logits, y)
    assert int(acc["phones"]) > 0 and int(acc["seqs"]) == 2


def test_m2m_teacher_forced_and_free_run():
    model = PhonemizerM2M(CFG)
    B, S, T, W = 2, 20, 12, 4
    rng = np.random.default_rng(2)
    X = char_batch(B, S)
    # word spans: 4 words of 5 chars each
    X["x_word_start"] = jnp.asarray([[0, 5, 10, 15]] * B)
    X["x_word_stop"] = jnp.asarray([[5, 10, 15, 20]] * B)
    X["x_num_words"] = jnp.asarray([4, 3])
    Xt = dict(X)
    Xt["y_phon"] = jnp.asarray(rng.integers(1, 60, (B, T)))
    Xt["y_new_word"] = jnp.asarray(rng.integers(0, 3, (B, T)))

    params = model.init(jax.random.PRNGKey(0), Xt)
    phon_logits, nw_logits, _ = model.apply(params, Xt)
    assert phon_logits.shape == (B, T, 60) and nw_logits.shape == (B, T, 20)
    loss = m2m_loss(phon_logits, nw_logits, Xt["y_phon"], Xt["y_new_word"])
    assert np.isfinite(float(loss))

    # free run with static max steps
    pl_, nw_, finished = jax.jit(
        lambda p, x: model.apply(p, x, max_steps=16))(params, X)
    assert pl_.shape == (B, 16, 60) and finished.shape == (B, 16)


def test_m2m_validation_scores_free_running_decode():
    """phonemizer_val_step must score M2M PACC/SACC from a free-running decode — the
    reference deletes y_phon before the validation forward (phonemizer.py:221-246);
    teacher-forced scoring inflates accuracy because the decoder is fed gold history."""
    from ttscube_tpu.train.states import create_phonemizer_state, phonemizer_val_step

    model = PhonemizerM2M(CFG)
    B, S, T = 2, 20, 12
    rng = np.random.default_rng(3)
    X = char_batch(B, S, key=3)
    X["x_word_start"] = jnp.asarray([[0, 5, 10, 15]] * B)
    X["x_word_stop"] = jnp.asarray([[5, 10, 15, 20]] * B)
    X["x_num_words"] = jnp.asarray([4, 4])
    X["y_phon"] = jnp.asarray(rng.integers(1, 60, (B, T)))
    X["y_new_word"] = jnp.asarray(rng.integers(1, 3, (B, T)))

    state = create_phonemizer_state(model, jax.random.PRNGKey(1), X)
    metrics = phonemizer_val_step(model, state, X)

    tf_logits, _, _ = model.apply({"params": state.params}, X)
    X_free = {k: v for k, v in X.items() if k not in ("y_phon", "y_new_word")}
    free_logits, _, _ = model.apply({"params": state.params}, X_free, max_steps=T)

    # the two decodes genuinely diverge (teacher history changes the trajectory) —
    # otherwise the equality below would not distinguish them
    assert not np.array_equal(np.argmax(np.asarray(tf_logits), -1),
                              np.argmax(np.asarray(free_logits), -1))

    def pacc(logits):
        acc = phonemizer_accuracy(logits, X["y_phon"])
        return 1.0 - float(acc["perr"]) / max(float(acc["phones"]), 1.0)

    assert float(metrics["pacc"]) == pytest.approx(pacc(free_logits), abs=1e-6)
    if pacc(free_logits) != pacc(tf_logits):
        assert float(metrics["pacc"]) != pytest.approx(pacc(tf_logits), abs=1e-6)


def test_seq2seq_g2p():
    cfg = Seq2SeqConfig(num_input_tokens=30, num_output_tokens=40)
    model = Seq2Seq(cfg)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.integers(3, 30, (2, 8)))
    y = jnp.asarray(rng.integers(3, 40, (2, 10)))
    params = model.init(jax.random.PRNGKey(0), x, y)
    logits, _ = model.apply(params, x, y)
    assert logits.shape == (2, 10, 40)
    assert np.isfinite(float(seq2seq_loss(logits, y)))

    logits_free, done = jax.jit(lambda p, x: model.apply(p, x, max_steps=20))(params, x)
    assert logits_free.shape == (2, 20, 40)
    toks = greedy_decode(logits_free, done)
    assert toks.shape == (2, 20)


def test_m2m_word_index_advances_with_teacher():
    """y_new_word=2 must advance the word pointer by 1 (reference clip(nw-1,0))."""
    model = PhonemizerM2M(CFG)
    B, S, T = 1, 10, 6
    X = {
        "x_char": jnp.ones((B, S), jnp.int32),
        "x_case": jnp.zeros((B, S), jnp.int32),
        "x_word_start": jnp.asarray([[0, 5]]),
        "x_word_stop": jnp.asarray([[5, 10]]),
        "x_num_words": jnp.asarray([2]),
        "y_phon": jnp.ones((B, T), jnp.int32),
        "y_new_word": jnp.asarray([[1, 1, 2, 1, 2, 1]]),  # advances at steps 2 and 4
    }
    params = model.init(jax.random.PRNGKey(0), X)
    _, _, finished = model.apply(params, X)
    # word index: 0,0,0→1 after step2, 1, 1→2 after step4 → finished at steps 4,5
    np.testing.assert_array_equal(np.asarray(finished)[0], [0, 0, 0, 0, 1, 1])
