"""EM checkpoint/resume: a split run must reproduce the one-shot run
exactly (the EM state is exactly (pi, iteration))."""

import numpy as np
import jax.numpy as jnp
import pytest

from sketch_rna_tpu.config import QuantConfig
from sketch_rna_tpu.em.checkpoint import (
    EMState,
    check_resumable,
    fingerprint_of,
    load_em_state,
    save_em_state,
)
from sketch_rna_tpu.em.em import run_em_tables


def make_tables(rng, N=200, C=8, T=40):
    tid = rng.integers(0, T, size=(N, C)).astype(np.int32)
    score = rng.integers(0, 5, size=(N, C)).astype(np.int32)
    return jnp.asarray(tid), jnp.asarray(score), T


def test_resume_reproduces_oneshot(rng):
    tid, score, T = make_tables(rng)
    R = jnp.asarray(180, jnp.int32)
    kw = dict(num_transcripts=T, convergence_threshold=1e-9, dtype="float64")

    pi_full, it_full = run_em_tables(tid, score, R, max_iterations=20, **kw)

    pi_half, it_half = run_em_tables(tid, score, R, max_iterations=10, **kw)
    assert int(it_half) == 10
    pi_resumed, it_resumed = run_em_tables(
        tid,
        score,
        R,
        max_iterations=20,
        init_pi=pi_half,
        start_iteration=int(it_half),
        **kw,
    )
    assert int(it_resumed) == int(it_full)
    np.testing.assert_array_equal(np.asarray(pi_resumed), np.asarray(pi_full))


def test_state_roundtrip(tmp_path, rng):
    pi = rng.random(64)
    cfg = QuantConfig()
    fp = fingerprint_of(64, 1000, cfg)
    state = EMState(pi=pi, iterations_done=7, num_reads=1000, fingerprint=fp)
    path = str(tmp_path / "em.ckpt.npz")
    save_em_state(path, state)
    loaded = load_em_state(path)
    np.testing.assert_array_equal(loaded.pi, pi)
    assert loaded.iterations_done == 7
    assert loaded.num_reads == 1000
    check_resumable(loaded, fp)
    with pytest.raises(ValueError):
        check_resumable(loaded, fingerprint_of(65, 1000, cfg))


def test_timing_utils():
    from sketch_rna_tpu.utils.timing import PhaseTimer

    t = PhaseTimer()
    with t.phase("a", items=100):
        pass
    with t.phase("a", items=100):
        pass
    rep = t.report()
    assert rep["a"] >= 0
    assert rep["a_per_s"] > 0
    assert t.items["a"] == 200
