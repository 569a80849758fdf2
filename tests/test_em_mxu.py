"""One-hot MXU E-step (em/em.py "MXU one-hot E-step") vs the scatter path.

The MXU formulation changes only summation ORDER (one-hot products are
exact selects), so pi / weighted counts must agree with the scatter path
to float32 round-off, and has_entry must agree exactly.  use_mxu=True is
forced here so the math is exercised on the CPU test backend too; the
auto gate itself is tested separately.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sketch_rna_tpu.em.em import (
    assign_reads_partitioned,
    assign_reads_tables,
    mxu_em_auto,
    resolve_em_mxu,
    run_em_assign_partitioned,
    run_em_partitioned,
    run_em_tables,
)


def _random_tables(rng, n, w, T, weighted=False, empty_rows=False):
    tid = rng.integers(0, T, (n, w)).astype(np.int32)
    score = rng.integers(0, 5, (n, w)).astype(np.int32)
    if empty_rows:
        score[rng.random(n) < 0.3] = 0  # rows with zero denominator
    weight = rng.integers(0, 7, n).astype(np.int32) if weighted else None
    return jnp.asarray(tid), jnp.asarray(score), (None if weight is None else jnp.asarray(weight))


@pytest.mark.parametrize("T", [130, 2000])  # non-multiple and multiple-ish of 128
@pytest.mark.parametrize("weighted", [False, True])
def test_em_partitioned_mxu_matches_scatter(T, weighted):
    rng = np.random.default_rng(7)
    t1 = _random_tables(rng, 257, 8, T, weighted=weighted)
    t2 = _random_tables(rng, 64, 16, T, weighted=weighted, empty_rows=True)
    tables = (t1, t2)
    R = jnp.int32(4096)
    kw = dict(num_transcripts=T, max_iterations=20, dtype="float32")
    pi_a, it_a, _ = run_em_partitioned(tables, R, use_mxu=False, **kw)
    pi_b, it_b, _ = run_em_partitioned(tables, R, use_mxu=True, **kw)
    assert int(it_a) == int(it_b)
    np.testing.assert_allclose(np.asarray(pi_a), np.asarray(pi_b), rtol=2e-5, atol=1e-9)

    w_a, h_a = assign_reads_partitioned(tables, pi_a, num_transcripts=T, use_mxu=False)
    w_b, h_b = assign_reads_partitioned(tables, pi_a, num_transcripts=T, use_mxu=True)
    np.testing.assert_allclose(np.asarray(w_a), np.asarray(w_b), rtol=2e-5, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(h_a), np.asarray(h_b))


def test_em_assign_fused_mxu():
    rng = np.random.default_rng(11)
    tables = (_random_tables(rng, 300, 8, 500, weighted=True),)
    R = jnp.int32(1000)
    out_a = run_em_assign_partitioned(tables, R, num_transcripts=500, use_mxu=False)
    out_b = run_em_assign_partitioned(tables, R, num_transcripts=500, use_mxu=True)
    for a, b, exact in zip(out_a, out_b, (False, True, False, True)):
        if exact:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        else:
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7
            )


def test_em_tables_wrapper_mxu():
    """run_em_tables / assign_reads_tables delegate with identical results."""
    rng = np.random.default_rng(3)
    tid, score, weight = _random_tables(rng, 128, 4, 200, weighted=True)
    R = jnp.int32(512)
    pi_a, it_a = run_em_tables(tid, score, R, num_transcripts=200, weight=weight)
    pi_b, it_b = run_em_tables(
        tid, score, R, num_transcripts=200, weight=weight, use_mxu=True
    )
    assert int(it_a) == int(it_b)
    np.testing.assert_allclose(np.asarray(pi_a), np.asarray(pi_b), rtol=2e-5, atol=1e-9)
    w_a, h_a = assign_reads_tables(tid, score, pi_a, num_transcripts=200, weight=weight)
    w_b, h_b = assign_reads_tables(
        tid, score, pi_a, num_transcripts=200, weight=weight, use_mxu=True
    )
    np.testing.assert_allclose(np.asarray(w_a), np.asarray(w_b), rtol=2e-5, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(h_a), np.asarray(h_b))


def test_mxu_gate():
    # float64 never uses MXU (bit-parity path); CPU backend never auto-enables.
    assert not mxu_em_auto(2000, 10_000, "float64")
    assert not mxu_em_auto(50_000_000, 10_000, "float32")  # T too large
    assert resolve_em_mxu("on", 10**9, 10**9, "float64") is True
    assert resolve_em_mxu("off", 100, 100, "float32") is False
    # auto on CPU test backend: off regardless of size
    import jax

    if jax.default_backend() != "tpu":
        assert resolve_em_mxu("auto", 2000, 10_000, "float32") is False
