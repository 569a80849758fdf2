"""The forall-k fractional threshold at exact boundaries: count ==
fraction*max must PASS (reference: `count < threshold` fails,
src/sparse_chaining.cpp:87), verified through the integer-exact compare
and against the oracle's float64 compare."""

import numpy as np
import jax.numpy as jnp

from sketch_rna_tpu.match.candidates import _fraction_compare_params
from sketch_rna_tpu.match.rowmatch import row_events_to_candidates


def make_keym(events, width=64, num_k=1):
    """events: list of (tid, count) for one read."""
    lanes = []
    for tid, count in events:
        lanes += [tid * num_k] * count
    lanes += [2**31 - 1] * (width - len(lanes))
    return jnp.asarray(np.array([lanes], dtype=np.int32))


def test_rational_params():
    assert _fraction_compare_params(0.9) == (9, 10)
    assert _fraction_compare_params(0.5) == (1, 2)
    assert _fraction_compare_params(0.0) == (0, 1)


def test_boundary_exactly_at_threshold_passes():
    # max = 10; counts 10, 9 (== 0.9*10) pass; 8 fails.
    keym = make_keym([(1, 10), (2, 9), (3, 8)])
    r = row_events_to_candidates(
        keym, num_k=1, chain_fraction=0.9, candidate_capacity=8
    )
    tids = np.asarray(r.tid)[0][np.asarray(r.mask)[0]].tolist()
    scores = np.asarray(r.score)[0][np.asarray(r.mask)[0]].tolist()
    assert tids == [1, 2]
    assert scores == [10, 9]


def test_boundary_oracle_agreement():
    # The C++ double compare: 8 < 0.9*10 -> excluded; 9 < 9.0 false -> kept.
    thr = 0.9 * 10  # float64, equals 9.0 exactly (see DESIGN.md)
    assert not (9 < thr)
    assert 8 < thr


def test_zero_max_all_pass():
    # A k with no matches anywhere: max=0 -> threshold 0 -> counts 0 pass
    # (only affects multi-k forall filtering).
    keym = make_keym([(5, 3)], num_k=2)  # events only for k0
    r = row_events_to_candidates(
        keym, num_k=2, chain_fraction=0.9, candidate_capacity=4
    )
    tids = np.asarray(r.tid)[0][np.asarray(r.mask)[0]].tolist()
    assert tids == [5]
    assert np.asarray(r.score)[0][0] == 3


def test_single_candidate_always_passes():
    keym = make_keym([(7, 1)])
    r = row_events_to_candidates(
        keym, num_k=1, chain_fraction=0.9, candidate_capacity=4
    )
    assert np.asarray(r.mask)[0].sum() == 1
    assert np.asarray(r.tid)[0][0] == 7
