"""Property tests for the KMV/theta sketch layer.

The merge law (K smallest of the union of per-partition K-smallest
sets == K smallest of the full set) is what lets agg_kmv_incremental
persist daily partials and what SCALE.md claims for cross-snapshot
merging — Hypothesis hammers it with adversarial partitionings
instead of one fixture shape. The estimator sanity property pins the
exact-mode boundary (n < K must be exact, n >= K must engage the
(K-1)·R/theta form).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

K = 64
R = 1 << 60


def kmv(values, k=K):
    """The K smallest distinct values — the sketch."""
    return sorted(set(values))[:k]


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),  # partition (day)
            st.integers(min_value=0, max_value=R - 1),  # hash value
        ),
        max_size=400,
    )
)
@settings(max_examples=300, deadline=None)
def test_merge_of_partial_sketches_equals_direct(pairs):
    by_part: dict[int, list[int]] = {}
    for part, v in pairs:
        by_part.setdefault(part, []).append(v)
    partials = [kmv(vs) for vs in by_part.values()]
    merged = kmv([v for p in partials for v in p])
    direct = kmv([v for _, v in pairs])
    assert merged == direct


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=R - 1),
        ),
        max_size=400,
    ),
    st.integers(min_value=1, max_value=5),  # re-merge in waves
)
@settings(max_examples=150, deadline=None)
def test_merge_is_associative_over_regrouping(pairs, waves):
    # merging partials in any grouping gives the same sketch —
    # the property that makes day->month->year rollups safe
    by_part: dict[int, list[int]] = {}
    for part, v in pairs:
        by_part.setdefault(part, []).append(v)
    partials = [kmv(vs) for vs in by_part.values()]
    regrouped = [
        kmv([v for p in partials[i::waves] for v in p])
        for i in range(waves)
    ]
    assert kmv([v for g in regrouped for v in g]) == kmv(
        [v for _, v in pairs]
    )


@given(st.sets(st.integers(), min_size=0, max_size=400))
@settings(max_examples=200, deadline=None)
def test_estimator_exact_below_k_and_sane_above(items):
    # the estimator's uniformity assumption holds only for HASHED
    # items — run Hypothesis's adversarial ints through the same
    # md5-60bit map the operators use
    import hashlib

    values = {
        int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
        for i in items
    }
    sk = kmv(values)
    n = len(values)
    if n < K:
        # exact mode: the sketch IS the set
        assert sk == sorted(values)
    else:
        theta = sk[-1]
        est = (K - 1) * R / theta
        # KMV standard error is 1/sqrt(K-2) ~ 12.7%; 6-sigma guard
        # catches implementation errors, not statistical noise
        assert abs(est - n) <= max(6 * 0.127 * n, 8)
