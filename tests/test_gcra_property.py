"""Property tests for the pure GCRA core (streaming/stateful.py).

Invariants (throttler.go:36-38 cost model: cost = 1e9/rps ns,
burst = 1e9 - cost ns):

1. Rate bound: in ANY window of width W ns, admits <= rps * W / 1e9
   + rps + 1: the reference's burst capacity is (1e9 - cost) ns, which
   amortizes to up to `rps` extra tokens at an instant, +1 for the
   window-edge token.
2. Batch-split equivalence: processing a sorted sequence in one call or
   split at any point with carried tat yields identical decisions — this
   is exactly what makes micro-batch boundaries invisible to the
   streaming operator.
3. tat monotonicity: the carried tat never decreases.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from flow_spark.streaming.stateful import gcra_admit

_NS = 1_000_000_000

ts_lists = st.lists(
    st.integers(min_value=0, max_value=10 * _NS), min_size=1, max_size=200
).map(sorted)


@given(ts=ts_lists, rps=st.integers(min_value=1, max_value=1000))
@settings(max_examples=200, deadline=None)
def test_rate_bound_any_window(ts, rps):
    admits, _ = gcra_admit(ts, 0, rps)
    admitted = [t for t, a in zip(ts, admits) if a]
    for i, lo in enumerate(admitted):
        for j in range(i, len(admitted)):
            w = admitted[j] - lo
            n = j - i + 1
            assert n <= rps * w / _NS + rps + 1, (n, w, rps)


@given(
    ts=ts_lists,
    rps=st.integers(min_value=1, max_value=1000),
    data=st.data(),
)
@settings(max_examples=200, deadline=None)
def test_batch_split_equivalence(ts, rps, data):
    cut = data.draw(st.integers(min_value=0, max_value=len(ts)))
    whole, tat_whole = gcra_admit(ts, 0, rps)
    a1, tat_mid = gcra_admit(ts[:cut], 0, rps)
    a2, tat_end = gcra_admit(ts[cut:], tat_mid, rps)
    assert a1 + a2 == whole
    assert tat_end == tat_whole


@given(ts=ts_lists, rps=st.integers(min_value=1, max_value=1000))
@settings(max_examples=100, deadline=None)
def test_tat_monotone(ts, rps):
    tat = 0
    for t in ts:
        _, new_tat = gcra_admit([t], tat, rps)
        assert new_tat >= tat
        tat = new_tat
