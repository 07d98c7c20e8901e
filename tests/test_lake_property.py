"""Property-based exactly-once check (hypothesis): for ANY change stream —
random ops over a colliding key space, seqs assigned in random arrival
order — and ANY partition of that stream into micro-batches, the MOR merge
converges to the sequential LWW oracle (max-commit_seq event per key;
delete → absent), and re-applying the final batch as an overlap replay is
a no-op. This is the invariant that makes checkpoint replay safe: batch
boundaries and arrival order must never influence the final state."""

import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kafka_mongo_watcher_spark.plans.lake import LakeTable

from tests.test_lake_mor import _batch, _state


@st.composite
def scenario(draw):
    n = draw(st.integers(min_value=3, max_value=16))
    ops = draw(
        st.lists(
            st.sampled_from(["insert", "update", "replace", "delete"]),
            min_size=n, max_size=n,
        )
    )
    keys = draw(st.lists(st.integers(0, 3), min_size=n, max_size=n))
    seqs = draw(st.permutations(range(1, n + 1)))  # arrival order != seq order
    cuts = sorted(draw(st.sets(st.integers(1, n - 1), max_size=3)))
    return ops, keys, list(seqs), cuts


def _events(ops, keys, seqs):
    rows = []
    for op, k, seq in zip(ops, keys, seqs):
        rows.append(
            (0, seq, op, f"r{k % 2}", f"p{k}", f"commit{seq}", "py",
             f"c{seq}", f"sha{seq}", seq)
        )
    return rows


def _oracle(rows):
    """Sequential replay in commit_seq order: max-seq event per key wins."""
    state = {}
    for r in sorted(rows, key=lambda r: r[9]):
        key = (r[3], r[4])
        if r[2] == "delete":
            state.pop(key, None)
        else:
            state[key] = (r[5], r[7], r[9])
    return state


def _run_case(spark, case):
    ops, keys, seqs, cuts = case
    rows = _events(ops, keys, seqs)
    bounds = [0, *cuts, len(rows)]
    batches = [rows[a:b] for a, b in zip(bounds, bounds[1:]) if a < b]
    t = LakeTable.create(
        spark, tempfile.mkdtemp(prefix="kmw_prop_"), n_buckets=4,
        write_mode="mor",
    )
    for i, b in enumerate(batches):
        t.merge(_batch(spark, b), source_id="s", batch_id=i)
    want = _oracle(rows)
    assert _state(t) == want
    # overlap replay of the final batch under a fresh batch id (fencing
    # deliberately bypassed) must converge, not duplicate or regress
    t.merge(_batch(spark, batches[-1]), source_id="s2", batch_id=0)
    assert _state(t) == want


@given(case=scenario())
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_merge_split_invariance(spark, case):
    _run_case(spark, case)
