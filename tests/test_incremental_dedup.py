"""Cross-snapshot incremental dedup: planted overlap vs independent
set-membership replay, no intra-new collapsing, layout determinism,
cap."""

import pyarrow as pa
import pytest
import ray

from jamie_ray.functions.dedup_docs import incremental_dedup

OLD = ["alpha body text", "beta body text", "gamma body text"]
NEW = {
    10: "beta body text",       # exists in previous snapshot
    11: "delta fresh text",
    12: "gamma body text",      # exists in previous snapshot
    13: "delta fresh text",     # intra-new duplicate: NOT collapsed here
    14: "epsilon fresh text",
}


def _old_ds():
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(OLD)), pa.int64()),
                "text": pa.array(OLD, pa.string()),
            }
        )
    )


def _new_ds():
    ids = sorted(NEW)
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array([NEW[i] for i in ids], pa.string()),
            }
        )
    )


def _flags(ds_out):
    return {r["doc_id"]: r["in_previous"] for r in ds_out.take_all()}


def test_overlap_flags_match_set_membership(ray_session):
    got = _flags(incremental_dedup(_new_ds(), _old_ds()))
    want = {i: (1 if NEW[i] in set(OLD) else 0) for i in NEW}
    assert got == want
    assert got == {10: 1, 11: 0, 12: 1, 13: 0, 14: 0}
    # intra-new dup (11 vs 13) stays: both rows present, both 0
    assert 13 in got


def test_layout_determinism(ray_session):
    a = _flags(incremental_dedup(_new_ds(), _old_ds()))
    b = _flags(
        incremental_dedup(_new_ds().repartition(4), _old_ds().repartition(3))
    )
    assert a == b


def test_disjoint_and_empty_old(ray_session):
    empty_old = ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}
        )
    )
    got = _flags(incremental_dedup(_new_ds(), empty_old))
    assert set(got.values()) == {0}


def test_shuffle_path_matches_broadcast(ray_session):
    """flag_path='shuffle' (zero driver collections) produces the same
    (id, in_previous) pairs as the broadcast path."""
    got = {
        r["doc_id"]: r["in_previous"]
        for r in incremental_dedup(
            _new_ds(), _old_ds(), flag_path="shuffle"
        ).take_all()
    }
    assert got == _flags(incremental_dedup(_new_ds(), _old_ds()))
    # shuffle path survives a tiny edge_cap: nothing is driver-collected
    got2 = {
        r["doc_id"]: r["in_previous"]
        for r in incremental_dedup(
            _new_ds(), _old_ds(), flag_path="shuffle", edge_cap=1
        ).take_all()
    }
    assert got2 == got


def test_null_text_never_matches(ray_session):
    """SQL NULL != NULL semantics: null text on both sides is not a
    match."""
    old = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["real old text", None], pa.string()),
            }
        )
    )
    new = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([10, 11], pa.int64()),
                "text": pa.array([None, "real old text"], pa.string()),
            }
        )
    )
    for path in ("broadcast", "shuffle"):
        got = {
            r["doc_id"]: r["in_previous"]
            for r in incremental_dedup(new, old, flag_path=path).take_all()
        }
        assert got[11] == 1, path
        # null-text new docs are present with in_previous = 0 on BOTH
        # paths (the shuffle path routes them through bucket 0 with a
        # null hash rather than dropping them)
        assert got[10] == 0, path


def test_cap(ray_session):
    from jamie_ray.state.collect import EdgeCapExceeded

    with pytest.raises(EdgeCapExceeded):
        incremental_dedup(_new_ds(), _old_ds(), edge_cap=1).take_all()
