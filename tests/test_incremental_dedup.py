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


def test_bloom_path_matches_broadcast_at_generous_size(ray_session):
    # 2**20 bits for a handful of hashes: FP probability ~ 0 — the
    # bloom path must agree with the exact broadcast path bit-for-bit
    got = _flags(
        incremental_dedup(
            _new_ds().repartition(3),
            _old_ds().repartition(2),
            flag_path="bloom",
            bloom_bits=1 << 20,
        )
    )
    assert got == _flags(incremental_dedup(_new_ds(), _old_ds()))


def test_bloom_never_misses_a_persisted_doc(ray_session):
    # one-sided error: even a pathologically small filter flags every
    # genuinely-persisted doc (no false negatives, by construction)
    got = _flags(
        incremental_dedup(
            _new_ds(), _old_ds(), flag_path="bloom", bloom_bits=64,
            bloom_hashes=2,
        )
    )
    assert got[10] == 1 and got[12] == 1


def test_bloom_null_text_never_matches(ray_session):
    new = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([10, 11], pa.int64()),
                "text": pa.array(["beta body text", None], pa.string()),
            }
        )
    )
    old = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["beta body text", None], pa.string()),
            }
        )
    )
    got = _flags(incremental_dedup(new, old, flag_path="bloom",
                                   bloom_bits=1 << 20))
    assert got == {10: 1, 11: 0}


def test_bloom_empty_old(ray_session):
    old = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
            }
        )
    )
    got = _flags(incremental_dedup(_new_ds(), old, flag_path="bloom",
                                   bloom_bits=1 << 16))
    assert got == {i: 0 for i in NEW}


def test_bloom_layout_determinism_and_slice_assembly(ray_session):
    # small filter with many slices in play: positions from different
    # blocks land in different slices and the assembled bitmap must be
    # identical under any partitioning
    a = _flags(
        incremental_dedup(
            _new_ds(), _old_ds(), flag_path="bloom", bloom_bits=1 << 16
        )
    )
    b = _flags(
        incremental_dedup(
            _new_ds().repartition(5),
            _old_ds().repartition(4),
            flag_path="bloom",
            bloom_bits=1 << 16,
        )
    )
    assert a == b


def test_bloom_fp_rate_is_bounded_and_one_sided(ray_session):
    # 200 old docs into a 2**14-bit filter with k=7: expected FP
    # ~ (1 - e^(-7*200/16384))^7 ~ 4e-4 per new doc; across 200 fresh
    # docs expect ~0 false flags, and NEVER a missed duplicate.
    old_texts = [f"old document number {i}" for i in range(200)]
    new_texts = [f"fresh document number {i}" for i in range(200)] + old_texts[:50]
    old = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(200), pa.int64()),
                "text": pa.array(old_texts, pa.string()),
            }
        )
    ).repartition(4)
    new = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(250), pa.int64()),
                "text": pa.array(new_texts, pa.string()),
            }
        )
    ).repartition(4)
    got = _flags(incremental_dedup(new, old, flag_path="bloom",
                                   bloom_bits=1 << 14))
    # every persisted doc flagged (ids 200..249)
    assert all(got[i] == 1 for i in range(200, 250))
    # false-positive mass over the 200 fresh docs is tiny
    assert sum(got[i] for i in range(200)) <= 3


def test_bloom_rejects_bad_params(ray_session):
    with pytest.raises(ValueError):
        incremental_dedup(_new_ds(), _old_ds(), flag_path="bloom",
                          bloom_bits=8)
    with pytest.raises(ValueError):
        incremental_dedup(_new_ds(), _old_ds(), flag_path="bloom",
                          bloom_hashes=0)


def test_cli_dedup_inc_bloom(tmp_path, ray_session):
    import json as _json
    import subprocess
    import sys

    import pyarrow.parquet as pq

    newp = tmp_path / "new.parquet"
    oldp = tmp_path / "old.parquet"
    ids = sorted(NEW)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array([NEW[i] for i in ids], pa.string()),
            }
        ),
        newp,
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(OLD)), pa.int64()),
                "text": pa.array(OLD, pa.string()),
            }
        ),
        oldp,
    )
    out = tmp_path / "out"
    r = subprocess.run(
        [
            sys.executable, "-m", "jamie_ray", "dedup-inc",
            "--docs", str(newp), "--prev", str(oldp), "--out", str(out),
            "--flag-path", "bloom", "--bloom-bits", str(1 << 20),
        ],
        capture_output=True,
        text=True,
        check=True,
    )
    info = _json.loads(r.stdout.strip().splitlines()[-1])
    assert info["n_docs"] == 5 and info["n_in_previous"] == 2


def test_bloom_small_edge_cap_does_not_trip_slice_collect(ray_session):
    # the slice collection is structurally bounded (<= 256 rows); a
    # caller edge_cap sized for overlap sets must not spuriously raise
    got = _flags(
        incremental_dedup(
            _new_ds(), _old_ds(), flag_path="bloom", bloom_bits=1 << 20,
            edge_cap=4,
        )
    )
    assert got == {10: 1, 11: 0, 12: 1, 13: 0, 14: 0}
