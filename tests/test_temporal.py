"""Tests for the custom temporal operators (as-of join, sessionize)."""

import datetime as dt

import pyarrow as pa
import pytest


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def tiny(ray_session):
    import ray.data

    events = ray.data.from_items(
        [
            {"event_id": 1, "user_id": 7, "ts": _ts("2024-01-01T10:00")},
            {"event_id": 2, "user_id": 7, "ts": _ts("2024-01-01T12:00")},
            {"event_id": 3, "user_id": 8, "ts": _ts("2024-01-01T10:00")},
            {"event_id": 4, "user_id": 9, "ts": _ts("2024-01-01T10:00")},
        ]
    )
    orders = ray.data.from_items(
        [
            {"o_custkey": 7, "o_orderkey": 100, "o_orderdate": _ts("2024-01-01T09:00")},
            {"o_custkey": 7, "o_orderkey": 101, "o_orderdate": _ts("2024-01-01T11:00")},
            # tie on date for user 8 -> greater orderkey wins
            {"o_custkey": 8, "o_orderkey": 200, "o_orderdate": _ts("2024-01-01T08:00")},
            {"o_custkey": 8, "o_orderkey": 201, "o_orderdate": _ts("2024-01-01T08:00")},
            # user 9 has only a FUTURE order -> no match
            {"o_custkey": 9, "o_orderkey": 300, "o_orderdate": _ts("2024-01-02T00:00")},
        ]
    )
    return events, orders


def test_asof_join_semantics(tiny):
    from jamie_ray.functions.temporal import asof_join

    events, orders = tiny
    out = asof_join(
        events,
        orders,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        right_cols=["o_orderkey", "o_orderdate"],
    )
    rows = {r["event_id"]: r for r in out.take_all()}
    assert rows[1]["o_orderkey"] == 100   # latest order before 10:00
    assert rows[2]["o_orderkey"] == 101   # 11:00 order before 12:00
    assert rows[3]["o_orderkey"] == 201   # tie -> max orderkey
    assert 4 not in rows                  # future-only orders drop the row


def test_sessionize(ray_session):
    import ray.data

    from jamie_ray.functions.temporal import sessionize

    events = ray.data.from_items(
        [
            {"event_id": 1, "user_id": 1, "ts": _ts("2024-01-01T10:00")},
            {"event_id": 2, "user_id": 1, "ts": _ts("2024-01-01T10:10")},
            {"event_id": 3, "user_id": 1, "ts": _ts("2024-01-01T11:30")},  # >30min gap
            {"event_id": 4, "user_id": 2, "ts": _ts("2024-01-01T10:00")},
        ]
    )
    out = {r["event_id"]: r["session_id"] for r in
           sessionize(events, gap_minutes=30).take_all()}
    assert out[1] == 0 and out[2] == 0
    assert out[3] == 1
    assert out[4] == 0


def test_asof_join_matches_duckdb(ray_session):
    import duckdb
    import ray.data

    sf = "/root/testdata/sf0.001"
    events = ray.data.read_parquet(f"{sf}/events.parquet", columns=["event_id", "user_id", "ts"])
    orders = ray.data.read_parquet(
        f"{sf}/orders.parquet", columns=["o_custkey", "o_orderkey", "o_orderdate"]
    )
    from jamie_ray.functions.temporal import asof_join

    out = asof_join(
        events, orders,
        left_key="user_id", right_key="o_custkey",
        left_ts="ts", right_ts="o_orderdate",
        right_cols=["o_orderkey", "o_orderdate"],
    )
    got = sorted(
        (r["event_id"], r["o_orderkey"]) for r in out.take_all()
    )
    con = duckdb.connect()
    exp = sorted(
        map(tuple, con.execute(f"""
        WITH j AS (
          SELECT e.event_id, o.o_orderkey,
                 row_number() OVER (PARTITION BY e.event_id
                                    ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) rn
          FROM read_parquet('{sf}/events.parquet') e
          JOIN read_parquet('{sf}/orders.parquet') o
            ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        ) SELECT event_id, o_orderkey FROM j WHERE rn = 1
        """).fetchall())
    )
    assert got == exp and len(got) > 0


def test_range_join_matches_duckdb(ray_session):
    import duckdb
    import ray.data

    from jamie_ray.functions.temporal import range_join

    sf = "/root/testdata/sf0.001"
    events = ray.data.read_parquet(f"{sf}/events.parquet", columns=["event_id", "user_id", "ts"])
    orders = ray.data.read_parquet(
        f"{sf}/orders.parquet", columns=["o_custkey", "o_orderkey", "o_orderdate"]
    )
    # orders within the 30 years BEFORE the event (wide window so the
    # test has matches at this scale)
    out = range_join(
        events, orders,
        left_key="user_id", right_key="o_custkey",
        left_ts="ts", right_ts="o_orderdate",
        right_cols=["o_orderkey", "o_orderdate"],
        lower_seconds=-86400.0 * 365 * 30, upper_seconds=0.0,
    )
    got = sorted((r["event_id"], r["o_orderkey"]) for r in out.take_all())
    con = duckdb.connect()
    exp = sorted(map(tuple, con.execute(f"""
        SELECT e.event_id, o.o_orderkey
        FROM read_parquet('{sf}/events.parquet') e
        JOIN read_parquet('{sf}/orders.parquet') o
          ON o.o_custkey = e.user_id
         AND o.o_orderdate >= e.ts - INTERVAL 30 YEAR
         AND o.o_orderdate <= e.ts
    """).fetchall()))
    assert got == exp and len(got) > 0


def test_running_counts_incremental_state(ray_session):
    import ray.data

    from jamie_ray.functions.streaming import running_counts

    sf = "/root/testdata/sf0.001"
    events = ray.data.read_parquet(f"{sf}/events.parquet",
                                   columns=["event_id", "ts", "event_type"])
    snaps = running_counts(events, batch_size=128).take_all()
    assert snaps
    # monotone per type across snapshots
    seen: dict = {}
    last_wm = None
    for r in snaps:
        if last_wm is not None and r["watermark"] is not None:
            assert r["watermark"] >= last_wm
        last_wm = r["watermark"] or last_wm
        assert r["cumulative_n"] >= seen.get(r["event_type"], 0)
        seen[r["event_type"]] = r["cumulative_n"]
    # final snapshot equals batch groupby counts
    import duckdb

    exp = dict(duckdb.connect().execute(
        f"SELECT event_type, count(*) FROM read_parquet('{sf}/events.parquet') GROUP BY 1"
    ).fetchall())
    assert seen == exp


def _skewed(ray_session):
    """One hot user with many events/orders spread over weeks + a few
    normal users; used to prove the salted path is bit-identical."""
    import ray.data

    base = dt.datetime(2024, 1, 1)
    events, orders = [], []
    eid = 0
    for u, n in [(1, 60), (2, 5), (3, 1)]:
        for k in range(n):
            events.append(
                {"event_id": (eid := eid + 1), "user_id": u,
                 "ts": base + dt.timedelta(hours=7 * k + u)}
            )
        for k in range(max(1, n // 2)):
            orders.append(
                {"o_custkey": u, "o_orderkey": 1000 * u + k,
                 "o_orderdate": base + dt.timedelta(hours=11 * k)}
            )
    # a user with events but no orders, and vice versa
    events.append({"event_id": (eid := eid + 1), "user_id": 4, "ts": base})
    orders.append({"o_custkey": 5, "o_orderkey": 5000, "o_orderdate": base})
    return ray.data.from_items(events), ray.data.from_items(orders)


def _rows_key(rows):
    return sorted(tuple(sorted(r.items())) for r in rows)


def test_asof_join_salted_equals_unsalted(ray_session):
    from jamie_ray.functions.temporal import asof_join

    events, orders = _skewed(ray_session)
    kw = dict(
        left_key="user_id", right_key="o_custkey",
        left_ts="ts", right_ts="o_orderdate",
        right_cols=["o_orderkey", "o_orderdate"],
    )
    plain = asof_join(events, orders, **kw).take_all()
    # 1-day buckets: the hot user's 60 events spread over ~18 buckets
    salted = asof_join(events, orders, bucket_seconds=86400.0, **kw).take_all()
    assert len(plain) > 0
    assert _rows_key(plain) == _rows_key(salted)


def test_range_join_salted_equals_unsalted(ray_session):
    from jamie_ray.functions.temporal import range_join

    events, orders = _skewed(ray_session)
    kw = dict(
        left_key="user_id", right_key="o_custkey",
        left_ts="ts", right_ts="o_orderdate",
        right_cols=["o_orderkey", "o_orderdate"],
        lower_seconds=-86400.0 * 3, upper_seconds=0.0,
    )
    plain = range_join(events, orders, **kw).take_all()
    salted = range_join(events, orders, bucket_seconds=86400.0 * 3, **kw).take_all()
    assert len(plain) > 0
    assert _rows_key(plain) == _rows_key(salted)


def test_hopping_window_agg(ray_session):
    """Each event lands in size/hop windows; tumbling (size==hop) gives
    exactly one window per event."""
    import ray.data

    from jamie_ray.functions.temporal import hopping_window_agg

    base = dt.datetime(2024, 1, 1, 0, 15)
    events = ray.data.from_items(
        [
            {"ts": base, "event_type": "a", "value": 1.5},
            {"ts": base + dt.timedelta(minutes=40), "event_type": "a", "value": 2.0},
            {"ts": base + dt.timedelta(hours=3), "event_type": "b", "value": 0.25},
        ]
    )
    hop = hopping_window_agg(
        events, size_seconds=3600.0, hop_seconds=1800.0,
        value_col="value", group_cols=["event_type"],
    ).take_all()
    # 2 windows per event; the two 'a' events share one window (00:00)
    n_total = sum(r["n"] for r in hop)
    assert n_total == 6
    shared = [r for r in hop if r["event_type"] == "a" and r["n"] == 2]
    assert len(shared) == 1 and abs(shared[0]["sum_value"] - 3.5) < 1e-9

    tumble = hopping_window_agg(
        events, size_seconds=3600.0, hop_seconds=3600.0,
        value_col="value", group_cols=["event_type"],
    ).take_all()
    assert sum(r["n"] for r in tumble) == 3


def test_hopping_window_numeric_seconds_ts(ray_session):
    """A NUMERIC ts column is epoch SECONDS by module convention — the
    window math must not reinterpret it as microseconds (code-review
    finding: the raw int64->timestamp cast did exactly that)."""
    import ray.data

    from jamie_ray.functions.temporal import hopping_window_agg

    events = ray.data.from_items(
        [
            {"ts": 1_700_000_000, "value": 1.0},   # same hour
            {"ts": 1_700_000_100, "value": 2.0},   # same hour
            {"ts": 1_700_003_700, "value": 4.0},   # next hour
        ]
    )
    out = hopping_window_agg(
        events, size_seconds=3600.0, hop_seconds=3600.0, value_col="value"
    ).take_all()
    assert sorted(r["n"] for r in out) == [1, 2]
    by_n = {r["n"]: r["sum_value"] for r in out}
    assert abs(by_n[2] - 3.0) < 1e-9 and abs(by_n[1] - 4.0) < 1e-9
    # window starts are hour-aligned timestamps derived from SECONDS
    starts = sorted(r["window_start"] for r in out)
    assert (starts[1] - starts[0]) == dt.timedelta(hours=1)


def test_asof_join_validates_and_tolerates_null_ties(tiny, ray_session):
    import ray.data

    from jamie_ray.functions.temporal import asof_join

    events, orders = tiny
    with pytest.raises(ValueError, match="right_cols"):
        asof_join(
            events, orders,
            left_key="user_id", right_key="o_custkey",
            left_ts="ts", right_ts="o_orderdate", right_cols=[],
        )

    # equal right_ts with a NULL tie value must not crash: null loses
    orders_null = ray.data.from_items(
        [
            {"o_custkey": 8, "o_orderkey": None, "o_orderdate": _ts("2024-01-01T08:00")},
            {"o_custkey": 8, "o_orderkey": 201, "o_orderdate": _ts("2024-01-01T08:00")},
        ]
    )
    out = asof_join(
        events, orders_null,
        left_key="user_id", right_key="o_custkey",
        left_ts="ts", right_ts="o_orderdate", right_cols=["o_orderkey"],
    ).take_all()
    got = {r["event_id"]: r["o_orderkey"] for r in out}
    assert got[3] == 201  # the non-null tie value wins


def test_sessionize_custom_id_col(ray_session):
    import ray.data

    from jamie_ray.functions.temporal import sessionize

    events = ray.data.from_items(
        [
            {"uid": 1, "when": 1000, "evt": 5},
            {"uid": 1, "when": 1000 + 40 * 60, "evt": 6},
        ]
    )
    out = sessionize(
        events, key="uid", ts="when", gap_minutes=30, id_col="evt"
    ).take_all()
    assert sorted(r["session_id"] for r in out) == [0, 1]


def test_range_join_microsecond_boundary_exact(ray_session):
    """Window bounds are integer microseconds: a right ts EXACTLY at
    left_ts + upper must be kept even at µs-grain timestamps where
    float-seconds arithmetic carries ulp noise."""
    import ray.data

    from jamie_ray.functions.temporal import range_join

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    left = ray.data.from_items(
        [{"k": 1, "lts": base + dt.timedelta(microseconds=123457)}]
    )
    right = ray.data.from_items(
        [
            # exactly lts + 0.1 s: the boundary pair
            {"k": 1, "rts": base + dt.timedelta(microseconds=223457), "rv": 1},
            # 1 µs past the bound: excluded
            {"k": 1, "rts": base + dt.timedelta(microseconds=223458), "rv": 2},
        ]
    )
    for bucket in (None, 0.05):
        out = range_join(
            left, right,
            left_key="k", right_key="k", left_ts="lts", right_ts="rts",
            right_cols=["rv"], lower_seconds=0.0, upper_seconds=0.1,
            bucket_seconds=bucket,
        ).take_all()
        assert [r["rv"] for r in out] == [1], f"bucket={bucket}"
