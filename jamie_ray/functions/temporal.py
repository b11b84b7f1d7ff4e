"""Custom temporal operators Ray Data lacks natively (brief: "as-of
join, range join, windowed aggregate").

Both operators follow the documented composition rule: express the
semantics as ``union(side-tagged) -> groupby(key) -> map_groups`` so the
only data movement is ONE hash shuffle on the join/partition key, and
each group's logic is a vectorized in-memory merge.

Partitioning assumption (documented per the custom-operator rule): all
rows of one key fit in one group worker. For web-scale event streams
that holds after salting by (key, time-bucket); the pure-key variant
here matches the oracle semantics exactly.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pyarrow as pa

_NAIVE_EPOCH = _dt.datetime(1970, 1, 1)


def _naive_seconds(t) -> float:
    """Naive-datetime -> seconds since a naive epoch.

    NOT ``datetime.timestamp()``: that interprets naive datetimes in the
    host's local timezone and is non-monotonic across DST transitions,
    which would diverge from DuckDB's timezone-free interval arithmetic
    on non-UTC hosts.
    """
    if isinstance(t, _dt.datetime):
        return (t - _NAIVE_EPOCH).total_seconds()
    return float(t)


def asof_join(
    left,
    right,
    *,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
):
    """As-of join: for each left row, the right row with the same key and
    the greatest ``right_ts <= left_ts`` (DuckDB ``ASOF JOIN``
    semantics; inner — left rows with no match are dropped). Ties on
    ``right_ts`` resolve to the greatest value of the first attached
    column — deterministic and mirrored in the oracle.
    """

    def tag(side: int, key: str, ts: str, cols: list[str]):
        def fn(batch: pa.Table) -> pa.Table:
            out = {
                "__key": batch.column(key),
                "__ts": batch.column(ts),
                "__side": pa.array([side] * batch.num_rows, pa.int8()),
            }
            for c in cols:
                out[c] = batch.column(c)
            return pa.table(out)

        return fn

    left_cols = [c for c in left.schema().names if c not in (left_key,)]
    lt = left.map_batches(
        tag(0, left_key, left_ts, left_cols), batch_format="pyarrow"
    )
    rt = right.map_batches(
        tag(1, right_key, right_ts, right_cols), batch_format="pyarrow"
    )
    # union of two different schemas is not allowed -> pad each side
    # with the other's columns as nulls
    def pad(missing: list[str], types: dict):
        def fn(batch: pa.Table) -> pa.Table:
            for c in missing:
                batch = batch.append_column(
                    c, pa.nulls(batch.num_rows, types[c])
                )
            return batch

        return fn

    l_schema = {f.name: f.type for f in lt.schema().base_schema}
    r_schema = {f.name: f.type for f in rt.schema().base_schema}
    lt = lt.map_batches(
        pad([c for c in r_schema if c not in l_schema], r_schema),
        batch_format="pyarrow",
    )
    rt = rt.map_batches(
        pad([c for c in l_schema if c not in r_schema], l_schema),
        batch_format="pyarrow",
    )
    all_cols = sorted(set(l_schema) | set(r_schema))
    lt = lt.map_batches(lambda b: b.select(all_cols), batch_format="pyarrow")
    rt = rt.map_batches(lambda b: b.select(all_cols), batch_format="pyarrow")

    def merge(group: pa.Table) -> pa.Table:
        sides = np.asarray(group.column("__side").to_pylist())
        ts = np.asarray(
            [_naive_seconds(t) for t in group.column("__ts").to_pylist()],
            dtype=np.float64,
        )
        l_ix = np.where(sides == 0)[0]
        r_ix = np.where(sides == 1)[0]
        if not len(l_ix) or not len(r_ix):
            return group.slice(0, 0).drop_columns(["__side"])
        # right side sorted by (ts, first right col) so the backward
        # search and the tie rule are deterministic
        r_first = group.column(right_cols[0]).take(pa.array(r_ix)).to_pylist()
        r_order = sorted(range(len(r_ix)), key=lambda i: (ts[r_ix[i]], r_first[i]))
        r_sorted = r_ix[r_order]
        r_ts_sorted = ts[r_sorted]
        pos = np.searchsorted(r_ts_sorted, ts[l_ix], side="right") - 1
        keep = pos >= 0
        l_keep = l_ix[keep]
        match = r_sorted[pos[keep]]
        out: dict[str, pa.Array] = {}
        for c in group.column_names:
            if c == "__side":
                continue
            col = group.column(c)
            src = match if c in right_cols else l_keep
            out[c] = col.take(pa.array(src))
        return pa.table(out)

    unioned = lt.union(rt)
    return unioned.groupby("__key").map_groups(merge, batch_format="pyarrow")


def sessionize(
    events,
    *,
    key: str = "user_id",
    ts: str = "ts",
    gap_minutes: int = 30,
):
    """Gap-based sessionization: within each key, a new session starts
    when the time since the previous event exceeds ``gap_minutes``.
    Emits every event row + ``session_id`` (0-based per key, in time
    order; ties keep stable event order by event_id).
    """

    def sessions(group: pa.Table) -> pa.Table:
        tss = np.asarray(
            [_naive_seconds(t) for t in group.column(ts).to_pylist()],
            dtype=np.float64,
        )
        eids = np.asarray(group.column("event_id").to_pylist())
        order = np.lexsort((eids, tss))
        gaps = np.diff(tss[order]) > gap_minutes * 60
        session_of_sorted = np.concatenate(([0], np.cumsum(gaps)))
        session = np.empty(len(order), dtype=np.int64)
        session[order] = session_of_sorted
        return group.append_column("session_id", pa.array(session, pa.int64()))

    return events.groupby(key).map_groups(sessions, batch_format="pyarrow")


def range_join(
    left,
    right,
    *,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    lower_seconds: float,
    upper_seconds: float,
):
    """Range (interval) join: every (left, right) pair with matching key
    and ``right_ts`` in ``[left_ts + lower, left_ts + upper]`` seconds.

    Same physical shape as :func:`asof_join` (one hash shuffle on the
    key, vectorized per-group window scan via searchsorted); emits one
    row per qualifying pair (inner join).
    """

    def tag(side: int, key: str, ts: str, cols: list[str]):
        def fn(batch: pa.Table) -> pa.Table:
            out = {
                "__key": batch.column(key),
                "__ts": batch.column(ts),
                "__side": pa.array([side] * batch.num_rows, pa.int8()),
            }
            for c in cols:
                out[c] = batch.column(c)
            return pa.table(out)

        return fn

    left_cols = [c for c in left.schema().names if c != left_key]
    lt = left.map_batches(tag(0, left_key, left_ts, left_cols), batch_format="pyarrow")
    rt = right.map_batches(tag(1, right_key, right_ts, right_cols), batch_format="pyarrow")

    def pad(missing: list[str], types: dict):
        def fn(batch: pa.Table) -> pa.Table:
            for c in missing:
                batch = batch.append_column(c, pa.nulls(batch.num_rows, types[c]))
            return batch

        return fn

    l_schema = {f.name: f.type for f in lt.schema().base_schema}
    r_schema = {f.name: f.type for f in rt.schema().base_schema}
    lt = lt.map_batches(pad([c for c in r_schema if c not in l_schema], r_schema),
                        batch_format="pyarrow")
    rt = rt.map_batches(pad([c for c in l_schema if c not in r_schema], l_schema),
                        batch_format="pyarrow")
    all_cols = sorted(set(l_schema) | set(r_schema))
    lt = lt.map_batches(lambda b: b.select(all_cols), batch_format="pyarrow")
    rt = rt.map_batches(lambda b: b.select(all_cols), batch_format="pyarrow")

    def merge(group: pa.Table) -> pa.Table:
        sides = np.asarray(group.column("__side").to_pylist())
        ts = np.asarray(
            [_naive_seconds(t) for t in group.column("__ts").to_pylist()],
            dtype=np.float64,
        )
        l_ix = np.where(sides == 0)[0]
        r_ix = np.where(sides == 1)[0]
        if not len(l_ix) or not len(r_ix):
            return group.slice(0, 0).drop_columns(["__side"])
        r_order = np.argsort(ts[r_ix], kind="stable")
        r_sorted = r_ix[r_order]
        r_ts_sorted = ts[r_sorted]
        lo = np.searchsorted(r_ts_sorted, ts[l_ix] + lower_seconds, side="left")
        hi = np.searchsorted(r_ts_sorted, ts[l_ix] + upper_seconds, side="right")
        l_out: list[int] = []
        r_out: list[int] = []
        for li, a, b in zip(l_ix, lo, hi):
            for j in range(a, b):
                l_out.append(li)
                r_out.append(r_sorted[j])
        l_idx = pa.array(np.asarray(l_out, dtype=np.int64))
        r_idx = pa.array(np.asarray(r_out, dtype=np.int64))
        out: dict[str, pa.Array] = {}
        for c in group.column_names:
            if c == "__side":
                continue
            col = group.column(c)
            out[c] = col.take(r_idx if c in right_cols else l_idx)
        return pa.table(out)

    return lt.union(rt).groupby("__key").map_groups(merge, batch_format="pyarrow")
