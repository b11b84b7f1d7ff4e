"""Observable truncation counters for capped blocking kernels.

The banded/bucketed candidate generators (minhash near-dup, simhash,
embedding near-dup, entity-link bands) bound their quadratic verifies
with a deterministic per-group cap. The cap is a *recall* dial — at
scale, bucket occupancy beyond the cap means silently dropped candidate
pairs. Per the no-silent-caps rule, kernels report every truncation to
a zero-cpu side actor so a recall-losing run is visible in lineage /
run summaries instead of invisible.

Reports are **fire-and-forget** actor calls keyed by (counter, group
key): a retried task re-sends the same key and overwrites rather than
double-counts, so totals stay exact under Ray's task retry semantics.
Because the sends are async, :func:`cap_totals` settles — it polls the
actor until the record count is stable across two reads. The totals are
therefore **best-effort observability, not accounting**: a stable poll
cannot prove delivery of every send (a message can still be in flight
from a task that just finished, and a worker that dies *after* its task
succeeded but *before* flushing its queued actor call loses that
record). Nothing correctness-bearing may read these counters — they
exist to make recall-losing truncation visible, and an undercount of a
few blocks in a manifest is acceptable where a silent cap is not.
Callers that need exact delivery must make the send synchronous
(``ray.get`` the record inside the kernel) and pay the per-block RTT.
"""

from __future__ import annotations

import time

import ray


@ray.remote(num_cpus=0)
class CapCounters:
    """Side-aggregate of per-group truncation counts (idempotent keys)."""

    def __init__(self) -> None:
        self._recs: dict[tuple[str, int], int] = {}

    def record(self, counter: str, key: int, n: int) -> None:
        self._recs[(counter, key)] = n

    def snapshot(self) -> tuple[int, dict[str, int]]:
        totals: dict[str, int] = {}
        for (counter, _), n in self._recs.items():
            totals[counter] = totals.get(counter, 0) + n
        return len(self._recs), totals


def new_cap_counters():
    """A fresh counter actor for one run (pass as ``cap_counters=``)."""
    return CapCounters.remote()


def cap_totals(handle, settle_s: float = 0.05, timeout_s: float = 5.0) -> dict[str, int]:
    """Read settled totals: poll until the record count is unchanged
    across two reads ``settle_s`` apart (bounded by ``timeout_s``)."""
    deadline = time.monotonic() + timeout_s
    n_prev, totals = ray.get(handle.snapshot.remote())
    while time.monotonic() < deadline:
        time.sleep(settle_s)
        n, totals = ray.get(handle.snapshot.remote())
        if n == n_prev:
            break
        n_prev = n
    return totals
