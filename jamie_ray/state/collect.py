"""Guard-railed driver-side collection of verified edge lists.

The linking and near-dup cluster stages collect only *verified edges*
to the driver (pairs that survived exact verification inside a blocked
group) — tiny relative to the corpus while LSH precision holds. If a
pathological corpus (e.g. boilerplate-dominated pages that all verify
against each other) makes the edge list explode, the driver must fail
LOUDLY with a count, not OOM: these helpers stream batches with a hard
cap instead of ``take_all()``-materializing first.
"""

from __future__ import annotations

# ~5M edges of two short strings each is low-hundreds of MB on the
# driver — far inside headroom, far outside anything a healthy corpus
# produces (edges scale with true duplicate mass, not corpus size)
DEFAULT_EDGE_CAP = 5_000_000


class EdgeCapExceeded(RuntimeError):
    """Raised when a guarded driver-side collection passes its cap —
    catch THIS (not bare RuntimeError) to fall back gracefully."""


def iter_capped_batches(ds, cap: int = DEFAULT_EDGE_CAP, context: str = "edge list"):
    """Yield pyarrow batches of ``ds``, raising once ``cap`` rows pass.

    Streaming (``iter_batches``) rather than ``take_all``: the failure
    fires before the driver holds the whole list, and healthy runs never
    materialize more than a batch at a time outside the caller's set.
    """
    n = 0
    for batch in ds.iter_batches(batch_format="pyarrow"):
        n += batch.num_rows
        if n > cap:
            raise EdgeCapExceeded(
                f"{context}: driver-side collection exceeded its cap "
                f"({n} rows > {cap}). A pathological corpus is producing "
                "too many verified edges for driver memory — tighten the "
                "blocking threshold/banding or raise the cap explicitly "
                "(edge_cap=...) if the corpus genuinely has this much "
                "duplicate mass."
            )
        yield batch
