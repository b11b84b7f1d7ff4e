"""The flagship KG-construction pipeline (SURVEY.md §4 physical plan).

    read_parquet(pages, columns=[url, html, lang])   # prune at the read
      -> filter(lang)                                 # vectorized
      -> extract_text                                 # stateless mb, byte-pinned
      -> chunk                                        # stateless mb explode
      -> score (actor pool)                           # stateful, batch-sized
      -> assemble                                     # stateless mb
      -> link (groupby band shuffle + broadcast map)  # shuffle #1
      -> dedup (combine + groupby triple_key)         # shuffle #2
      -> sort(subj_id) -> write_parquet + lineage     # shuffle #3

Everything before ``link`` is a straight-line streaming plan: blocks
flow with backpressure, nothing materializes the corpus. The driver
never iterates rows; the only driver-side state is the verified LSH
edge list (see ``stages/link.py``).
"""

from __future__ import annotations

import os
import time

import ray
import ray.data

from ..hashing import stable_hash64
from ..stages.assemble import assemble_batch, entities_batch
from ..stages.chunk import chunk_pages_batch
from ..stages.dedup import dedup_triples
from ..stages.extract import extract_batch, filter_lang_batch
from ..stages.link import link_triples
from ..stages.score import JointScorer, score_chunks_task
from ..state.lineage import append_manifest, read_manifest

DEFAULT_SCORER_BATCH = 64


@ray.remote(num_cpus=0)
class _ShardCounters:
    """Side-aggregate lineage counters for one shard run.

    Kernels report per-batch counts keyed by a content fingerprint
    (first url, last url, row count), so a retried task that re-sends
    the same batch overwrites rather than double-counts — counts stay
    exact under Ray's task retry semantics.
    """

    def __init__(self) -> None:
        self._pages: dict[int, tuple[int, int]] = {}
        self._chunks: dict[int, int] = {}

    def record_pages(self, key: int, healthy: int, quarantined: int) -> None:
        self._pages[key] = (healthy, quarantined)

    def record_chunks(self, key: int, n: int) -> None:
        self._chunks[key] = n

    def snapshot(self) -> tuple[int, dict]:
        return len(self._pages) + len(self._chunks), {
            "n_pages": sum(h for h, _ in self._pages.values()),
            "n_quarantined_pages": sum(q for _, q in self._pages.values()),
            "n_chunks": sum(self._chunks.values()),
        }


# settled reads of _ShardCounters reuse state/caps.cap_totals — the
# snapshot() contract (n_records, totals) is shared by design, so the
# settle-poll logic lives in exactly one place


def _batch_fingerprint(batch, col: str) -> int:
    # hash of the FULL ordered key column — (first, last, count) would
    # collide on re-crawl-heavy shards (two blocks bounded by the same
    # hot url), and a collision silently overwrites one block's counts
    # in the idempotent counter actor
    vals = batch.column(col).to_pylist()
    return stable_hash64("batchfp", batch.num_rows, "\x1f".join(
        "" if v is None else str(v) for v in vals
    ))


def _cluster_cpus() -> int:
    try:
        return max(1, int(ray.cluster_resources().get("CPU", 4)))
    except Exception:
        return 4


def default_scorer_concurrency() -> int:
    """Fixed-size actor pool sized to the cluster: the scorer is the
    CPU-bound bottleneck stage, so it gets most of the cores (fixed, not
    autoscaling — ramp-up latency would starve the pipeline on short
    runs; on a long run the two are equivalent)."""
    return max(2, _cluster_cpus() - 2)


def read_pages(pages_path: str, *, shard_filter=None) -> ray.data.Dataset:
    # a small-scale corpus arrives as one parquet file -> force enough
    # read blocks that every downstream stage can run wide; at real
    # scale the file count itself provides this
    ds = ray.data.read_parquet(
        pages_path,
        columns=["url", "html", "lang"],
        # ~6 blocks per core: enough waves that the last one's stragglers
        # cost little (measured ~7% at 16 cpus vs 2 blocks/core), still
        # few enough that task overhead stays negligible
        override_num_blocks=_cluster_cpus() * 6,
    )
    if shard_filter is not None:
        ds = ds.map_batches(shard_filter, batch_format="pyarrow")
    return ds


def extracted_pages(
    pages: ray.data.Dataset, lang: str = "ja", decode_errors: str = "strict"
) -> ray.data.Dataset:
    import functools

    return pages.map_batches(
        lambda b: filter_lang_batch(b, lang), batch_format="pyarrow"
    ).map_batches(
        functools.partial(extract_batch, decode_errors=decode_errors),
        batch_format="pyarrow",
    )


def chunk_pages(
    extracted: ray.data.Dataset,
    len_limit: int | None = None,
    analyzer: str = "mecab",
) -> ray.data.Dataset:
    from ..stages.chunk import DEFAULT_LEN_LIMIT
    from ..stages.extract import healthy_batch

    limit = len_limit or DEFAULT_LEN_LIMIT

    def kernel(b):
        if "error" in b.column_names:  # drop quarantined pages explicitly
            b = healthy_batch(b)
        return chunk_pages_batch(b, limit, analyzer)

    return extracted.map_batches(kernel, batch_format="pyarrow")


def score_chunks(
    chunks: ray.data.Dataset,
    *,
    concurrency: int | None = None,
    batch_size: int = DEFAULT_SCORER_BATCH,
    model_cost_layers: int = 0,
    use_actors: bool = False,
    model="mock",
    hf_kwargs: dict | None = None,
    analyzer: str = "mecab",
) -> ray.data.Dataset:
    """Scoring stage, two physical shapes:

    - tasks (default for the mock): per-worker singleton model, fuses
      with the surrounding stateless stages, zero per-job pool startup;
    - actor pool (``use_actors=True``, forced for non-mock backends):
      the shape a real transformer needs (heavy weights / GPUs) —
      ``__init__`` loads once per actor.

    ``model`` selects the backend (see ``JointScorer.__init__``):
    "mock", "hf:<checkpoint_dir>", or a predict()-bearing object.
    """
    if use_actors or model != "mock":
        return chunks.map_batches(
            JointScorer,
            fn_constructor_kwargs={
                "model_cost_layers": model_cost_layers,
                "model": model,
                "hf_kwargs": hf_kwargs,
                "analyzer": analyzer,
            },
            concurrency=concurrency or default_scorer_concurrency(),
            batch_size=batch_size,
            batch_format="pyarrow",
        )
    import functools

    return chunks.map_batches(
        functools.partial(
            score_chunks_task,
            model_cost_layers=model_cost_layers,
            analyzer=analyzer,
        ),
        batch_size=batch_size,
        batch_format="pyarrow",
    )


def build_triples(
    pages_path: str,
    *,
    lang: str = "ja",
    concurrency: int | None = None,
    batch_size: int = DEFAULT_SCORER_BATCH,
    shard_filter=None,
    model_cost_layers: int = 0,
    mode: str = "joint",
    len_limit: int | None = None,
    use_actors: bool = False,
    model="mock",
    hf_kwargs: dict | None = None,
    analyzer: str = "mecab",
    decode_errors: str = "strict",
) -> ray.data.Dataset:
    """pages parquet -> raw mention-level triples Dataset (streaming).

    ``mode="joint"`` (default, the reference's production path) or
    ``mode="pipeline"`` (the legacy 3-stage NER -> modality -> relation
    architecture; see ``stages/pipeline_mode.py``).

    ``analyzer`` selects the registered morphological analyzer (the
    reference's juman|mecab choice, utils.py:30-42) for chunking AND
    scoring — the two must agree; ``decode_errors`` selects strict vs
    lossy utf-8 at extraction (see ``stages/extract.py``).
    """
    if mode == "pipeline" and (model != "mock" or hf_kwargs or use_actors):
        # the 3-stage pipeline scorer has no pluggable-model seam: a
        # caller handing it a trained backend must hear that BEFORE any
        # read starts, not get mock-model triples with no error
        raise ValueError(
            "build_triples: mode='pipeline' supports only the mock "
            "3-stage scorer (model/hf_kwargs/use_actors don't apply) "
            "— use mode='joint' for pluggable backends"
        )
    pages = read_pages(pages_path, shard_filter=shard_filter)
    chunks = chunk_pages(
        extracted_pages(pages, lang, decode_errors=decode_errors),
        len_limit=len_limit,
        analyzer=analyzer,
    )
    if mode == "pipeline":
        from ..stages.pipeline_mode import score_chunks_pipeline

        tagged = score_chunks_pipeline(chunks)
    else:
        tagged = score_chunks(
            chunks,
            concurrency=concurrency,
            batch_size=batch_size,
            model_cost_layers=model_cost_layers,
            use_actors=use_actors,
            model=model,
            hf_kwargs=hf_kwargs,
            analyzer=analyzer,
        )
    return tagged.map_batches(assemble_batch, batch_format="pyarrow")


def build_entities(pages_path: str, *, lang: str = "ja") -> ray.data.Dataset:
    """pages parquet -> entity-mention rows (the mod_entities view)."""
    pages = read_pages(pages_path)
    chunks = chunk_pages(extracted_pages(pages, lang))
    tagged = score_chunks(chunks)
    return tagged.map_batches(entities_batch, batch_format="pyarrow")


def build_graph(
    pages_path: str,
    *,
    lang: str = "ja",
    concurrency: int | None = None,
    batch_size: int = DEFAULT_SCORER_BATCH,
    model_cost_layers: int = 0,
    mode: str = "joint",
    len_limit: int | None = None,
    use_actors: bool = False,
    link_threshold: float | None = None,
) -> ray.data.Dataset:
    """Full pipeline through linking + dedup (unsorted; see materialize)."""
    from ..stages.link import DEFAULT_THRESHOLD

    triples = build_triples(
        pages_path,
        lang=lang,
        concurrency=concurrency,
        batch_size=batch_size,
        model_cost_layers=model_cost_layers,
        mode=mode,
        len_limit=len_limit,
        use_actors=use_actors,
    )
    linked = link_triples(triples, threshold=link_threshold or DEFAULT_THRESHOLD)
    return dedup_triples(linked)


def materialize_graph(
    pages_path: str,
    out_dir: str,
    *,
    lang: str = "ja",
    n_shards: int = 8,
    concurrency: int | None = None,
    batch_size: int = DEFAULT_SCORER_BATCH,
    analyzer: str = "mecab",
    decode_errors: str = "strict",
    _fail_after_checkpoint: int | None = None,
) -> dict:
    """Resumable sorted graph materialize (north rule's final write).

    Two levels:

    1. **Heavy, resumable — at SUB-shard granularity**: the input is
       split into ``n_shards`` shards; each unfinished shard runs
       extract->score->assemble, CHECKPOINTS the assembled triples to
       ``out_dir/shard=N.triples/`` (completion marker
       ``_SCORED.json``, carrying the shard's page/chunk lineage
       totals), then runs link->dedup FROM THE CHECKPOINT and writes
       ``out_dir/shard=N/`` plus a lineage record. A rerun reads the
       manifest and skips finished shards; an UNFINISHED shard whose
       score checkpoint exists resumes at link — the expensive scoring
       compute (hours per shard at 100 TB) is never repeated even when
       the kill lands mid-shard. Checkpoints are deleted once their
       shard's manifest record lands (and lazily for already-done
       shards).

       Shard assignment prefers **file-level pruning**: with a
       multi-file input (the real 100 TB layout), shard N reads only
       its own files — no full-corpus rescan per shard. A single-file
       input (small-scale fixtures) falls back to a ``hash(url)``
       row filter, which does rescan and is flagged in lineage.
    2. **Cheap, idempotent finalize**: a global **re-link** over the
       shard outputs (per-shard linking can assign the same surface
       different canonical ids depending on which cluster members its
       shard saw — the finalize pass rebuilds one global canonical map
       from all shard surfaces so identical logical triples share ids)
       followed by dedup + ``sort`` on (subj_id, pred, obj_id) and the
       write of ``out_dir/graph/``. The relink input is the already
       per-shard-deduplicated rows — tiny relative to the corpus.

    Returns the run summary (shards run/skipped, rows, wall time).
    """
    import pyarrow as pa

    done = read_manifest(out_dir)
    # resume guard: a rerun with a different n_shards (or input) would
    # skip manifest shards from the OLD partitioning and finalize over
    # range(new n_shards) only — silently dropping the other shards'
    # triples from the final graph. Every recorded fingerprint embeds
    # "<pages_path>#...[shard/n_shards]..."; refuse any mismatch.
    for s, rec in sorted(done.items()):
        fp = rec.get("input_fingerprint", "")
        if not fp.startswith(f"{pages_path}#") or f"[{s}/{n_shards}]" not in fp:
            raise ValueError(
                f"materialize_graph: manifest shard {s} was produced by a "
                f"different run configuration ({fp!r}) — this run has "
                f"pages_path={pages_path!r}, n_shards={n_shards}. Resume "
                "with the ORIGINAL parameters or start a fresh out_dir."
            )
    summary = {"shards_total": n_shards, "shards_skipped": len(done), "shards_run": 0}

    input_files = _input_parquet_files(pages_path)
    by_files = len(input_files) >= n_shards

    import json
    import shutil

    for shard in range(n_shards):
        ck_dir = f"{out_dir}/shard={shard}.triples"
        ck_marker = os.path.join(ck_dir, "_SCORED.json")
        if shard in done:
            # lazy cleanup: a crash between manifest append and
            # checkpoint delete can leave an orphan checkpoint behind
            shutil.rmtree(ck_dir, ignore_errors=True)
            continue
        t0 = time.time()

        if by_files:
            shard_input = [
                f for i, f in enumerate(input_files) if i % n_shards == shard
            ]
            shard_filter = None
            fingerprint = f"files[{shard}/{n_shards}]:{len(shard_input)}"
        else:
            shard_input = pages_path

            def shard_filter(batch, _shard=shard):
                urls = batch.column("url").to_pylist()
                mask = pa.array(
                    [stable_hash64("shard", u) % n_shards == _shard for u in urls]
                )
                return batch.filter(mask)

            fingerprint = f"urlhash[{shard}/{n_shards}] (single-file rescan)"

        from ..state.caps import cap_totals, new_cap_counters

        if os.path.exists(ck_marker):
            # mid-shard resume: the expensive half (extract -> score ->
            # assemble) already ran to completion — its output and its
            # page/chunk lineage totals are on disk; go straight to link
            with open(ck_marker, encoding="utf-8") as f:
                totals = json.load(f)["totals"]
        else:
            # lineage counters ride the ONE shard pipeline as side
            # aggregates (VERDICT r1 item 7: no extra corpus passes) —
            # the taps report per-batch counts to a zero-cpu actor with
            # idempotency keys, FIRE-AND-FORGET (the hot path never
            # blocks on an actor round trip; retried tasks overwrite
            # their own keys, so totals stay exact)
            counters = _ShardCounters.remote()

            def tap_pages(b):
                import pyarrow.compute as _pc

                q = _pc.sum(_pc.not_equal(b.column("error"), "")).as_py() or 0
                counters.record_pages.remote(
                    _batch_fingerprint(b, "url"), b.num_rows - q, q
                )
                return b

            def tap_chunks(b):
                key = stable_hash64(
                    _batch_fingerprint(b, "url"),
                    b.column("chunk_id")[0].as_py() if b.num_rows else -1,
                    b.column("chunk_id")[-1].as_py() if b.num_rows else -1,
                )
                counters.record_chunks.remote(key, b.num_rows)
                return b

            pages = read_pages(shard_input, shard_filter=shard_filter)
            extracted = extracted_pages(
                pages, lang, decode_errors=decode_errors
            ).map_batches(tap_pages, batch_format="pyarrow")
            chunks = chunk_pages(extracted, analyzer=analyzer).map_batches(
                tap_chunks, batch_format="pyarrow"
            )
            tagged = score_chunks(
                chunks,
                concurrency=concurrency,
                batch_size=batch_size,
                analyzer=analyzer,
            )
            triples = tagged.map_batches(assemble_batch, batch_format="pyarrow")
            # score checkpoint: the reduced triples land on disk BEFORE
            # link/dedup; the _SCORED.json marker (written atomically,
            # AFTER the parquet) makes the checkpoint all-or-nothing —
            # a kill mid-write leaves no marker and scoring reruns
            os.makedirs(ck_dir, exist_ok=True)
            for stale in _parquet_files(ck_dir):
                os.unlink(stale)
            triples.write_parquet(ck_dir)
            totals = cap_totals(counters)  # settled read (state/caps.py)
            tmp = os.path.join(ck_dir, ".scored-tmp")
            with open(tmp, "w", encoding="utf-8") as f:
                json.dump({"totals": {k: int(v) for k, v in totals.items()}}, f)
            os.replace(tmp, ck_marker)
            if _fail_after_checkpoint == shard:
                raise RuntimeError(
                    f"injected kill after score checkpoint of shard {shard}"
                )

        # blocking-cap observability (no-silent-caps rule): hot-band
        # truncations inside the linker are counted per shard and land
        # in the lineage record below
        caps = new_cap_counters()
        shard_dir = f"{out_dir}/shard={shard}"
        os.makedirs(shard_dir, exist_ok=True)
        # resume crash window: a prior run may have died after writing
        # parquet but before its manifest append — the shard is not in
        # the manifest, so clear any orphan files or the finalize pass
        # would read both copies and double-count provenance
        for stale in _parquet_files(shard_dir):
            os.unlink(stale)
        ck_files = _parquet_files(ck_dir)
        if ck_files:
            # link/dedup consume the checkpoint (link reads it twice —
            # a disk-backed source, so no in-memory materialize needed)
            linked = link_triples(
                ray.data.read_parquet(ck_files),
                cap_counters=caps,
                cache_input=False,
            )
            dedup_triples(linked).write_parquet(shard_dir)
        n_triples = _count_parquet_rows(shard_dir)
        truncations = cap_totals(caps)
        append_manifest(
            out_dir,
            {
                "shard": shard,
                "n_pages": int(totals["n_pages"]),
                "n_chunks": int(totals["n_chunks"]),
                "n_triples": int(n_triples),
                "n_quarantined_pages": int(totals["n_quarantined_pages"]),
                # dropped-candidate counts from capped blocking kernels
                # (0s mean no recall was lost to caps this shard);
                # best-effort observability — see state/caps.py: a
                # worker dying post-task pre-flush can undercount
                "n_truncated_candidates": {
                    k: int(v) for k, v in sorted(truncations.items())
                },
                "input_fingerprint": f"{pages_path}#{fingerprint}",
                "wall_time_s": round(time.time() - t0, 3),
            },
        )
        # the manifest record is durable — the checkpoint served its
        # purpose and the finalize pass must not re-read it
        shutil.rmtree(ck_dir, ignore_errors=True)
        summary["shards_run"] += 1

    # finalize: global dedup + sorted write (idempotent)
    shard_files = [
        f
        for s in range(n_shards)
        for f in _parquet_files(f"{out_dir}/shard={s}")
    ]
    graph_dir = f"{out_dir}/graph"
    os.makedirs(graph_dir, exist_ok=True)
    for stale in _parquet_files(graph_dir):  # finalize is a full rewrite
        os.unlink(stale)
    if shard_files:
        all_shards = ray.data.read_parquet(shard_files)
        # strip the per-shard ids, rebuild them against a GLOBAL
        # canonical map (see docstring point 2)
        stripped = all_shards.map_batches(
            lambda b: b.drop_columns(["subj_id", "obj_id"]),
            batch_format="pyarrow",
        )
        relinked = link_triples(stripped)
        final = dedup_triples(relinked).sort(["subj_id", "pred", "obj_id"])
        final.write_parquet(graph_dir)
    summary["n_triples"] = _count_parquet_rows(graph_dir)
    return summary


def _input_parquet_files(pages_path) -> list[str]:
    """Enumerate the concrete parquet files behind an input path."""
    if isinstance(pages_path, (list, tuple)):
        return [f for p in pages_path for f in _input_parquet_files(p)]
    if os.path.isdir(pages_path):
        return _parquet_files(pages_path)
    return [pages_path] if str(pages_path).endswith(".parquet") else []


def _parquet_files(d: str) -> list[str]:
    if not os.path.isdir(d):
        return []
    return sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
    )


def _count_parquet_rows(d: str) -> int:
    import pyarrow.parquet as pq

    return sum(pq.read_metadata(f).num_rows for f in _parquet_files(d))
