"""Persisted IVF+PQ vector index: build once, query many.

The per-query paths (``pq.ivfpq_topk``) rebuild assignments and codes from
the raw embeddings each run — right for tests, wrong for a deployment. A
100 TB corpus builds its index ONCE and stores three tables, exactly like
the materialized BM25 inverted index (``search.build_bm25_index``):

- ``centroids/``  (c_id, c_embedding)            — k rows, broadcastable
- ``codebooks/``  (sub, code, sv)                — m*k rows, broadcastable
- ``codes/``      (vec_id, pq_codes) PARTITIONED BY cell — 1 byte/subspace
  per vector plus the cell key; the ONLY corpus-scale table

Partitioning ``codes/`` by cell makes the coarse-quantizer pruning a
*partition filter*: probing ``n_probe`` of ``k`` cells reads ``n_probe/k``
of the index files — the scan never touches unprobed cells' bytes
(asserted in tests/test_pq.py). Queries answer from the index alone; the
raw vectors are never read again.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class IvfPqIndex:
    centroids: DataFrame
    codebooks: DataFrame
    codes: DataFrame  # (vec_id, pq_codes, cell) — cell is the partition key
    m: int
    dim: int
    residual: bool = False  # codes quantize x - centroid[cell] (IVFADC)
    rotation: list | None = None  # OPQ rotation the codes were built under


def build_ivfpq_index(
    emb: DataFrame,
    centroids: DataFrame,
    codebooks: DataFrame,
    out_dir: str,
    m: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroid_id: str = "c_id",
    centroid_vec: str = "c_embedding",
    residual: bool = False,
    rotation: list | None = None,
) -> None:
    """One corpus pass: assign each vector's coarse cell (broadcast
    centroids, vectorized matmul) and its PQ codes (broadcast codebooks,
    matmul+argmin per Arrow batch), then write ``codes/`` partitioned by
    cell. Centroids and codebooks persist alongside so queries need ONLY
    ``out_dir``.

    ``residual=True`` stores FAISS-IVFADC codes (quantize
    ``x - centroid[cell]``; pass codebooks TRAINED on residuals —
    ``pq.residual_table`` -> ``pq.pq_train``) and records the mode in
    ``_meta.json`` so :func:`load_ivfpq_index` routes queries to the
    residual scorer automatically — an index can never be silently read
    under the wrong decoding."""
    import json

    from vectordb_data_ingestion_spark.operators.pq import (
        pq_encode_residual_vectorized,
        pq_encode_vectorized,
    )
    from vectordb_data_ingestion_spark.operators.similarity import (
        assign_ivf_cells_vectorized,
    )

    if residual:
        codes = pq_encode_residual_vectorized(
            emb, centroids, codebooks, m, dim, vec_col=vec_col,
            id_col=id_col, centroid_id=centroid_id,
            centroid_vec=centroid_vec, rotation=rotation,
        )
    elif rotation is not None:
        raise ValueError(
            "rotation requires residual=True here: the direct encoder "
            "would need rotated CENTROID pruning too — compose OPQ with "
            "the residual (IVFADC) form, where probing stays in the "
            "original space"
        )
    else:
        assigned = assign_ivf_cells_vectorized(
            emb, centroids, vec_col=vec_col, centroid_id=centroid_id,
            centroid_vec=centroid_vec, id_col=id_col,
        )
        encoded = pq_encode_vectorized(
            emb, codebooks, m, dim, vec_col=vec_col, id_col=id_col
        )
        codes = encoded.join(assigned.select(id_col, "cell"), id_col)
    # mode metadata lands BEFORE any data: a crash after codes/centroids/
    # codebooks but before a trailing meta write used to leave a
    # residual-encoded index that loaded as legacy-direct and decoded
    # under the wrong scheme silently. Meta-first plus a final completion
    # marker makes every partial build fail LOUDLY at load time instead.
    os.makedirs(out_dir, exist_ok=True)
    success_marker = os.path.join(out_dir, "_INDEX_SUCCESS")
    if os.path.exists(success_marker):
        os.remove(success_marker)  # a rebuild in place is incomplete again
    with open(os.path.join(out_dir, "_meta.json"), "w") as fh:
        json.dump(
            {
                # protocol 2 = "this build writes _INDEX_SUCCESS last";
                # the load gate requires the marker ONLY for metas that
                # declare it — indexes built by protocol-1 versions of
                # this module (meta written last, no marker ever) stay
                # loadable instead of misreading as crashed builds
                "protocol": 2,
                "residual": bool(residual),
                "m": m,
                "dim": dim,
                "rotation": rotation,
            },
            fh,
        )
        fh.flush()
        os.fsync(fh.fileno())
    # the base build lands under batch=base so streaming appends
    # (batch=<id> subdirs, see foreach_batch_index_append) share one
    # consistent two-level (batch, cell) partition layout
    codes.write.mode("overwrite").partitionBy("cell").parquet(
        os.path.join(out_dir, "codes", "batch=base")
    )
    centroids.write.mode("overwrite").parquet(
        os.path.join(out_dir, "centroids")
    )
    codebooks.write.mode("overwrite").parquet(
        os.path.join(out_dir, "codebooks")
    )
    with open(success_marker, "w") as fh:
        fh.write("complete\n")


def _migrate_legacy_flat_codes(codes_dir: str, force: bool = False) -> bool:
    """Indexes built before the two-level ``(batch, cell)`` layout wrote
    ``codes/cell=N/`` directly; a streaming append adding ``batch=<id>``
    subdirs next to them would leave mixed partition depths that Spark's
    partition discovery rejects. Detect the flat layout and move the
    ``cell=`` dirs under ``batch=base/`` (pure renames on the directory
    substrate; an object-store deployment would do the same with a
    listing+copy). Returns True if a migration happened.

    Crash-resumable via an explicit ``_MIGRATING`` marker written BEFORE
    ``batch=base`` is created and removed only after the last rename: a
    prior attempt that died mid-way leaves the marker, so the next
    invocation knows the half-moved state is OURS and finishes the
    renames (each per-dir rename is idempotent: once moved, the root
    entry is gone). Without the marker, a populated ``batch=base`` next
    to root-level ``cell=`` dirs is a rebuilt-over-legacy conflict
    (``build_ivfpq_index`` wrote a fresh ``batch=base`` while stale flat
    ``cell=`` dirs linger) — name collisions OR disjoint cell
    partitionings alike: silently merging stale vectors into the fresh
    index would corrupt queries, so we refuse loudly BEFORE moving
    anything and tell the operator to delete the stale dirs (or pass
    ``force=True`` to merge deliberately). Two concurrent migrators race
    benignly: the marker write and ``exist_ok=True`` mkdir are
    idempotent, and a rename losing the race (the other mover already
    took the dir) is skipped."""
    if not os.path.isdir(codes_dir):
        return False
    entries = os.listdir(codes_dir)
    cells = [e for e in entries if e.startswith("cell=")]
    if not cells:
        # nothing left to move; clear a marker a finished-but-interrupted
        # run may have stranded after its last rename
        marker = os.path.join(codes_dir, "_MIGRATING")
        if os.path.exists(marker):
            os.remove(marker)
        return False
    if any(e.startswith("batch=") and e != "batch=base" for e in entries):
        # genuine streaming batches already coexist with flat cell= dirs:
        # not the legacy layout this migration targets — leave it alone.
        return False
    base = os.path.join(codes_dir, "batch=base")
    marker = os.path.join(codes_dir, "_MIGRATING")
    if os.path.isdir(base) and not os.path.exists(marker) and not force:
        raise RuntimeError(
            "codes dir holds BOTH a populated batch=base and root-level "
            f"legacy cell= dirs ({cells[:3]}"
            f"{'...' if len(cells) > 3 else ''}) with no _MIGRATING "
            "marker: either a rebuilt index with stale flat-layout "
            "leftovers, or a migration interrupted by a pre-marker "
            "version of this code. Refusing to guess — if the root "
            "cell= dirs are stale leftovers from before a rebuild, "
            f"delete them under {codes_dir} (or the whole dir and "
            "rebuild); if they are unmoved cells of the SAME build "
            "(interrupted migration), call with force=True to finish "
            "the merge (it refuses to overwrite any colliding part "
            "file, so same-build resumes are safe)."
        )
    # marker BEFORE base: a crash between the two still resumes cleanly
    with open(marker, "w") as fh:
        fh.write("legacy flat-codes migration in progress\n")
    os.makedirs(base, exist_ok=True)
    for e in entries:
        if e.startswith("cell=") or e == "_SUCCESS":
            src, dst = os.path.join(codes_dir, e), os.path.join(base, e)
            try:
                os.rename(src, dst)
            except FileNotFoundError:
                pass  # a concurrent migrator already moved this entry
            except OSError:
                # dst already exists (deliberate force=True merge onto a
                # rebuilt index with COLLIDING cell names, or a resumed
                # interrupted merge): rename refuses non-empty dir
                # targets, so merge the cell's part files individually.
                # An inner filename collision is NOT resolvable without
                # overwriting data — refuse loudly rather than pick one.
                if not (os.path.isdir(src) and os.path.isdir(dst)):
                    raise
                for part in os.listdir(src):
                    inner_dst = os.path.join(dst, part)
                    if part != "_SUCCESS" and os.path.exists(inner_dst):
                        raise RuntimeError(
                            f"flat-codes merge: {e}/{part} exists in both "
                            "the legacy layout and batch=base — refusing "
                            "to overwrite either copy"
                        )
                    os.replace(os.path.join(src, part), inner_dst)
                os.rmdir(src)
    try:
        os.remove(marker)
    except FileNotFoundError:
        pass  # a concurrent migrator already cleaned up
    return True


def _check_index_complete(out_dir: str, action: str) -> dict | None:
    """Read ``_meta.json`` (None when absent — pre-meta legacy indexes,
    direct mode, stay loadable) and enforce the completion gate: a
    protocol-2 build writes ``_meta.json`` FIRST and ``_INDEX_SUCCESS``
    last, so a protocol-2 meta without the marker is a build that died
    mid-write — fail loudly rather than serve partial codes. Metas that
    do not declare ``protocol >= 2`` are ambiguous: true protocol-1
    builds wrote meta LAST (meta present = data complete), but the
    marker-era window between the meta-first change and the protocol
    stamp ALSO wrote meta first without a protocol field — so a
    no-protocol meta with no marker could be either a complete
    protocol-1 index or a marker-era build that died mid-data-write
    (ADVICE r8). Rather than trust it unconditionally, fall back to a
    secondary discriminator: every complete build of ANY era left Spark
    ``_SUCCESS`` files under codes/centroids/codebooks, while a
    crashed-mid-data marker-era build is missing at least one. Only a
    meta that passes that physical check loads without its marker
    (ADVICE r7 still holds: genuinely complete pre-marker indexes stay
    loadable on upgrade).

    The physical check depends on Spark's ``_SUCCESS`` job markers
    existing: a deployment that strips them
    (``mapreduce.fileoutputcommitter.marksuccessfuljobs=false``, or an
    object-store lifecycle cleaner) would see a genuinely complete
    protocol-1 index refuse to load on upgrade (ADVICE r9). For those,
    ``SPARK_GRAFT_INDEX_ALLOW_LEGACY=1`` (read per call) skips the
    physical fallback and trusts a protocol-less meta the way a true
    protocol-1 reader did — the operator asserts "my markers are
    stripped but my index is complete"; a partial marker-era build then
    loads as truncated data, the pre-r8 behavior, which is why the
    override is opt-in and never the default."""
    import json as _json

    meta_path = os.path.join(out_dir, "_meta.json")
    if not os.path.exists(meta_path):
        return None
    with open(meta_path) as fh:
        meta = _json.load(fh)
    declared = "protocol" in meta
    if not os.path.exists(os.path.join(out_dir, "_INDEX_SUCCESS")):
        if declared and int(meta.get("protocol", 1)) >= 2:
            raise RuntimeError(
                f"ivfpq index at {out_dir} has a protocol-2 _meta.json but "
                "no _INDEX_SUCCESS marker: the build crashed before "
                f"completing — rebuild the index (a partial index must "
                f"not {action})"
            )
        allow_legacy = os.environ.get(
            "SPARK_GRAFT_INDEX_ALLOW_LEGACY", ""
        ) == "1"
        if not declared and not allow_legacy and not _data_dirs_complete(
            out_dir
        ):
            raise RuntimeError(
                f"ivfpq index at {out_dir} has a _meta.json with no "
                "protocol field, no _INDEX_SUCCESS marker, and incomplete "
                "data tables (missing Spark _SUCCESS under codes/, "
                "centroids/ or codebooks/): this is a meta-first build "
                "that crashed before its data finished writing — rebuild "
                f"the index (a partial index must not {action}). NOTE: "
                "this completeness check relies on Spark _SUCCESS job "
                "markers; if this deployment strips them (mapreduce."
                "fileoutputcommitter.marksuccessfuljobs=false or a "
                "lifecycle cleaner) and the index is known complete, set "
                "SPARK_GRAFT_INDEX_ALLOW_LEGACY=1 to load it anyway"
            )
    return meta


def _data_dirs_complete(out_dir: str) -> bool:
    """Physical completeness check for indexes whose meta predates the
    protocol stamp: Spark stamps ``_SUCCESS`` at the root of every
    completed write, so a finished build of any era has one under
    ``centroids/``, ``codebooks/`` and ``codes/`` (at the codes root for
    the legacy flat layout, else inside every ``batch=*`` subdir — the
    flat-layout migration moves the root marker into ``batch=base``)."""
    for sub in ("centroids", "codebooks"):
        if not os.path.exists(os.path.join(out_dir, sub, "_SUCCESS")):
            return False
    codes = os.path.join(out_dir, "codes")
    if os.path.exists(os.path.join(codes, "_SUCCESS")):
        return True
    batches = [
        e
        for e in (os.listdir(codes) if os.path.isdir(codes) else [])
        if e.startswith("batch=")
    ]
    return bool(batches) and all(
        os.path.exists(os.path.join(codes, b, "_SUCCESS")) for b in batches
    )


def load_ivfpq_index(
    spark: SparkSession, out_dir: str, m: int = 8, dim: int = 64
) -> IvfPqIndex:
    # a read should not fail just because the store is read-only or a
    # concurrent reader is mid-migration: attempt the layout fix, but fall
    # back to reading whatever is there (a flat layout is still readable
    # until the first streaming append adds a batch= dir next to it).
    import json

    try:
        _migrate_legacy_flat_codes(os.path.join(out_dir, "codes"))
    except OSError:
        pass
    # finish/roll back a codes compaction a crash interrupted — an index
    # must never serve the same row from both a folded generation and a
    # not-yet-deleted source batch. Unlike the flat-layout migration
    # (whose unmigrated state is still CORRECT to read), an unrecovered
    # fold is duplicate data — a read-only store that can't be repaired
    # rightly fails here rather than serve wrong rows.
    from vectordb_data_ingestion_spark.streaming.incremental import (
        _fold_recover,
    )

    _fold_recover(os.path.join(out_dir, "codes"))
    residual, rotation = False, None
    meta = _check_index_complete(out_dir, "serve queries")
    if meta is not None:
        residual = bool(meta.get("residual", False))
        rotation = meta.get("rotation")
        m = int(meta.get("m", m))
        dim = int(meta.get("dim", dim))
    return IvfPqIndex(
        centroids=spark.read.parquet(os.path.join(out_dir, "centroids")),
        codebooks=spark.read.parquet(os.path.join(out_dir, "codebooks")),
        codes=spark.read.parquet(os.path.join(out_dir, "codes")),
        m=m,
        dim=dim,
        residual=residual,
        rotation=rotation,
    )


def query_ivfpq_index(
    index: IvfPqIndex,
    query_vector: list[float],
    k: int,
    n_probe: int = 2,
    id_col: str = "vec_id",
    centroid_id: str = "c_id",
    centroid_vec: str = "c_embedding",
) -> DataFrame:
    """Answer a query from the stored index: pick the ``n_probe`` nearest
    centroids (tiny driver-side sort), prune ``codes/`` with a cell
    partition filter, ADC-score only the probed rows. Bit-identical to the
    rebuild-every-time ``pq.ivfpq_topk`` (parity-tested). A residual index
    (``_meta.json``) routes to the per-cell-LUT residual scorer instead —
    same probe contract, same pruning."""
    from vectordb_data_ingestion_spark.functions.vectors import (
        cosine_similarity,
        to_double_array,
    )
    from vectordb_data_ingestion_spark.operators.pq import (
        pq_adc_topk_codes,
        pq_adc_topk_codes_residual,
    )

    if index.residual:
        return pq_adc_topk_codes_residual(
            index.codes,
            index.codebooks,
            index.centroids,
            query_vector,
            k,
            n_probe=n_probe,
            m=index.m,
            dim=index.dim,
            id_col=id_col,
            centroid_id=centroid_id,
            centroid_vec=centroid_vec,
            rotation=index.rotation,
        )

    qv = F.array(*[F.lit(float(x)) for x in query_vector])
    probe_cells = [
        r[0]
        for r in index.centroids.select(
            F.col(centroid_id),
            F.round(
                cosine_similarity(to_double_array(F.col(centroid_vec)), qv), 6
            ).alias("s"),
        )
        .orderBy(F.desc("s"), F.asc(centroid_id))
        .limit(n_probe)
        .collect()
    ]
    pruned = index.codes.filter(F.col("cell").isin(probe_cells))
    return pq_adc_topk_codes(
        pruned,
        index.codebooks,
        query_vector,
        k,
        m=index.m,
        dim=index.dim,
        id_col=id_col,
    )


def foreach_batch_index_append(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint: str,
    m: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroid_id: str = "c_id",
    centroid_vec: str = "c_embedding",
):
    """Incremental index maintenance (the vector-side sibling of the BM25
    postings refresh): each micro-batch of new vectors is assigned its
    coarse cell and PQ-encoded against the STORED centroids/codebooks, and
    the rows append to the cell-partitioned ``codes/`` table. The coarse
    quantizer and codebooks are frozen at build time — standard IVF
    practice (re-train offline when drift accumulates; the index swap is a
    directory rename). Queries see new vectors immediately: the index
    tables are the single source of truth, no rebuild, no state in
    executor memory."""
    import os as _os

    from vectordb_data_ingestion_spark.operators.pq import pq_encode_vectorized
    from vectordb_data_ingestion_spark.operators.similarity import (
        assign_ivf_cells_vectorized,
    )

    def run_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # upgraded deployments: lift a pre-two-level flat cell= layout
        # under batch=base before adding batch-keyed subdirs next to it
        _migrate_legacy_flat_codes(_os.path.join(out_dir, "codes"))
        # same completion gate as load_ivfpq_index: never append into a
        # build that died between its meta write and its data writes
        meta = _check_index_complete(out_dir, "accept appends")
        spark = batch_df.sparkSession
        centroids = spark.read.parquet(_os.path.join(out_dir, "centroids"))
        codebooks = spark.read.parquet(_os.path.join(out_dir, "codebooks"))
        # appends MUST match the stored encoding: direct-encoded rows
        # appended to a residual index (or vice versa) would silently
        # corrupt every query that touches their cells
        residual, rotation = False, None
        if meta is not None:
            residual = bool(meta.get("residual", False))
            rotation = meta.get("rotation")
        if residual:
            from vectordb_data_ingestion_spark.operators.pq import (
                pq_encode_residual_vectorized,
            )

            codes = pq_encode_residual_vectorized(
                batch_df, centroids, codebooks, m, dim, vec_col=vec_col,
                id_col=id_col, centroid_id=centroid_id,
                centroid_vec=centroid_vec, rotation=rotation,
            )
        else:
            assigned = assign_ivf_cells_vectorized(
                batch_df, centroids, vec_col=vec_col,
                centroid_id=centroid_id,
                centroid_vec=centroid_vec, id_col=id_col,
            )
            encoded = pq_encode_vectorized(
                batch_df, codebooks, m, dim, vec_col=vec_col, id_col=id_col
            )
            codes = encoded.join(assigned.select(id_col, "cell"), id_col)
        # batch-keyed subdir + overwrite: a RETRIED micro-batch rewrites
        # its own partition instead of double-appending (foreachBatch is
        # at-least-once; the append form broke the determinism claim)
        codes.write.mode("overwrite").partitionBy("cell").parquet(
            _os.path.join(out_dir, "codes", f"batch={int(batch_id)}")
        )

    return (
        stream_df.writeStream.foreachBatch(run_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )


def calibrate_n_probe(
    index: IvfPqIndex,
    emb: DataFrame,
    query_vectors: list[list[float]],
    k: int = 10,
    target_recall: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_queries: int = 20,
) -> dict:
    """Pick the minimal ``n_probe`` whose mean recall@k against EXACT
    search hits ``target_recall`` — the ANN-path analogue of the
    reference's declarative quality knob (``top_by_certainty``,
    cfg.toml:48): the operator states the quality target, the engine
    derives the probe budget.

    Method (standard IVF practice): on a small calibration sample of
    queries, compute exact cosine truth with :func:`brute_force_topk`
    (driver-sized: ``max_queries x k`` ids), then walk ``n_probe`` up a
    doubling ladder, measuring mean recall from the stored index at each
    level. Recall@k is monotone in n_probe (probing more cells only adds
    candidates), so the first level that meets the target is the minimum
    on the ladder. Calibration cost is ``O(sample x ladder)`` small jobs —
    a maintenance operation, never in the query hot path.

    Returns ``{"n_probe": int, "recall": float, "measured": {n: recall}}``;
    if even a full probe misses the target (quantization error, not cell
    pruning, is then the limiter — raise m or switch to residual/OPQ
    encoding), returns the full-probe level with its measured recall.
    """
    from vectordb_data_ingestion_spark.operators.similarity import (
        brute_force_topk,
    )

    queries = [list(map(float, q)) for q in query_vectors[:max_queries]]
    if not queries:
        raise ValueError("calibrate_n_probe needs at least one query vector")
    truth = [
        {r[id_col] for r in brute_force_topk(
            emb, q, k, vec_col=vec_col, id_col=id_col
        ).collect()}
        for q in queries
    ]

    n_cells = index.centroids.count()
    ladder: list[int] = []
    n = 1
    while n < n_cells:
        ladder.append(n)
        n *= 2
    ladder.append(int(n_cells))

    measured: dict[int, float] = {}
    for n_probe in ladder:
        hits = total = 0
        for q, t in zip(queries, truth):
            got = {
                r[id_col]
                for r in query_ivfpq_index(
                    index, q, k, n_probe=n_probe, id_col=id_col
                ).collect()
            }
            hits += len(got & t)
            total += len(t)
        recall = hits / total if total else 0.0
        measured[n_probe] = round(recall, 4)
        if recall >= target_recall:
            return {"n_probe": n_probe, "recall": measured[n_probe],
                    "measured": measured}
    return {"n_probe": ladder[-1], "recall": measured[ladder[-1]],
            "measured": measured}
