"""External embedding enrichment — the reference's "expensive middle".

The reference embeds one chunk per HTTP POST, serially on the driver
(``get_embedding_llm`` cmfunctions.py:62-71, invoked per chunk
sharepointutils.py:377-378; retrying variant ``get_embedding``
cmfunctions.py:489-519 with ``backoff.expo`` and newline->space
normalization). Here the same semantics run as a distributed
``mapInPandas`` stage:

- **many texts per request** (``batch_size``), not one — at 100 TB the
  bottleneck is request count, not bytes;
- **one transport per partition** (connection reuse; the factory runs on
  the executor, so sessions are never pickled);
- **exponential backoff with jitter-free deterministic delays** inside the
  UDF, mirroring ``backoff.expo`` — Spark task retries sit on top;
- newline -> space normalization before the call (cmfunctions.py:497);
- output rows carry every input column plus ``vector`` — the stage is a
  pure column append, so upstream pruning/pushdown is unaffected.

Transports are pluggable: :func:`deterministic_fake_transport` is the
hermetic default (hash-derived vectors, no network — used by tests and the
driver's oracle tables), :func:`http_transport_factory` is the real
gateway client (stdlib urllib; POST ``{"input": [...], "user": ...}`` ->
``data[i].embedding``, the public Azure/OpenAI-style shape the reference
consumes at cmfunctions.py:43-71).
"""

from __future__ import annotations

import hashlib
import math
import struct
import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import ArrayType, FloatType, StructField, StructType

# A transport embeds a batch of texts. A factory builds one per partition.
Transport = Callable[[list[str]], list[list[float]]]
TransportFactory = Callable[[], Transport]


def call_with_backoff(
    fn: Callable[[], object],
    max_retries: int = 5,
    base_delay: float = 0.1,
    sleep: Callable[[float], None] = time.sleep,
):
    """``backoff.expo`` semantics (cmfunctions.py:489-492): retry on any
    exception with delays base_delay * 2^attempt; re-raise after
    ``max_retries`` failures."""
    for attempt in range(max_retries):
        try:
            return fn()
        except Exception:
            if attempt == max_retries - 1:
                raise
            sleep(base_delay * (2**attempt))


def _hash_vector(text: str, dim: int) -> list[float]:
    """Deterministic pseudo-embedding: sha256-expanded floats in [-1, 1],
    L2-normalized. Stable across processes/seeds (no Python ``hash``), and
    the counter suffix is plain text (``#c0``, ``#c1``, ...) so the exact
    values are re-derivable in ANSI SQL (``sha256(text || '#c0')`` hex
    slices) - the embed stage oracle-checks like any other operator."""
    out: list[float] = []
    counter = 0
    while len(out) < dim:
        digest = hashlib.sha256(
            (text + f"#c{counter}").encode("utf-8", errors="ignore")
        ).digest()
        for i in range(0, 32, 4):
            (u,) = struct.unpack(">I", digest[i : i + 4])
            out.append((u / 0xFFFFFFFF) * 2.0 - 1.0)
        counter += 1
    out = out[:dim]
    norm = math.sqrt(sum(x * x for x in out)) or 1.0
    return [x / norm for x in out]


def deterministic_fake_transport(dim: int = 16) -> TransportFactory:
    """Hermetic stand-in for the embedding gateway — clearly-marked FAKE.
    Real deployments swap in :func:`http_transport_factory`."""

    def factory() -> Transport:
        def embed(texts: list[str]) -> list[list[float]]:
            return [_hash_vector(t, dim) for t in texts]

        return embed

    return factory


def http_transport_factory(
    endpoint: str,
    user: str = "spark",
    timeout: float = 30.0,
) -> TransportFactory:  # pragma: no cover - needs a live gateway
    """Gateway client for the reference's API shape (cmfunctions.py:43-71):
    POST ``{"input": [...texts...], "user": user}`` to
    ``{proxy}/azure/engines/{engine}/embeddings``-style ``endpoint``; the
    response carries ``data[i].embedding`` per input. stdlib-only so the
    closure ships to executors without extra deps."""

    def factory() -> Transport:
        import json
        import urllib.request

        def embed(texts: list[str]) -> list[list[float]]:
            body = json.dumps({"input": texts, "user": user}).encode("utf-8")
            req = urllib.request.Request(
                endpoint,
                data=body,
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                payload = json.loads(resp.read().decode("utf-8"))
            data = sorted(payload["data"], key=lambda d: d.get("index", 0))
            return [d["embedding"] for d in data]

        return embed

    return factory


def embed_via_api(
    df: DataFrame,
    transport_factory: TransportFactory,
    text_col: str = "chunk_text",
    vec_col: str = "vector",
    batch_size: int = 64,
    max_retries: int = 5,
    base_delay: float = 0.1,
    expected_dim: int | None = None,
) -> DataFrame:
    """Append ``vec_col: array<float>`` by calling the embedding transport
    over Arrow batches. Control request concurrency with
    ``df.repartition(n)`` upstream — one partition == one independent
    request stream (the reference is a single serial stream).

    Pass ``expected_dim`` whenever the model's dimension is known: the
    per-task check alone pins uniformity only WITHIN a partition's
    stream, so a load-balanced endpoint serving two model versions could
    still mix dimensions across partitions without it."""
    out_schema = StructType(
        df.schema.fields + [StructField(vec_col, ArrayType(FloatType()))]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        transport = transport_factory()
        # uniform across this task's stream; cross-partition uniformity
        # needs expected_dim (each task starts with its own None)
        dim_seen = expected_dim
        for pdf in batches:
            if pdf.empty:
                continue
            # NULL text must fail LOUDLY here: astype(str) renders None as
            # the literal string "None", which would be silently embedded
            # as real content (the reference crashes on None.replace —
            # cmfunctions.py:497 — so loud is also parity). Upstream
            # pipelines filter/compose text before this stage; a NULL
            # reaching it is a wiring bug, not data.
            if pdf[text_col].isna().any():
                raise ValueError(
                    f"embed_via_api: NULL {text_col!r} in batch — filter "
                    "or coalesce text before the embed stage"
                )
            # cmfunctions.py:497 — newlines confuse the gateway tokenizer.
            texts = (
                pdf[text_col].astype(str).str.replace("\n", " ", regex=False)
            ).tolist()
            vectors: list[list[float]] = []
            for start in range(0, len(texts), batch_size):
                group = texts[start : start + batch_size]
                vecs = call_with_backoff(
                    lambda g=group: transport(g), max_retries, base_delay
                )
                if len(vecs) != len(group):
                    raise ValueError(
                        f"transport returned {len(vecs)} vectors "
                        f"for {len(group)} inputs"
                    )
                for v in vecs:
                    # a flaky service returning a short vector would
                    # silently poison every downstream cosine (zip_with
                    # truncates to the shorter side) — fail loud instead
                    if dim_seen is None:
                        dim_seen = len(v)
                    elif len(v) != dim_seen:
                        raise ValueError(
                            f"transport returned a {len(v)}-dim vector in "
                            f"a {dim_seen}-dim stream"
                        )
                vectors.extend(vecs)
            out = pdf.copy()
            out[vec_col] = vectors
            yield out

    return df.mapInPandas(run, schema=out_schema)


def hash_vector_sql_terms(expr: str, dim: int) -> tuple[list[str], str]:
    """DuckDB SQL re-derivation of :func:`_hash_vector`: per-element value
    expressions (pre-normalization) and the L2 norm expression. ``expr``
    must already have newlines collapsed (the transport's preprocessing).
    """
    n_digests = (dim + 7) // 8
    digests = [f"sha256({expr} || '#c{c}')" for c in range(n_digests)]
    vals = []
    for i in range(dim):
        d = digests[i // 8]
        off = (i % 8) * 8 + 1
        vals.append(
            f"((('0x' || substr({d}, {off}, 8))::BIGINT / 4294967295.0)"
            f" * 2.0 - 1.0)"
        )
    norm = "sqrt(" + " + ".join(f"({v}) * ({v})" for v in vals) + ")"
    return vals, norm


# --- LLM batch annotation ---------------------------------------------------
#
# Training-data pipelines increasingly run MODEL-IN-THE-LOOP labeling at
# corpus scale (quality judgments, topic tags, safety labels). The Spark
# shape is identical to the embedding stage: Arrow-batched mapInPandas, a
# per-executor transport, many texts per request, exponential backoff. The
# hermetic fake below derives labels from sha256 so the stage oracle-checks
# like any other operator; deployments swap an HTTP factory in.

ANNOTATE_LABELS = ("keep", "review", "drop")


def deterministic_fake_annotator(
    labels: tuple[str, ...] = ANNOTATE_LABELS,
) -> TransportFactory:
    """Hermetic stand-in for a labeling model — clearly-marked FAKE. The
    label is ``labels[first_sha256_byte % len(labels)]`` and the score is
    ``second_byte / 255`` — both re-derivable in ANSI SQL."""

    def factory() -> Transport:
        def annotate(texts: list[str]) -> list[list]:
            import hashlib as _hl

            out = []
            for t in texts:
                d = _hl.sha256(t.encode("utf-8", errors="ignore")).digest()
                out.append([labels[d[0] % len(labels)], d[1] / 255.0])
            return out

        return annotate

    return factory


def annotate_via_api(
    df: DataFrame,
    transport_factory: TransportFactory,
    text_col: str = "text",
    label_col: str = "label",
    score_col: str = "label_score",
    batch_size: int = 64,
    max_retries: int = 5,
    base_delay: float = 0.1,
) -> DataFrame:
    """Append ``(label_col: string, score_col: double)`` by calling the
    annotation transport over Arrow batches — the labeling sibling of
    :func:`embed_via_api` (same batching, same per-partition request
    stream, same backoff)."""
    from pyspark.sql.types import DoubleType, StringType

    out_schema = StructType(
        df.schema.fields
        + [StructField(label_col, StringType()), StructField(score_col, DoubleType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        transport = transport_factory()
        for pdf in batches:
            if pdf.empty:
                continue
            # same loud-NULL contract as embed_via_api: "None" labels are
            # silent corruption
            if pdf[text_col].isna().any():
                raise ValueError(
                    f"annotate_via_api: NULL {text_col!r} in batch — filter "
                    "or coalesce text before the annotate stage"
                )
            texts = (
                pdf[text_col].astype(str).str.replace("\n", " ", regex=False)
            ).tolist()
            results: list[list] = []
            for start in range(0, len(texts), batch_size):
                group = texts[start : start + batch_size]
                got = call_with_backoff(
                    lambda g=group: transport(g), max_retries, base_delay
                )
                if len(got) != len(group):
                    raise ValueError(
                        f"annotator returned {len(got)} labels "
                        f"for {len(group)} inputs"
                    )
                for r in got:
                    if len(r) < 2:
                        # same loud-boundary contract as the ragged-dim
                        # embed check: name the malformed row instead of
                        # an IndexError deep in the column assembly
                        raise ValueError(
                            f"annotator returned a malformed row {r!r}; "
                            "expected (label, score)"
                        )
                results.extend(got)
            out = pdf.copy()
            out[label_col] = [r[0] for r in results]
            out[score_col] = [round(float(r[1]), 6) for r in results]
            yield out

    return df.mapInPandas(run, schema=out_schema)
