"""Skew-mitigated joins.

At 100 TB a handful of hot keys (one viral document source, one dominant
event type) can put an entire shuffle partition on one executor while the
rest of the cluster idles. AQE's skew-join split handles sort-merge joins
it can measure; :func:`salted_join` is the explicit form for when the
planner can't help (e.g. the skewed side feeds a downstream aggregate and
you want the salt to survive into it, or AQE is unavailable on the
deployment): spread each hot key over ``n_salt`` sub-keys on the fact
side and replicate the dimension side once per sub-key, so the join
shuffles on ``(key, salt)`` and no single reducer owns a hot key.

Semantics are EXACTLY a plain equi-join — each fact row carries one
deterministic salt and meets precisely the one dimension replica with
that salt — which is what the registered oracle checks (plain SQL join,
no salt anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    fact_id: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``facts ⋈ dim ON key`` with the fact side salted by
    ``pmod(hash(fact_id), n_salt)`` and the dimension side exploded into
    ``n_salt`` replicas, joined on ``(key, salt)``.

    The salt is a pure function of ``fact_id`` (not ``rand()`` or the
    partition id), so results are partition-invariant and replay-stable —
    the same contract every operator here keeps for the determinism
    sweep. The dimension blow-up is ``n_salt``×, which is the standard
    trade: dimensions are small relative to facts, and each replica lands
    on a different reducer.

    ``how`` supports ``inner`` and ``left`` (a left join keeps unmatched
    fact rows exactly once since each row has one salt).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted_facts = facts.withColumn(
        "__salt", F.pmod(F.hash(F.col(fact_id)), F.lit(n_salt))
    )
    salted_dim = dim.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))),
    )
    out = salted_facts.join(salted_dim, on=[key, "__salt"], how=how)
    return out.drop("__salt")


def recommend_n_salt(
    max_rows: int,
    median_rows: int,
    target_rows_per_reducer: int | None = None,
    max_salt: int = 64,
) -> int:
    """Turn the ``key_skew_report`` diagnostic into the salt count the
    remedy needs: enough sub-keys that the hottest key's rows spread to
    roughly ``target_rows_per_reducer`` per reducer.

    Default target is ``4 x median_rows`` — a reducer holding one hot-key
    shard then does at most ~4x a typical key's work, which keeps the
    stage's critical path near the median task instead of the straggler.
    On a cluster, pass an explicit target derived from executor sizing
    (``plans/sizing.py``: rows that fit a shuffle partition's memory
    budget). Clamped to ``[1, max_salt]`` because every salt replicates
    the dimension side once (``salted_join``'s n_salt x dim blow-up).

    Keys at or below the target need no salt (returns 1 — a salted join
    with n_salt=1 IS the plain join, so callers can wire this through
    unconditionally).
    """
    if max_rows <= 0:
        raise ValueError("max_rows must be positive")
    if target_rows_per_reducer is None:
        target_rows_per_reducer = max(median_rows, 1) * 4
    if target_rows_per_reducer <= 0:
        raise ValueError("target_rows_per_reducer must be positive")
    n = -(-max_rows // target_rows_per_reducer)  # ceil div
    return max(1, min(int(n), max_salt))
