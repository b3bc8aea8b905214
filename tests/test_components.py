"""Connected-components duplicate clustering: correctness on adversarial
graph shapes (the oracle test covers the minhash-fed path; these cover the
algorithm itself, where hash-min alone would be slow or a naive impl wrong).
"""

import pytest

from vectordb_data_ingestion_spark.operators.dedup import (
    connected_components,
    dedup_by_components,
)


def _components(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    rows = connected_components(df).collect()
    return {r["node"]: r["component"] for r in rows}


def test_two_cliques_and_bridge(spark):
    # {1,2,3} clique, {10,11} pair, bridged 3-10 => all one component;
    # {20,21} separate
    edges = [(1, 2), (2, 3), (1, 3), (10, 11), (3, 10), (20, 21)]
    got = _components(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1, 10: 1, 11: 1, 20: 20, 21: 20}


def test_path_graph_converges_logarithmically(spark):
    # worst case for plain hash-min (diameter = n); pointer jumping must
    # still converge well inside max_iterations
    n = 64
    edges = [(i, i + 1) for i in range(n)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    rows = connected_components(df, max_iterations=10).collect()
    assert {r["component"] for r in rows} == {0}
    assert len(rows) == n + 1


def test_transitive_collapse_without_direct_pair(spark):
    # A~B, B~C but never A~C: one cluster, representative = min id
    got = _components(spark, [(5, 9), (9, 7)])
    assert got == {5: 5, 9: 5, 7: 5}


def test_dedup_by_components_keeps_one_per_cluster(spark):
    docs = spark.createDataFrame(
        [(i, f"doc{i}") for i in (1, 2, 3, 10, 11, 99)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "id_a long, id_b long")
    comp = connected_components(pairs)
    out = dedup_by_components(docs, comp, id_col="doc_id")
    rows = {r["doc_id"]: (r["component"], r["is_dup"]) for r in out.collect()}
    assert rows == {
        1: (1, False),
        2: (1, True),
        3: (1, True),
        10: (10, False),
        11: (10, True),
        99: (99, False),  # isolated row is its own component, kept
    }
    kept = [d for d, (_, dup) in rows.items() if not dup]
    assert sorted(kept) == [1, 10, 99]


def test_empty_pairs(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(df).count() == 0


@pytest.mark.parametrize(
    "seed,n_nodes,n_edges",
    [(7, 60, 40), (11, 120, 150), (13, 200, 80)],
)
def test_randomized_parity_with_union_find(spark, seed, n_nodes, n_edges):
    """The distributed min-label/pointer-jumping algorithm must agree with
    a pure-Python union-find on random graphs across regimes: sparse
    (mostly small components), dense (one giant component emerges), and
    very sparse over many nodes (lots of isolated pairs). Component label
    = min node id of the component, matching the operator's contract."""
    import random

    rng = random.Random(seed)
    edges = sorted(
        {
            tuple(sorted(rng.sample(range(n_nodes), 2)))
            for _ in range(n_edges)
        }
    )

    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-label per component, only for nodes that appear in an edge
    touched = {v for e in edges for v in e}
    expected = {v: find(v) for v in touched}
    # find() roots are already the min id: union always hangs the larger
    # root under the smaller, so the root never increases
    got = _components(spark, [(a, b) for a, b in edges])
    assert got == expected


def test_spread_starvation_guard(spark):
    """A 1-partition frame (tiny compressed scan) fans out to the
    executor core count so CPU-bound work downstream parallelizes; an
    already-wide frame passes through untouched (no extra shuffle)."""
    from vectordb_data_ingestion_spark.session import spread

    narrow = spark.range(1000).coalesce(1)
    assert narrow.rdd.getNumPartitions() == 1
    out = spread(narrow)
    assert (
        out.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    assert sorted(r["id"] for r in out.collect()) == list(range(1000))

    want = spark.sparkContext.defaultParallelism
    wide = spark.range(1000).repartition(want + 4)
    assert spread(wide) is wide  # no-op: never ADD a shuffle


def test_string_ids_converge_and_collapse(spark):
    """Review r5: the convergence checksum summed the raw label column,
    which implicitly casts string ids to double -> NULL -> None == None
    -> spurious convergence after ONE iteration. A 10-node string-id
    chain needs ~3 pointer-jumping rounds; every node must still reach
    the global min label."""
    names = [f"doc-{c}" for c in "abcdefghij"]
    edges = [(names[i], names[i + 1]) for i in range(len(names) - 1)]
    df = spark.createDataFrame(edges, "id_a string, id_b string")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == {n: "doc-a" for n in names}


def test_choose_lsh_banding_curve_properties():
    """The banding chooser returns the cheapest (b, r) whose s-curve
    meets the declared recall/false-candidate bounds; its numbers are
    the exact closed-form probabilities, feasibility failures raise
    loudly, and the curve is monotone in similarity."""
    import pytest

    from vectordb_data_ingestion_spark.operators.dedup import (
        choose_lsh_banding,
    )

    for t in (0.5, 0.7, 0.8):
        cfg = choose_lsh_banding(t)
        b, r = cfg["bands"], cfg["rows_per_band"]
        assert b * r == cfg["num_hashes"] <= 256
        # exact closed form at the two declared operating points
        assert cfg["p_at_threshold"] >= 0.9
        assert cfg["p_at_fp"] <= 0.25
        assert round(1 - (1 - t ** r) ** b, 4) == cfg["p_at_threshold"]
        curve = [cfg["curve"][k] for k in sorted(cfg["curve"])]
        assert curve == sorted(curve)  # monotone s-curve
    # cheapest-first: no smaller signature satisfies the same bounds
    cfg = choose_lsh_banding(0.5)
    for total in range(2, cfg["num_hashes"]):
        for r in range(1, total + 1):
            if total % r:
                continue
            b = total // r
            ok_hit = 1 - (1 - 0.5 ** r) ** b >= 0.9
            ok_fp = 1 - (1 - 0.25 ** r) ** b <= 0.25
            assert not (ok_hit and ok_fp), (total, b, r)
    # infeasible bounds raise instead of nearest-fitting
    with pytest.raises(ValueError, match="loosen"):
        choose_lsh_banding(0.5, max_hashes=32, max_fp_rate=0.05)
