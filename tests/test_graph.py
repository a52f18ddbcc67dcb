"""Connected components / dedup-cluster resolution on known graphs."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_tool_spark.operators.graph import (
    connected_components,
    dedup_clusters,
)


def test_cc_known_graph(spark):
    # components: {1,2,3,4} (chain), {5,6}, {7} not in edges
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6)], "id_a long, id_b long"
    )
    comp = {r.node: r.comp for r in connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5}


def test_cc_long_chain_converges(spark):
    """A 15-node chain needs multiple propagation rounds — exercises
    the iteration + convergence check, not just one hop."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(15)], "id_a long, id_b long"
    )
    comp = {r.node: r.comp for r in connected_components(edges).collect()}
    assert set(comp.values()) == {0}
    assert len(comp) == 16


def test_cc_nonconvergence_raises(spark):
    """Exhausting max_iter before labels settle must be LOUD — a silent
    return would hand downstream dedup split clusters."""
    import pytest

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(15)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=2)


def test_dedup_clusters_keeper_and_singletons(spark):
    pairs = spark.createDataFrame([(10, 20), (20, 30)], "id_a long, id_b long")
    all_ids = spark.createDataFrame(
        [(10,), (20,), (30,), (99,)], "doc_id long"
    )
    out = {r.doc_id: (r.keeper_id, r.cluster_size)
           for r in dedup_clusters(pairs, all_ids).collect()}
    assert out == {10: (10, 3), 20: (10, 3), 30: (10, 3), 99: (99, 1)}


def test_planted_clones_cluster_together(spark, sf_dir):
    """Planted clones (a,b,c of the same doc) must land in ONE cluster
    with the original as keeper."""
    from data_ingestion_tool_spark.operators.dedup import minhash_near_dup_pairs
    from data_ingestion_tool_spark.sources.parquet_io import read_table

    d = (
        read_table(spark, sf_dir, "documents")
        .filter(F.col("n_chars") > 300)
        .limit(10)
        .select("doc_id", "text")
        .cache()
    )
    clones = [
        d.select(
            (F.col("doc_id") + off).alias("doc_id"),
            F.concat(F.col("text"), F.lit(suffix)).alias("text"),
        )
        for off, suffix in ((10_000, " x"), (20_000, " y z"))
    ]
    docs = d
    for c in clones:
        docs = docs.unionByName(c)
    pairs = minhash_near_dup_pairs(docs, jaccard_threshold=0.5)
    out = dedup_clusters(pairs, docs, "doc_id")
    rows = {r.doc_id: (r.keeper_id, r.cluster_size) for r in out.collect()}
    for r in d.collect():
        i = r.doc_id
        # original + both clones land in the same cluster (the corpus
        # has its own generator-planted near-dups, so clusters may merge
        # ACROSS originals — keeper is the min of the merged cluster)
        assert rows[i][0] == rows[i + 10_000][0] == rows[i + 20_000][0]
        assert rows[i][0] <= i
        assert rows[i][1] >= 3


def test_pipeline_prep_removes_planted_clones(spark, sf_dir):
    """End-to-end pipeline sanity: the per-source totals never exceed
    the gated corpus, and every cluster keeps exactly one doc (keepers
    are unique and self-referential)."""
    from pyspark.sql import functions as F

    from data_ingestion_tool_spark.operators.dedup import minhash_near_dup_pairs
    from data_ingestion_tool_spark.operators.graph import dedup_clusters
    from data_ingestion_tool_spark.sources.parquet_io import read_table

    d = read_table(spark, sf_dir, "documents").select("doc_id", "text").limit(200)
    pairs = minhash_near_dup_pairs(d, jaccard_threshold=0.5)
    resolved = dedup_clusters(pairs, d, "doc_id")
    total = d.count()
    assert resolved.count() == total  # every doc resolved exactly once
    keepers = resolved.filter(F.col("doc_id") == F.col("keeper_id"))
    # one keeper per cluster, and cluster sizes account for every doc
    sizes = resolved.groupBy("keeper_id").count()
    assert keepers.count() == sizes.count()
    assert sizes.agg(F.sum("count")).collect()[0][0] == total


def test_hierarchy_closure_known_forest(spark):
    """Two hand-built trees: depths and roots must match exactly."""
    from data_ingestion_tool_spark.operators.graph import hierarchy_closure

    #   0            5
    #   1            6
    #  2 3            (chain)
    #  4
    rows = [(0, None), (1, 0), (2, 1), (3, 1), (4, 2), (5, None), (6, 5)]
    nodes = spark.createDataFrame(rows, "id long, parent long")
    got = {
        r.node: (r.root_id, r.depth)
        for r in hierarchy_closure(nodes, "id", "parent").collect()
    }
    assert got == {
        0: (0, 0), 1: (0, 1), 2: (0, 2), 3: (0, 2), 4: (0, 3),
        5: (5, 0), 6: (5, 1),
    }


def test_hierarchy_closure_deep_chain(spark):
    """A 200-deep chain resolves in ~8 pointer-doubling rounds."""
    from data_ingestion_tool_spark.operators.graph import hierarchy_closure

    rows = [(0, None)] + [(i, i - 1) for i in range(1, 200)]
    nodes = spark.createDataFrame(rows, "id long, parent long")
    out = hierarchy_closure(nodes, "id", "parent", max_iter=10).collect()
    assert {r.node: r.depth for r in out}[199] == 199
    assert all(r.root_id == 0 for r in out)


def test_hierarchy_closure_cycle_raises(spark):
    from data_ingestion_tool_spark.operators.graph import hierarchy_closure

    import pytest

    rows = [(0, 1), (1, 0)]  # 2-cycle, no root
    nodes = spark.createDataFrame(rows, "id long, parent long")
    with pytest.raises(RuntimeError, match="did not resolve"):
        hierarchy_closure(nodes, "id", "parent", max_iter=5)


def test_iterated_loops_release_per_round_pins(spark):
    """Round-13 ADVICE: the per-round eager pins in connected_components
    and hierarchy_closure must be freed as the loop advances — only the
    final frame's blocks may remain, however many rounds ran."""
    from data_ingestion_tool_spark.operators.graph import (
        connected_components,
        hierarchy_closure,
    )

    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id_a long, id_b long"
    )
    cc = connected_components(edges, max_iter=50)
    cc.count()
    after_cc = jsc.getPersistentRDDs().size()
    # one pinned frame (the returned labels) is expected; a long chain
    # runs many rounds, so an unreleased loop would leave many more
    assert after_cc - before <= 1, (before, after_cc)

    rows = [(0, None)] + [(i, i - 1) for i in range(1, 120)]
    nodes = spark.createDataFrame(rows, "id long, parent long")
    hierarchy_closure(nodes, "id", "parent", max_iter=10).count()
    after_hc = jsc.getPersistentRDDs().size()
    assert after_hc - after_cc <= 1, (after_cc, after_hc)
