"""ANN through the LSH buckets: recall vs the exact path, plan shape of
the two-phase top-k (no single-task per-query sort), and near-dup LSH
candidate soundness."""

from pyspark.sql import functions as F

from adscraper_spark.pipelines import similarity as sim

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_lsh_search_recall_vs_exact(spark):
    exact = {(r["qid"], r["vec_id"])
             for r in sim.ann_cosine_topk(spark, SF).collect()}
    approx = {(r["qid"], r["vec_id"])
              for r in sim.ann_lsh_search(spark, SF).collect()}
    assert exact, "exact path returned nothing"
    recall = len(exact & approx) / len(exact)
    # sign-LSH with 2×6-bit bands on 64-dim synthetic embeddings: the
    # true top-k are high-cosine → high band-collision probability.
    assert recall >= 0.4, f"LSH search recall collapsed: {recall}"
    # every approx hit must be a real vector pair with computable cosine
    assert all(q != v for q, v in approx)


def test_two_phase_topk_no_single_task_sort(spark):
    plan = _plan(sim.ann_cosine_topk(spark, SF))
    # phase 1 must window over (qid, shard) before the per-qid window
    first = plan.find("shard")
    assert first != -1, "two-phase top-k lost its shard column:\n" + plan
    assert plan.count("Window") >= 2


def test_near_dup_lsh_subset_of_exact_pairs(spark):
    """Every LSH-found pair must also be found by the exact all-pairs
    path at the same threshold (no false positives — LSH only loses
    pairs, never invents them)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    a = emb.select(F.col("vec_id").alias("a"),
                   F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("b"),
                   F.col("embedding").alias("vb"))
    cos = sim._dot(F.col("va"), F.col("vb")) / (
        sim._norm(F.col("va")) * sim._norm(F.col("vb")))
    exact = {(r["a"], r["b"]) for r in
             a.crossJoin(b).filter(F.col("a") < F.col("b"))
             .select("a", "b", F.round(cos, 4).alias("cos"))
             .filter(F.col("cos") >= sim.NEAR_DUP_LSH_THRESHOLD)
             .collect()}
    approx = {(r["a"], r["b"])
              for r in sim.near_dup_lsh(spark, SF).collect()}
    assert approx.issubset(exact)
    if exact:
        recall = len(approx) / len(exact)
        assert recall >= 0.3, f"near-dup LSH recall collapsed: {recall}"


def test_connected_components_long_path_converges_log_rounds(spark):
    """A 64-node path graph (diameter 63) must resolve to ONE cluster
    in O(log diameter) rounds — the pointer-jump step halves the
    longest chain each round, so 12 rounds is generous for a 63-hop
    path, while plain min-label propagation would need 63."""
    from adscraper_spark.pipelines.dedup import connected_components

    n = 64
    pairs = [(i, i + 1) for i in range(n - 1)]
    edges = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], "src long, dst long")
    comp = connected_components(edges, max_rounds=12).collect()
    assert len(comp) == n
    assert {r["cluster"] for r in comp} == {0}
