"""Deterministic dataset splitting + stratified sampling over
``documents`` — the selection steps a training-data pipeline runs after
dedup/quality filtering.

Both operators hash with md5 over a salted key so Spark and DuckDB
agree byte-for-byte, and both are pure column algebra (no UDF, no
randomness — reruns and resumes assign every row identically, the same
property the engine's L1 seeded pick relies on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# hex prefix threshold: buckets 00..cc of 256 → 205/256 ≈ 80.1% train
SPLIT_THRESHOLD = "cd"
SAMPLE_PER_STRATUM = 20


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _bucket(salt: str, key_col):
    return F.substring(
        F.md5(F.concat(F.lit(salt + "|"),
                       key_col.cast("string")).cast("binary")), 1, 2)


def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~80/20 split by salted md5 bucket of doc_id: stable under
    re-partitioning, resumable, and leakage-free (membership is a pure
    function of the id, so near-dup handling composes — split AFTER
    cluster resolution and the whole cluster lands on one side by
    hashing the cluster id instead)."""
    doc = _docs(spark, sf_dir)
    return (doc.select(
        "doc_id",
        F.when(_bucket("split", F.col("doc_id")) < SPLIT_THRESHOLD,
               F.lit("train")).otherwise(F.lit("test")).alias("split"))
        .orderBy("doc_id"))


TRAIN_TEST_SPLIT_SQL = f"""
SELECT doc_id,
       CASE WHEN substr(md5('split|' || doc_id), 1, 2)
                 < '{SPLIT_THRESHOLD}'
            THEN 'train' ELSE 'test' END AS split
FROM documents ORDER BY doc_id
"""


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic K-per-stratum sample (stratum = lang): rank rows
    inside each stratum by salted md5 and keep the first K. Strata are
    few and the window partitions by stratum, so at 10^12 rows this
    becomes the same two-phase partial top-k the scheduler uses
    (per-partition top-K then merge); at query scale the single window
    is exact and cheap."""
    doc = _docs(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.concat(F.lit("sample|"),
                       F.col("doc_id").cast("string")).cast("binary")),
        F.col("doc_id"))
    return (doc.select("doc_id", "lang",
                       F.row_number().over(w).alias("stratum_rank"))
            .filter(F.col("stratum_rank") <= SAMPLE_PER_STRATUM)
            .orderBy("lang", "stratum_rank"))


STRATIFIED_SAMPLE_SQL = f"""
SELECT doc_id, lang, stratum_rank FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5('sample|' || doc_id), doc_id)
           AS stratum_rank
  FROM documents)
WHERE stratum_rank <= {SAMPLE_PER_STRATUM}
ORDER BY lang, stratum_rank
"""


QUERIES = {
    "train_test_split": train_test_split,
    "stratified_sample": stratified_sample,
}

ORACLES = {
    "train_test_split": TRAIN_TEST_SPLIT_SQL,
    "stratified_sample": STRATIFIED_SAMPLE_SQL,
}
