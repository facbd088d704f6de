"""Corpus curation — the training-data-pipeline endgame composed from
the dedup + text-analysis operators: a per-document decision log
(keep/drop with the reasons) of

    kept = canonical-in-its-near-dup-cluster
           ∧ quality ≥ threshold
           ∧ language identified (not 'und')

i.e. the C4/Gopher-style filter chain over the `documents` table. The
value here is the COMPOSITION: three independently-oracled operator
families (connected-components dedup, heuristic quality, marker-word
lang-ID) joined into one auditable decision per document, with the
whole chain checked against a single DuckDB oracle built from the same
sub-queries. Scale shape: three doc_id-keyed joins of narrow columns —
text is read once per sub-operator and never joined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import dedup_clusters, dedup_clusters_sql
from .text_quality import _docs, lang_id_sql, lang_pred_cols, \
    lang_score_cols, quality_cols, quality_score_sql

QUALITY_KEEP_THRESHOLD = 0.5  # on the round(4) score — both engines
                              # compare the identically-rounded value,
                              # so the gate can never knife-edge apart


def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    canon = dedup_clusters(spark, sf_dir).select("doc_id", "is_canonical")
    # Quality + lang-ID are pure column algebra over the same table, so
    # compute BOTH in one scan of `documents` and join only the dedup
    # side — the previous three-way join scanned the full text twice
    # and shuffled one extra doc_id join for features that never needed
    # a shuffle at all. Output is identical (same expressions, same
    # rounding); the oracle SQL keeps its per-operator CTE composition.
    doc = _docs(spark, sf_dir)  # same reader as lang_id/quality_score
    text = F.col("text")
    feats = (doc.select("doc_id",
                        quality_cols(text)["quality"].alias("quality"),
                        *lang_score_cols(text))
             .select("doc_id", "quality",
                     lang_pred_cols()[0].alias("pred_lang")))
    kept = (F.col("is_canonical")
            & (F.col("quality") >= QUALITY_KEEP_THRESHOLD)
            & (F.col("pred_lang") != "und"))
    return (canon.join(feats, "doc_id")
            .select("doc_id", "is_canonical", "quality", "pred_lang",
                    kept.alias("kept"))
            .orderBy("doc_id"))


def corpus_curation_sql() -> str:
    return f"""
SELECT c.doc_id, c.is_canonical, q.quality, l.pred_lang,
       (c.is_canonical AND q.quality >= {QUALITY_KEEP_THRESHOLD}
        AND l.pred_lang <> 'und') AS kept
FROM ({dedup_clusters_sql()}) c
JOIN ({quality_score_sql()}) q ON q.doc_id = c.doc_id
JOIN ({lang_id_sql()}) l ON l.doc_id = c.doc_id
ORDER BY c.doc_id
"""


QUERIES = {"corpus_curation": corpus_curation}
ORACLES = {"corpus_curation": corpus_curation_sql()}
