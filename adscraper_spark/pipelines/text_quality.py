"""Text-analysis operators for a training-data pipeline over the
``documents`` table: language-ID, quality scoring, token counting,
document fingerprinting.

Every operator is pure JVM-side column algebra (no Python UDFs in the
hot path) and has an exact ANSI-SQL oracle (DuckDB) — the formulas are
pinned to constructs whose semantics are identical in both engines
(length/replace counting, md5, simple regex classes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import CHEAP_SCAN_MIN_BYTES, spread, with_global_agg

# pinned per-language marker words (surrounded by spaces when counted so
# substrings don't double-hit). Deterministic tie-break: language order.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to"],
    "es": ["el", "la", "los", "que"],
    "de": ["der", "die", "und", "nicht"],
    "fr": ["le", "la", "les", "est"],
}

STOPWORDS = ["the", "and", "of", "to", "a", "in"]
TOKEN_REGEX = "[A-Za-z]+|[0-9]+"  # BPE-ish word/number split, RE2==Java here


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread: the single-row-group testdata file plans 1-2 scan tasks;
    # the shingle md5 explode below otherwise runs serially
    # (common.spread — identity at real scale)
    return spread(spark.read.parquet(f"{sf_dir}/documents.parquet"),
                  "doc_id")


def _docs_cheap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reader for the CHEAP per-row queries (marker/stopword counting,
    regex passes): fan out only past CHEAP_SCAN_MIN_BYTES — below it
    the exchange's fixed cost exceeds the parallelized projection
    (interleaved A/B in common.py docstring)."""
    return spread(spark.read.parquet(f"{sf_dir}/documents.parquet"),
                  "doc_id", min_bytes=CHEAP_SCAN_MIN_BYTES)


def _occurrences(col, needle: str):
    """Count non-overlapping occurrences of ``needle`` via the
    length/replace identity — bit-identical across engines."""
    return ((F.length(col) - F.length(F.replace(col, F.lit(needle))))
            / len(needle)).cast("long")


def _padded(col):
    return F.concat(F.lit(" "), col, F.lit(" "))


def lang_score_cols(text_col) -> list:
    """Per-language marker-occurrence score columns (aliased
    ``score_<lang>``) over an UNPADDED text column — the shared
    building block for lang_id and the fused corpus_curation scan."""
    padded = _padded(text_col)
    return [
        sum(_occurrences(padded, f" {w} ") for w in words).alias(
            f"score_{lang}")
        for lang, words in LANG_MARKERS.items()
    ]


def lang_pred_cols():
    """(pred_lang, best) expressions over the ``score_<lang>`` columns
    produced by lang_score_cols: argmax via greatest + case chain
    (stable under ties: first lang wins)."""
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lg}") for lg in langs])
    pred = F.lit("und")
    for lg in reversed(langs):
        pred = F.when(F.col(f"score_{lg}") == best, F.lit(lg)).otherwise(pred)
    pred = F.when(best == 0, F.lit("und")).otherwise(pred)
    return pred, best


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID; argmax with language-name tie-break.
    Scores per language = total marker-word occurrences."""
    doc = _docs_cheap(spark, sf_dir)
    scored = doc.select("doc_id", "lang",
                        *lang_score_cols(F.col("text")))
    pred, best = lang_pred_cols()
    return (scored
            .select("doc_id", "lang", pred.alias("pred_lang"),
                    best.cast("long").alias("best_score"))
            .orderBy("doc_id"))


def lang_id_sql() -> str:
    def occ(expr: str, needle: str) -> str:
        n = len(needle)
        return (f"CAST((length({expr}) - length(replace({expr}, "
                f"'{needle}', ''))) / {n} AS BIGINT)")

    score_exprs = []
    for lang, words in LANG_MARKERS.items():
        parts = " + ".join(occ("p.padded", f" {w} ") for w in words)
        score_exprs.append(f"({parts}) AS score_{lang}")
    langs = list(LANG_MARKERS)
    best = "greatest(" + ", ".join(f"score_{lg}" for lg in langs) + ")"
    case = "CASE "
    for lg in langs:
        case += f"WHEN score_{lg} = best THEN '{lg}' "
    case += "ELSE 'und' END"
    return f"""
WITH p AS (
  SELECT doc_id, lang, ' ' || text || ' ' AS padded FROM documents
), s AS (
  SELECT doc_id, lang, {', '.join(score_exprs)} FROM p
), b AS (
  SELECT doc_id, lang, {best} AS best, * EXCLUDE (doc_id, lang) FROM s
)
SELECT doc_id, lang,
       CASE WHEN best = 0 THEN 'und' ELSE {case} END AS pred_lang,
       CAST(best AS BIGINT) AS best_score
FROM b ORDER BY doc_id
"""


def quality_cols(text) -> dict:
    """The C4/Gopher-style feature expressions over a text column,
    keyed by output name — the shared building block for quality_score
    and the fused corpus_curation scan."""
    padded = _padded(text)
    n_chars = F.length(text).cast("double")
    n_words = (_occurrences(text, " ") + 1).cast("double")
    stop_hits = sum(_occurrences(padded, f" {w} ") for w in STOPWORDS)
    n_punct = sum(_occurrences(text, p) for p in [".", ",", "!", "?"])
    mean_word_len = n_chars / n_words
    stop_ratio = stop_hits.cast("double") / n_words
    punct_ratio = n_punct.cast("double") / n_chars
    score = (
        F.least(n_words / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.3
        + F.when((mean_word_len >= 3.0) & (mean_word_len <= 10.0),
                 F.lit(1.0)).otherwise(F.lit(0.0)) * 0.2
        + F.least(punct_ratio * 20.0, F.lit(1.0)) * 0.1
    )
    return {
        "n_chars_m": n_chars.cast("long"),
        "n_words": n_words.cast("long"),
        "stop_ratio": F.round(stop_ratio, 4),
        "quality": F.round(score, 4),
    }


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality: length, word count, stopword ratio,
    punctuation density — the standard web-text filtering features
    (C4/Gopher-style rules, public literature), pinned to an exact
    cross-engine formula."""
    doc = _docs_cheap(spark, sf_dir)
    cols = quality_cols(F.col("text"))
    return (doc.select(
        "doc_id", *[c.alias(n) for n, c in cols.items()])
        .orderBy("doc_id"))


def quality_score_sql() -> str:
    def occ(expr: str, needle: str) -> str:
        n = len(needle)
        esc = needle.replace("'", "''")
        return (f"(length({expr}) - length(replace({expr}, '{esc}', '')))"
                f" / {n}")

    stop = " + ".join(occ("' ' || text || ' '", f" {w} ")
                      for w in STOPWORDS)
    punct = " + ".join(occ("text", p) for p in [".", ",", "!", "?"])
    return f"""
WITH f AS (
  SELECT doc_id,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST({occ('text', ' ')} + 1 AS DOUBLE) AS n_words,
         CAST({stop} AS DOUBLE) AS stop_hits,
         CAST({punct} AS DOUBLE) AS n_punct
  FROM documents
)
SELECT doc_id,
       CAST(n_chars AS BIGINT) AS n_chars_m,
       CAST(n_words AS BIGINT) AS n_words,
       round(stop_hits / n_words, 4) AS stop_ratio,
       round(
         least(n_words / 100.0, 1.0) * 0.4
         + least(stop_hits / n_words * 5.0, 1.0) * 0.3
         + (CASE WHEN n_chars / n_words BETWEEN 3.0 AND 10.0
                 THEN 1.0 ELSE 0.0 END) * 0.2
         + least(n_punct / n_chars * 20.0, 1.0) * 0.1, 4) AS quality
FROM f ORDER BY doc_id
"""


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokens + regex (BPE-ish) tokens per doc + corpus
    totals by language."""
    doc = _docs_cheap(spark, sf_dir)
    per_doc = doc.select(
        "doc_id", "lang",
        (_occurrences(F.col("text"), " ") + 1).alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(TOKEN_REGEX), F.lit(0)))
        .cast("long").alias("re_tokens"))
    return (per_doc.groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("ws_tokens").alias("ws_tokens"),
                 F.sum("re_tokens").alias("re_tokens"))
            .orderBy("lang"))


def token_count_sql() -> str:
    return f"""
WITH t AS (
  SELECT doc_id, lang,
         (length(text) - length(replace(text, ' ', ''))) + 1 AS ws_tokens,
         length(regexp_extract_all(text, '{TOKEN_REGEX}')) AS re_tokens
  FROM documents
)
SELECT lang, count(*) AS n_docs,
       CAST(sum(ws_tokens) AS BIGINT) AS ws_tokens,
       CAST(sum(re_tokens) AS BIGINT) AS re_tokens
FROM t GROUP BY lang ORDER BY lang
"""


FINGERPRINT_K = 8   # char-shingle width
FINGERPRINT_STRIDE = 4  # probe every 4th position (winnowing density)


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-hash document fingerprint: minimum md5 over the 8-char
    shingles at every STRIDE-th position (rolling-window content
    fingerprint; winnowing's min rule with a strided probe set —
    stride 4 keeps windows overlapping, so any two documents sharing
    an aligned run still collide, at 1/4 the hash cost of probing
    every position). md5 hex compares identically in both engines.

    Shape: explode the probe positions and take the min through the
    partial (map-side) aggregate — the md5s stream straight into the
    per-doc min without materializing a per-doc array, where the
    previous ``array_min(transform(...))`` built the full md5 array
    per row inside an interpreted higher-order function (guide §4.1:
    prefer codegen'd operators over HOF lambdas for bulk work;
    measured 9.5s → 5.1s at sf1.0 before the scan spread, no change
    to the min over the identical probe set). The explode never
    re-shuffles text: positions expand and aggregate inside one
    whole-stage-codegen pipeline; only (doc_id, min) crosses the
    exchange."""
    doc = _docs(spark, sf_dir).filter(F.length("text") >= FINGERPRINT_K)
    pos = doc.select(
        "doc_id", "text",
        F.explode(F.sequence(
            F.lit(1), F.length("text") - F.lit(FINGERPRINT_K - 1),
            F.lit(FINGERPRINT_STRIDE))).alias("i"))
    hashed = pos.select(
        "doc_id",
        F.md5(F.substring(F.col("text"), F.col("i"), FINGERPRINT_K)
              .cast("binary")).alias("h"))
    return (hashed.groupBy("doc_id")
            .agg(F.min("h").alias("fingerprint"))
            .orderBy("doc_id"))


def doc_fingerprint_sql() -> str:
    # DuckDB's generate_series only takes constants, so the position
    # domain is built from row_number over lineitem (always longer than
    # the longest document) and pre-filtered to max(length(text)) and
    # to the strided probe positions.
    return f"""
WITH nums AS (
  SELECT i FROM (SELECT row_number() OVER () AS i FROM lineitem)
  WHERE i <= (SELECT max(length(text)) FROM documents)
    AND (i - 1) % {FINGERPRINT_STRIDE} = 0
)
SELECT doc_id,
       min(md5(substr(text, CAST(i AS INT), {FINGERPRINT_K})))
         AS fingerprint
FROM documents, nums
WHERE length(text) >= {FINGERPRINT_K}
  AND i <= length(text) - {FINGERPRINT_K - 1}
GROUP BY doc_id ORDER BY doc_id
"""


def domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-composition report: per-source document/character counts
    and character share — the mix table a webtext pipeline rebalances
    training data against (per-domain caps, up/down-sampling). Exact
    long sums; the share is one double division so both engines agree
    bit-for-bit. One partial-agg shuffle on source + a 1-row broadcast
    total — corpus-size independent width at 100 TB. The tiny grouped
    intermediate is cached (with_global_agg), so the documents scan
    and the groupBy run ONCE instead of once per crossJoin side."""
    doc = _docs_cheap(spark, sf_dir)
    per = doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"))
    return (with_global_agg(per,
                            F.sum("total_chars").alias("all_chars"))
            .select("source", "n_docs", "total_chars",
                    F.round(F.col("total_chars")
                            / F.col("all_chars"), 6).alias("char_share"))
            .orderBy(F.desc("n_docs"), "source"))


DOMAIN_MIX_SQL = """
WITH per AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS total_chars
  FROM documents GROUP BY source
)
SELECT source, n_docs, total_chars,
       round(CAST(total_chars AS DOUBLE)
             / (SELECT CAST(sum(total_chars) AS DOUBLE) FROM per), 6)
         AS char_share
FROM per ORDER BY n_docs DESC, source
"""


# PII patterns pinned to constructs whose semantics match in Java regex
# and DuckDB's RE2: literal classes, +, bounded repetition.
PII_EMAIL_RE = "[a-z0-9]+@[a-z0-9]+\\.com"
PII_PHONE_RE = "\\+1-555-[0-9]{4}"


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over the documents table: count and mask email /
    phone shapes. The synthetic corpus text contains none, so (like
    f2's URL derivation) a deterministic PII-bearing suffix is appended
    from doc_id with the SAME expression on both sides — the scrub
    mechanics (match-count + masked-text hash) are then non-vacuous.
    Pure JVM column algebra; at 100 TB this is one narrow projection,
    no shuffle."""
    doc = _docs_cheap(spark, sf_dir)
    aug = F.concat(
        F.col("text"), F.lit(" contact user"),
        F.col("doc_id").cast("string"), F.lit("@mail"),
        (F.col("doc_id") % 7).cast("string"), F.lit(".com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" now"))
    scrubbed = F.regexp_replace(
        F.regexp_replace(aug, PII_EMAIL_RE, "<EMAIL>"),
        PII_PHONE_RE, "<PHONE>")
    return (doc.select(
        "doc_id",
        F.regexp_count(aug, F.lit(PII_EMAIL_RE)).cast("long")
        .alias("n_emails"),
        F.regexp_count(aug, F.lit(PII_PHONE_RE)).cast("long")
        .alias("n_phones"),
        F.md5(scrubbed).alias("scrubbed_hash"))
        .orderBy("doc_id"))


PII_SCRUB_SQL = f"""
WITH a AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@mail' || CAST(doc_id % 7 AS VARCHAR)
              || '.com or +1-555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              || ' now' AS aug
  FROM documents
)
SELECT doc_id,
       CAST(length(regexp_extract_all(aug, '{PII_EMAIL_RE}'))
            AS BIGINT) AS n_emails,
       CAST(length(regexp_extract_all(aug, '{PII_PHONE_RE}'))
            AS BIGINT) AS n_phones,
       md5(regexp_replace(regexp_replace(aug, '{PII_EMAIL_RE}',
                                         '<EMAIL>', 'g'),
                          '{PII_PHONE_RE}', '<PHONE>', 'g'))
         AS scrubbed_hash
FROM a ORDER BY doc_id
"""


QUERIES = {
    "lang_id": lang_id,
    "quality_score": quality_score,
    "token_count": token_count,
    "doc_fingerprint": doc_fingerprint,
    "domain_mix": domain_mix,
    "pii_scrub": pii_scrub,
}
ORACLES = {
    "lang_id": lang_id_sql(),
    "quality_score": quality_score_sql(),
    "token_count": token_count_sql(),
    "doc_fingerprint": doc_fingerprint_sql(),
    "domain_mix": DOMAIN_MIX_SQL,
    "pii_scrub": PII_SCRUB_SQL,
}
