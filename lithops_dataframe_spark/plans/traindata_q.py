"""Training-data plumbing queries: a true Python UDTF (table function with
LATERAL correlation — the one UDF shape §2.9 still lacked a native
instance of) and the deterministic train/val/test splitter every corpus
pipeline needs.

Reference basis: the reference's only UDF surface is row-wise
``apply(axis=1)`` (/root/reference/dataframe/core.py:171-262); UDTF-shaped
row explosion and dataset splitting are north-star pipeline additions.

Scale notes:
- The UDTF runs arrow-batched (``useArrow=True``) and is partition-local —
  no shuffle until the final small aggregate.
- The splitter is a pure narrow map (md5 of the key, mod 10) — zero
  shuffle to assign, one tiny exchange for the audit counts. At 100 TB the
  assignment cost is the scan itself; the same expression works as a
  partition column for a sharded write. Deterministic-by-key means
  re-runs and incremental appends land rows in the same split (no RNG,
  no seed state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lithops_dataframe_spark.catalog import load_table
from lithops_dataframe_spark.plans.registry import register


@register(
    "udtf_long_token_index",
    oracle="""
    WITH toks AS (
        SELECT doc_id, i - 1 AS pos, words[i] AS token
        FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
             LATERAL (SELECT unnest(range(1, len(words) + 1)) AS i)
    )
    SELECT token,
           COUNT(DISTINCT doc_id) AS n_docs,
           COUNT(*) AS n_occ,
           MIN(pos) AS first_pos
    FROM toks
    WHERE length(token) >= 5
    GROUP BY token
    """,
)
def udtf_long_token_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark ≥3.5 table function) exploding each document
    into (pos, token) rows via LATERAL correlation, aggregated into an
    index of tokens of length ≥5 (the fixture vocabulary is short word
    soup). The UDTF is arrow-batched and stateless; the lateral join is
    partition-local (no shuffle before the aggregate)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string", useArrow=True)
    class LongTokens:
        def eval(self, text: str):
            if text is None:
                return
            for i, tok in enumerate(text.split(" ")):
                if len(tok) >= 5:
                    yield i, tok

    spark.udtf.register("long_tokens", LongTokens)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("docs_udtf")
    return spark.sql(
        """
        SELECT t.token,
               COUNT(DISTINCT d.doc_id) AS n_docs,
               COUNT(*) AS n_occ,
               MIN(t.pos) AS first_pos
        FROM docs_udtf d, LATERAL long_tokens(d.text) t
        GROUP BY t.token
        """
    )


@register(
    "split_train_val_test",
    oracle="""
    WITH assigned AS (
        SELECT lang,
               CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val' ELSE 'test' END AS split,
               n_chars
        FROM (SELECT lang, n_chars,
                     ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10 AS b
              FROM documents)
    )
    SELECT split, lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM assigned GROUP BY 1, 2
    """,
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by key hash
    (md5 of doc_id — identical on both engines, see functions/hashing.py
    rationale), audited as per-(split, lang) doc and char counts.

    The assignment column is a narrow map usable directly as a
    ``partitionBy`` write key; hash-by-key (not row position) keeps the
    split stable under repartitioning, re-runs, and incremental appends."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast(
        "long"
    ) % 10
    split = (
        F.when(bucket < 8, "train").when(bucket == 8, "val").otherwise("test")
    )
    return (
        docs.withColumn("split", split)
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


# per-language keep rates (per-mille) for the rebalance: downsample the
# dominant languages, keep the tail intact — the standard corpus-mixing move.
_KEEP_PERMILLE = {"en": 300, "de": 600, "fr": 600, "es": 800, "zh": 1000}
_DEFAULT_PERMILLE = 1000


@register(
    "split_stratified_rebalance",
    oracle=f"""
    WITH hashed AS (
        SELECT lang, n_chars,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000 AS h
        FROM documents
    ),
    flagged AS (
        SELECT lang, n_chars,
               CASE lang
                   {' '.join(f"WHEN '{lang}' THEN CASE WHEN h < {pm} THEN 1 ELSE 0 END"
                             for lang, pm in _KEEP_PERMILLE.items())}
                   ELSE CASE WHEN h < {_DEFAULT_PERMILLE} THEN 1 ELSE 0 END
               END AS kept
        FROM hashed
    )
    SELECT lang,
           COUNT(*) AS n_total,
           CAST(SUM(kept) AS BIGINT) AS n_kept,
           CAST(SUM(kept * n_chars) AS BIGINT) AS kept_chars
    FROM flagged GROUP BY lang
    """,
)
def split_stratified_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified downsampling (corpus rebalancing): each
    language keeps ``_KEEP_PERMILLE[lang]``/1000 of its documents, chosen
    by key hash (md5(doc_id) mod 1000 < rate), not RNG — so re-runs,
    repartitioning, and incremental appends keep/drop the SAME documents
    (the property ``df.sampleBy`` cannot give you), and the audit below is
    hash-checkable cross-engine.

    Scale shape: one narrow map to flag, one aggregate to audit — the
    flag column doubles as the filter for the actual write path. Skewed
    language distribution costs nothing: the hash is uniform within each
    stratum by construction."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast(
        "long"
    ) % 1000
    rate = F.lit(_DEFAULT_PERMILLE)
    for lang, pm in _KEEP_PERMILLE.items():
        rate = F.when(F.col("lang") == lang, F.lit(pm)).otherwise(rate)
    kept = F.when(h < rate, F.lit(1)).otherwise(F.lit(0))
    return (
        docs.withColumn("kept", kept)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum("kept").alias("n_kept"),
            F.sum(F.col("kept") * F.col("n_chars")).alias("kept_chars"),
        )
    )
