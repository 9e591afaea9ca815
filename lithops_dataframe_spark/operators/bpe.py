"""Distributed BPE tokenizer training (byte-pair encoding merge learning).

Upgrades the single merge-step pair count (``bpe_top_pairs``, round 3) to
the real TRAINING LOOP: per iteration, count adjacent symbol pairs over
the word-frequency table, adopt the most frequent pair as a merge rule,
and apply it corpus-wide with BPE's greedy left-to-right semantics —
exactly the algorithm of Sennrich et al.'s subword-NMT trainer, expressed
relationally.

Scale design: training runs on the DISTINCT-WORD frequency table, not the
raw corpus — after the initial word count (one shuffle over the corpus),
every iteration's cost is proportional to the vocabulary (bounded, here
top ``max_words``), independent of corpus size. Each iteration is two
wid-partitioned window exchanges + one aggregate over (word, pos, sym)
rows — all hash-partitioned on the word, no driver-side data paths except the single
argmax row per iteration (the k-means-centroid pattern).

Greedy left-to-right application: matches at consecutive positions
overlap (they share a symbol), so within each maximal RUN of consecutive
match positions only every other one merges — selected relationally as
``row_number within run`` even (the run id is ``pos - row_number over
pos``). This reproduces sequential non-overlapping replacement exactly
(e.g. merging (A,A) in "A A A" yields "AA A"), and the same windowed SQL
replays in DuckDB, so every learned rule is value-hash-verifiable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def word_frequency_table(
    docs: DataFrame, text_col: str = "text", *, max_words: int = 2000
) -> DataFrame:
    """(word, cnt): lowercase alphanumeric tokens, top ``max_words`` by
    count (ties broken by word asc — keeps the cap deterministic)."""
    words = docs.select(
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")).alias("word")
    ).filter(F.length("word") > 0)
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    return counts.orderBy(F.col("cnt").desc(), F.col("word").asc()).limit(max_words)


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    *,
    n_merges: int = 6,
    max_words: int = 2000,
    return_tokens: bool = False,
):
    """Learn ``n_merges`` BPE merge rules; returns one row per rule:
    (step, left_sym, right_sym, merged, pair_count).

    ``return_tokens=True`` additionally returns the post-merge token
    table ``(wid, cnt, pos, sym)`` — the ENCODED vocabulary. Encoding a
    corpus with a trained BPE is this table joined back to the corpus's
    word occurrences: the merge loop runs once over the bounded
    vocabulary, never over the corpus (same 100 TB argument as
    training)."""
    spark = docs.sparkSession
    vocab = word_frequency_table(docs, text_col, max_words=max_words)
    # initial symbols: the word's characters (split('') is fine here —
    # words are short; the CDC O(p)-substring trap doesn't bite)
    tok = vocab.select(
        F.col("word").alias("wid"),
        "cnt",
        F.posexplode(F.split("word", "")).alias("pos0", "sym"),
    ).select("wid", "cnt", (F.col("pos0") + 1).alias("pos"), "sym")
    # checkpoint the initial token table ONCE: every iteration issues an
    # action (the argmax collect), and without this barrier each one
    # replays the corpus-wide word count upstream of it. LAZY checkpoint
    # (r12): the first argmax collect materializes it anyway, so an eager
    # checkpoint was a whole extra job per call for no reuse gain.
    tok = tok.localCheckpoint(eager=False)

    merges: list[tuple] = []
    w_pos = Window.partitionBy("wid").orderBy("pos")
    for step in range(n_merges):
        # one window pass attaches the successor symbol — the pair-count
        # aggregate and the match flags both read it, so each iteration
        # costs two wid-partitioned exchanges + one aggregate, no
        # self-joins (the join formulation measured ~4x slower: five
        # shuffles per round on a frame this shape is pure scheduling)
        tok2 = tok.withColumn("nxt", F.lead("sym").over(w_pos))
        top = (
            tok2.filter(F.col("nxt").isNotNull())
            .groupBy(F.col("sym").alias("s1"), F.col("nxt").alias("s2"))
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.col("c").desc(), F.col("s1").asc(), F.col("s2").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        s1, s2, c = top[0]["s1"], top[0]["s2"], int(top[0]["c"])
        merges.append((step, s1, s2, s1 + s2, c))

        # greedy left-to-right selection via run parity, windows only:
        # consecutive match positions overlap (they share a symbol), so
        # within each maximal run of consecutive matches every other one
        # merges. run id = pos - running-match-count; rank within
        # (wid, run) gives the parity.
        m = (F.col("sym") == s1) & (F.col("nxt") == s2)
        flagged = tok2.withColumn("m", m.cast("int")).withColumn(
            "run",
            F.when(m, F.col("pos") - F.sum(F.col("m")).over(
                w_pos.rowsBetween(Window.unboundedPreceding, 0)
            )),
        )
        w_run = Window.partitionBy("wid", "run").orderBy("pos")
        flagged = flagged.withColumn(
            "keep", m & ((F.row_number().over(w_run) - 1) % 2 == 0)
        ).withColumn("k_prev", F.lag("keep").over(w_pos))
        tok = (
            flagged.filter(~F.coalesce(F.col("k_prev"), F.lit(False)))
            .select(
                "wid",
                "cnt",
                F.row_number().over(w_pos).alias("pos"),
                F.when(F.col("keep"), F.lit(s1 + s2)).otherwise(F.col("sym")).alias("sym"),
            )
        )
        # per-iteration lineage truncation: the frame is ~16k rows, so the
        # checkpoint is cheap, and it stops both plan growth AND the
        # re-execution of prior rounds by the next argmax collect. Lazy:
        # the NEXT round's argmax (or the caller's first action on the
        # returned tokens) materializes it — one job per round, not two
        # (r12, guide §1.2).
        tok = tok.localCheckpoint(eager=False)

    from lithops_dataframe_spark.operators.util import values_frame

    merges_df = values_frame(
        spark, merges, "step int, left_sym string, right_sym string, merged string, pair_count bigint"
    )
    if return_tokens:
        return merges_df, tok
    return merges_df
