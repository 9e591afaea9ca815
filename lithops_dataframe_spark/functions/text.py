"""Text-analysis primitives for large-scale corpus pipelines (SURVEY §2.11).

Reference context: the reference has no text functions — all scalar work is
whatever the user's pandas closure does inside ``apply`` (core.py:253-256).
This module supplies the north-star text surface, every primitive as a
JVM-side expression (no Python UDFs in the hot path) with a DuckDB SQL twin
generated from the same constants, so every operator is hash-checkable.

Primitives:
- tokenization: whitespace + BPE-ish regex ([A-Za-z]+ | digits | single
  punctuation) — the regex is RE2/Java-portable by construction;
- language-ID: stopword-profile voting over fixed per-language lists,
  deterministic argmax with fixed branch order;
- quality scoring: length/punctuation/digit/stopword/uniqueness ratios
  combined into a fixed-weight score;
- fingerprinting: mod-p winnowing over hashed word n-grams (the
  Rabin-Karp/winnowing family: hash every n-gram, keep h % W == 0 — a
  position-independent fingerprint set selection).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from lithops_dataframe_spark.functions import hashing as H

#: BPE-ish token regex — letters run | digit run | single other non-space.
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

#: Per-language stopword profiles (fixed vocab constants; branch order in
#: language_id is the sorted key order of this dict).
STOPWORDS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "zu", "in", "ein", "ist"],
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "es"],
    "fr": ["le", "la", "de", "et", "que", "en", "un", "est"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2", "you3", "wo3", "ta1"],
}
LANGS = sorted(STOPWORDS)

#: Winnowing parameters: word n-gram size and the mod-W selection divisor.
WINNOW_N = 3
WINNOW_W = 8

#: Quality-score weights: (tokens per char, uniq ratio, stopword ratio,
#: alpha ratio) — fixed constants shared with the SQL twin.
QW_TOK, QW_UNIQ, QW_STOP, QW_ALPHA = 0.2, 0.3, 0.2, 0.3


# ---------------------------------------------------------------------------
# tokenization
# ---------------------------------------------------------------------------
def ws_tokens(text: Column) -> Column:
    """Whitespace (single-space) tokens — matches string_split in DuckDB."""
    return F.split(text, " ")


def ws_tokens_sql(expr: str) -> str:
    return f"string_split({expr}, ' ')"


def bpe_ish_tokens(text: Column) -> Column:
    """BPE-ish tokens: letter runs, digit runs, single punctuation marks."""
    return F.regexp_extract_all(text, F.lit(TOKEN_RE), 0)


def bpe_ish_tokens_sql(expr: str) -> str:
    return f"regexp_extract_all({expr}, '{TOKEN_RE}')"


# ---------------------------------------------------------------------------
# counting / ratio features
# ---------------------------------------------------------------------------
def stopword_hits(tokens: Column, words: list[str]) -> Column:
    """Occurrence count (with multiplicity) of `words` in a token array."""
    return F.aggregate(
        tokens,
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.when(t.isin(*words), F.lit(1)).otherwise(F.lit(0)),
    )


def stopword_hits_sql(tokens_expr: str, words: list[str]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return (
        f"list_sum(list_transform({tokens_expr}, "
        f"t -> CASE WHEN t IN ({lst}) THEN 1 ELSE 0 END))::BIGINT"
    )


def punct_chars(text: Column) -> Column:
    """Count of non-alphanumeric, non-space characters."""
    return F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))


def punct_chars_sql(expr: str) -> str:
    return f"length(regexp_replace({expr}, '[A-Za-z0-9\\s]', '', 'g'))"


def digit_chars(text: Column) -> Column:
    return F.length(F.regexp_replace(text, r"[^0-9]", ""))


def digit_chars_sql(expr: str) -> str:
    return f"length(regexp_replace({expr}, '[^0-9]', '', 'g'))"


def alpha_chars(text: Column) -> Column:
    return F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))


def alpha_chars_sql(expr: str) -> str:
    return f"length(regexp_replace({expr}, '[^A-Za-z]', '', 'g'))"


# ---------------------------------------------------------------------------
# language identification (stopword-profile voting)
# ---------------------------------------------------------------------------
def lang_scores(tokens: Column) -> dict[str, Column]:
    return {lang: stopword_hits(tokens, STOPWORDS[lang]) for lang in LANGS}


def language_id(tokens: Column) -> Column:
    """Predicted language: argmax stopword hits, ties → first in sorted
    lang order; zero hits everywhere → 'und'."""
    scores = lang_scores(tokens)
    pred = F.lit("und")
    # Build the CASE chain in reverse so earlier langs win ties.
    for lang in reversed(LANGS):
        cond = (scores[lang] > 0)
        for other in LANGS:
            if other != lang:
                cond = cond & (scores[lang] >= scores[other])
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    return pred


def language_id_sql(tokens_expr: str) -> str:
    score = {lang: stopword_hits_sql(tokens_expr, STOPWORDS[lang]) for lang in LANGS}
    branches = []
    for lang in LANGS:
        conds = [f"{score[lang]} > 0"] + [
            f"{score[lang]} >= {score[o]}" for o in LANGS if o != lang
        ]
        branches.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "(CASE " + " ".join(branches) + " ELSE 'und' END)"


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------
def quality_features(text: Column) -> dict[str, Column]:
    """Ratio features in float64; n_chars>0 assumed (guard with nullif)."""
    toks = ws_tokens(text)
    n_chars = F.length(text).cast("double")
    n_toks = F.size(toks).cast("double")
    all_stop = sorted({w for ws in STOPWORDS.values() for w in ws})
    return {
        "n_chars": F.length(text).cast("long"),
        "n_tokens": F.size(toks).cast("long"),
        "mean_token_len": F.round((n_chars - (n_toks - 1)) / n_toks, 6),
        "uniq_ratio": F.round(F.size(F.array_distinct(toks)) / n_toks, 6),
        "stop_ratio": F.round(stopword_hits(toks, all_stop) / n_toks, 6),
        "punct_ratio": F.round(punct_chars(text) / n_chars, 6),
        "digit_ratio": F.round(digit_chars(text) / n_chars, 6),
        "alpha_ratio": F.round(alpha_chars(text) / n_chars, 6),
    }


def quality_score(text: Column) -> Column:
    """Fixed-weight composite in [0, ~1]: rewards density of real words."""
    toks = ws_tokens(text)
    n_chars = F.length(text).cast("double")
    n_toks = F.size(toks).cast("double")
    all_stop = sorted({w for ws in STOPWORDS.values() for w in ws})
    tok_per_char = F.least(n_toks / n_chars * F.lit(6.0), F.lit(1.0))
    uniq = F.size(F.array_distinct(toks)) / n_toks
    stop = F.least(stopword_hits(toks, all_stop) / n_toks * F.lit(4.0), F.lit(1.0))
    alpha = alpha_chars(text) / n_chars
    return F.round(
        F.lit(QW_TOK) * tok_per_char + F.lit(QW_UNIQ) * uniq + F.lit(QW_STOP) * stop + F.lit(QW_ALPHA) * alpha,
        6,
    )


def quality_score_sql(expr: str) -> str:
    toks = ws_tokens_sql(expr)
    all_stop = sorted({w for ws in STOPWORDS.values() for w in ws})
    n_chars = f"length({expr})::DOUBLE"
    n_toks = f"len({toks})::DOUBLE"
    tok_per_char = f"least({n_toks} / {n_chars} * 6.0, 1.0)"
    uniq = f"(len(list_distinct({toks}))::DOUBLE / {n_toks})"
    stop = f"least({stopword_hits_sql(toks, all_stop)}::DOUBLE / {n_toks} * 4.0, 1.0)"
    alpha = f"({alpha_chars_sql(expr)}::DOUBLE / {n_chars})"
    return (
        f"ROUND({QW_TOK} * {tok_per_char} + {QW_UNIQ} * {uniq} "
        f"+ {QW_STOP} * {stop} + {QW_ALPHA} * {alpha}, 6)"
    )


# ---------------------------------------------------------------------------
# hashed TF-IDF vectorization (HashingTF + IDF analog)
# ---------------------------------------------------------------------------
#: hashing-trick dimensionality for TF vectors.
TF_BUCKETS = 64


def tf_buckets(tokens: Column) -> Column:
    """Map each token to its hash bucket (token_hash mod TF_BUCKETS) —
    the hashing trick: fixed dimensionality, no vocabulary state."""
    return F.transform(tokens, lambda t: H.token_hash(t) % TF_BUCKETS)


def tf_buckets_sql(tokens_expr: str) -> str:
    return f"list_transform({tokens_expr}, t -> {H.token_hash_sql('t')} % {TF_BUCKETS})"


# ---------------------------------------------------------------------------
# document fingerprinting (mod-p winnowing over hashed word n-grams)
# ---------------------------------------------------------------------------
def winnow_fingerprints(text: Column) -> Column:
    """Distinct selected fingerprints: hash each word WINNOW_N-gram, keep
    h % WINNOW_W == 0. Position-independent content fingerprint set."""
    grams = H.word_shingles(text, WINNOW_N)
    hashes = F.transform(grams, H.token_hash)
    return F.array_distinct(F.filter(hashes, lambda h: h % WINNOW_W == 0))


def winnow_fingerprints_sql(expr: str) -> str:
    grams = H.word_shingles_sql(expr, WINNOW_N)
    return (
        f"list_distinct(list_filter(list_transform({grams}, "
        f"s -> {H.token_hash_sql('s')}), h -> h % {WINNOW_W} = 0))"
    )
