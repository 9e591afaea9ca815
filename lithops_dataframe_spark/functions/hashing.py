"""Deterministic hashing primitives shared by the dedup/similarity operators
AND their DuckDB oracles.

Everything here is engine-portable by construction: the only hash source is
md5 (identical in Spark and DuckDB), mapped to int64 via a 15-hex-digit
prefix (60 bits, fits signed 64), then mixed with fixed universal-hash
constants modulo the Mersenne prime 2^31-1. For every Spark expression
builder there is a twin SQL-string builder generated from the SAME
constants, so operator output and oracle output are bit-identical —
MinHash/SimHash/LSH become hash-checkable, not rows-only.

Arithmetic safety: token hash is reduced mod P (< 2^31) before a*h+b with
a,b < 2^31 → products < 2^62, no 64-bit overflow on either engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Mersenne prime 2^31 - 1.
P = 2_147_483_647

#: Fixed universal-hash constants (k=16 permutations for MinHash).
#: Chosen once, arbitrary odd/nonzero values < P; order matters (signature
#: component i uses pair i on both engines).
MINHASH_A = [
    1_000_003, 1_193_891, 1_299_709, 1_400_305,
    1_523_659, 1_687_931, 1_777_777, 1_894_439,
    2_011_073, 29_383_741, 47_055_833, 61_333_331,
    77_777_777, 91_815_541, 104_729_87, 119_126_843,
]
MINHASH_B = [
    12_345, 67_891, 24_680, 13_579,
    98_765, 55_555, 31_415, 27_182,
    16_180, 14_142, 17_320, 22_360,
    26_457, 30_000, 33_166, 36_055,
]
MINHASH_K = len(MINHASH_A)


# ---------------------------------------------------------------------------
# token → int64 (both engines)
# ---------------------------------------------------------------------------
def token_hash(col: Column) -> Column:
    """md5-prefix hash of a string → int64 in [0, 2^60), reduced mod P."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long") % P


def token_hash_sql(expr: str) -> str:
    """DuckDB twin of :func:`token_hash`."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT % {P})"


def token_hash60(col: Column) -> Column:
    """md5-prefix hash → 60-bit value (for SimHash bit sampling)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def token_hash60_sql(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


# ---------------------------------------------------------------------------
# word shingles
# ---------------------------------------------------------------------------
def word_shingles(text: Column, n: int = 2) -> Column:
    """Distinct word n-gram shingles of a whitespace-tokenized text column.

    NULL text → NULL shingles on BOTH engines (r10 edge row): the
    previous short-text fallback ran ``concat_ws`` over the NULL token
    array, which SKIPS the NULL and produced ``[""]`` — identical to an
    empty document's shingles — so a fetch-failure row near-dup-paired
    with every empty document while DuckDB's NULL propagation excluded
    it. A missing document has no similarity evidence; NULL signatures
    fail every band/jaccard predicate identically on both engines.

    Built by chained ``zip_with`` over n shifted slices, NOT
    ``transform(sequence, i -> element_at(words, i+j))`` (r12 long-doc
    edge row): Spark evaluates a lambda-body reference to the inline
    ``split`` subtree PER ELEMENT — O(len²) per document, measured 60×
    slower on one 40k-char document (6.0 s → 0.1 s). The slice/zip form
    evaluates the split n+1 times per row and is linear in document
    length; output is identical (same concat_ws join, same distinct)."""
    words = F.split(text, " ")
    if n == 1:
        return F.array_distinct(words)
    m = F.size(words)
    ln = m - (n - 1)
    acc = F.slice(words, F.lit(1), ln)
    for j in range(1, n):
        acc = F.zip_with(
            acc,
            F.slice(words, F.lit(1 + j), ln),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return F.when(m >= n, F.array_distinct(acc)).otherwise(
        F.when(text.isNotNull(), F.array(F.concat_ws(" ", words)))
    )


def word_shingles_sql(expr: str, n: int = 2) -> str:
    """DuckDB twin of :func:`word_shingles` (1-based list indexing).

    The gram body runs inside a ``list_transform([words], ws -> ...)``
    LET-BINDING (r12 long-doc edge row): a bare ``string_split(expr)[i]``
    inside the per-index lambda re-splits the whole document per element
    — O(len²), measured 470× slower on one 40k-char document (4.2 s →
    0.009 s, values identical). Same trap and same cure as the Spark
    side (see :func:`word_shingles`) and the CDC chunker's wrap-in-array
    let-binding."""
    if n == 1:
        return f"list_distinct(string_split({expr}, ' '))"
    words = f"string_split({expr}, ' ')"
    gram = " || ' ' || ".join(f"ws[i+{j}]" for j in range(n))
    return (
        f"(CASE WHEN len({words}) >= {n} THEN "
        f"list_transform([{words}], ws -> "
        f"list_distinct(list_transform(range(1, len(ws) - {n - 2}), i -> {gram})))[1] "
        f"WHEN {expr} IS NOT NULL THEN [array_to_string({words}, ' ')] "
        f"ELSE NULL END)"
    )


# ---------------------------------------------------------------------------
# MinHash signature (k components) + LSH bands
# ---------------------------------------------------------------------------
def minhash_component(shingles: Column, i: int) -> Column:
    a, b = MINHASH_A[i], MINHASH_B[i]
    return F.array_min(F.transform(shingles, lambda s: (F.lit(a) * (token_hash(s)) + F.lit(b)) % P))


def minhash_component_from_hashes(hashes: Column, i: int) -> Column:
    """Component i over PRE-HASHED shingles (token_hash already applied)."""
    a, b = MINHASH_A[i], MINHASH_B[i]
    return F.array_min(F.transform(hashes, lambda h: (F.lit(a) * h + F.lit(b)) % P))


def minhash_signature(shingles: Column) -> Column:
    """Array of MINHASH_K minhash values for a shingle-array column."""
    return F.array(*[minhash_component(shingles, i) for i in range(MINHASH_K)])


def minhash_signature_from_hashes(hashes: Column) -> Column:
    """Signature over a pre-hashed shingle array — md5 runs ONCE per
    shingle (in the projection that built `hashes`) instead of once per
    component; the affine (a*h+b)%P mixes are integer-cheap.

    Identical output to :func:`minhash_signature` by construction."""
    return F.array(*[minhash_component_from_hashes(hashes, i) for i in range(MINHASH_K)])


def minhash_signature_sql(shingles_expr: str) -> str:
    """k-component signature; the shingle array AND the per-shingle md5
    hashes are let-bound once (r12): the naive form re-evaluated the
    whole shingle construction k=16 times and the md5 k times per
    shingle — on long documents that multiplied the O(len²) shingle
    trap by 16. Mirrors the Spark side's ``__hashes`` materialization
    (operators/dedup.py::with_minhash); values are identical."""
    comps = ", ".join(
        f"list_min(list_transform(hs, h -> ({a} * h + {b}) % {P}))"
        for a, b in zip(MINHASH_A, MINHASH_B)
    )
    hashes = f"list_transform(sh, s -> {token_hash_sql('s')})"
    return (
        f"list_transform([{shingles_expr}], sh -> "
        f"list_transform([{hashes}], hs -> [{comps}])[1])[1]"
    )


def band_signatures(sig: Column, bands: int) -> Column:
    """Split a k-component signature into `bands` md5 band keys.

    Returns array of structs (band_idx, band_key); band key is the md5 of the
    comma-joined slice — a compact join key for bucketing.
    """
    r = MINHASH_K // bands
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("band_idx"),
                F.md5(F.concat_ws(",", *[F.element_at(sig, j * r + i + 1).cast("string") for i in range(r)])).alias(
                    "band_key"
                ),
            )
            for j in range(bands)
        ]
    )


def band_signatures_sql(sig_expr: str, bands: int) -> list[str]:
    """DuckDB twins: list of band_key SQL expressions, index j in 0..bands-1."""
    r = MINHASH_K // bands
    out = []
    for j in range(bands):
        joined = " || ',' || ".join(f"CAST({sig_expr}[{j * r + i + 1}] AS VARCHAR)" for i in range(r))
        out.append(f"md5({joined})")
    return out


# ---------------------------------------------------------------------------
# SimHash (60-bit, distinct-token set)
# ---------------------------------------------------------------------------
SIMHASH_BITS = 60


def simhash(tokens: Column) -> Column:
    """60-bit SimHash of a distinct-token array column (60 bits = the md5
    15-hex-digit prefix, the widest value both engines parse identically
    into int64).

    Bit j of the result is 1 iff the majority of token hashes have bit j set
    (strictly positive vote sum; zero votes → 0 on both engines).
    """
    return simhash_from_hashes(F.transform(tokens, token_hash60))


def simhash_votes(hashes: Column) -> Column:
    """Per-bit vote array (length SIMHASH_BITS) over a pre-hashed token
    array, in ONE pass: each token hash expands to its ±1 bit-vote vector,
    folded into a single 60-long accumulator via ``zip_with``.

    The earlier form ran 60 separate ``F.aggregate`` calls (one per bit),
    re-traversing the token array 60× and bloating the Catalyst tree —
    the single-fold form measured 2–4× faster end-to-end at sf0.1 with
    bit-identical output. Materialize this in its own projection, then
    apply :func:`simhash_pack` (60 ``element_at`` reads of one column)."""
    bits = F.transform(
        hashes,
        lambda h: F.array(*[(F.shiftright(h, j) % 2) * 2 - 1 for j in range(SIMHASH_BITS)]),
    )
    return F.aggregate(
        bits,
        F.array_repeat(F.lit(0).cast("long"), SIMHASH_BITS),
        lambda acc, b: F.zip_with(acc, b, lambda a, x: a + x),
    )


def simhash_pack(votes: Column) -> Column:
    """Pack a vote array into the 60-bit fingerprint (bit j set iff vote
    strictly positive — matching :func:`simhash_sql`)."""
    out = F.lit(0).cast("long")
    for j in range(SIMHASH_BITS):
        out = out + F.when(F.element_at(votes, j + 1) > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return out


def simhash_from_hashes(hashes: Column) -> Column:
    """SimHash over a pre-hashed token array (single-expression form).

    Prefer the two-projection ``simhash_votes`` → ``simhash_pack`` split
    when building a frame column: it materializes the vote array once
    instead of relying on subexpression elimination across the 60 packed
    reads."""
    return simhash_pack(simhash_votes(hashes))


def simhash_sql(tokens_expr: str) -> str:
    terms = []
    for j in range(SIMHASH_BITS):
        vote = (
            f"list_sum(list_transform({tokens_expr}, "
            f"t -> (({token_hash60_sql('t')} >> {j}) % 2) * 2 - 1))"
        )
        terms.append(f"(CASE WHEN {vote} > 0 THEN {1 << j} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"
