"""Adversarial micro-fixture builder (VERDICT r7 task 5).

The sf0.001-0.1 driver tables are statistically smooth, so edge shapes —
single-event users, NULL timestamps, all-NULL value columns, empty
groups, exact value/timestamp ties, rounding-boundary floats, one-row
tables — are under-sampled there; all three r6 ADVICE items and both r7
ADVICE items were latent for exactly that reason. This module writes a
tiny deterministic star schema (same footprint as TESTDATA.md) packed
with those shapes, and ``tests/test_edge_fixtures.py`` sweeps the
event / as-of / window query families against their DuckDB oracles on it.

Deterministic by construction (no randomness, fixed literals) so a
hash-mismatch is always an engine/oracle divergence, never flake.
"""

from __future__ import annotations

import datetime

import pandas as pd

_TS = datetime.datetime


def _events() -> tuple[pd.DataFrame, list]:
    """Edge shapes: user 1 single event; user 2 exact ts ties; user 3 NULL
    ts rows; user 4 all-NULL values for one event_type; user 5 a clean
    multi-day purchase/click trail (keeps as-of/gap-fill queries
    non-degenerate); rounding-boundary values (x.005 / x.xxxxx55 halves)."""
    rows = [
        # user 1: exactly one event (NULL inter-event gap — ADVICE r6 #1)
        (0, _TS(2024, 1, 10, 12, 0, 0), 1, "view", 10.005, '{"k": 1}'),
        # user 2: two events with IDENTICAL timestamps (window ties), one
        # more 1µs later (sub-second session gap)
        (1, _TS(2024, 1, 11, 9, 0, 0), 2, "click", 2.675, '{"k": 2}'),
        (2, _TS(2024, 1, 11, 9, 0, 0), 2, "click", 2.675, '{"k": 3}'),
        (3, _TS(2024, 1, 11, 9, 0, 0, 1), 2, "purchase", 0.005, '{"k": 4}'),
        # user 3: NULL ts (one with a value → KS sample B, one all-NULL)
        (4, None, 3, "view", 7.125, '{"k": 5}'),
        (5, None, 3, "view", None, '{"k": 6}'),
        # user 4 / event_type 'error': ALL values NULL (all-NULL agg input)
        (6, _TS(2024, 1, 12, 8, 0, 0), 4, "error", None, "{}"),
        (7, _TS(2024, 1, 13, 8, 0, 0), 4, "error", None, "{}"),
        # user 5: clean purchase/click trail across the 2024-01-15 KS
        # cutover, multi-day (gap-fill / OHLC / retention need >1 bucket);
        # click at the exact purchase timestamp (as-of backward tie)
        (8, _TS(2024, 1, 14, 10, 0, 0), 5, "click", 1.115, '{"k": 7}'),
        (9, _TS(2024, 1, 14, 10, 30, 0), 5, "purchase", 19.995, '{"k": 8}'),
        (10, _TS(2024, 1, 16, 11, 0, 0), 5, "click", 3.335, '{"k": 9}'),
        (11, _TS(2024, 1, 16, 11, 0, 0), 5, "purchase", 4.445, '{"k": 10}'),
        (12, _TS(2024, 1, 18, 9, 15, 0), 5, "view", 6.665, '{"k": 11}'),
        # a purchase with NO prior click anywhere (as-of miss row)
        (13, _TS(2024, 1, 2, 7, 0, 0), 6, "purchase", 5.555, '{"k": 12}'),
        # signup far in the past (decay clamp territory) + one recent
        (14, _TS(2022, 6, 1, 0, 0, 0), 7, "signup", 100.0, '{"k": 13}'),
        (15, _TS(2024, 1, 20, 23, 59, 59), 7, "purchase", 8.885, '{"k": 14}'),
        # NEGATIVE values (refunds, r9): exercise sign-sensitive paths —
        # half-up cents on negatives (FLOOR(x*100+0.5) is sign-uniform on
        # both engines), counter resets below zero, and any latent
        # truncate-vs-floor integer division (Spark `div` truncates toward
        # zero, DuckDB `//` floors — they differ on negative operands).
        # -0.005 lands exactly on a rounding boundary.
        (16, _TS(2024, 1, 17, 14, 0, 0), 5, "purchase", -19.995, '{"k": 15}'),
        (17, _TS(2024, 1, 17, 15, 0, 0), 7, "purchase", -0.005, '{"k": 16}'),
        # r11: DUPLICATE event_id — ingestion replays produce key
        # collisions; every dedup-by-event_id / join-on-event_id /
        # order-by-(ts, event_id) site must resolve them identically on
        # both engines (keep-first must be a deterministic rule, not
        # "whichever row the shuffle saw first").
        (18, _TS(2024, 1, 19, 10, 0, 0), 5, "click", 2.225, '{"k": 17}'),
        (18, _TS(2024, 1, 19, 10, 5, 0), 5, "view", 3.775, '{"k": 18}'),
        # r12: NON-FINITE doubles — sensor glitches / division artifacts
        # produce real NaN/±Inf values, and the engines disagree on them
        # three ways: Spark orders NaN LAST and treats NaN > x as TRUE,
        # DuckDB follows IEEE in comparisons (NaN > x is FALSE) but sorts
        # NaN largest; ANSI cast(NaN/Inf AS BIGINT) crashes Spark's
        # cents-exact money paths; sum/avg propagate NaN identically but
        # min/max/percentile/window frames do not. user 8 carries one
        # normal row so mixed-group statistics are exercised, and the
        # rows sit in 'view' so per-type aggregates mix with other users.
        # NOTE: these rows reach parquet through the explicit pyarrow
        # path in build_edge_dir — pandas' to_parquet silently converts
        # NaN (its missing marker) to NULL, even inside nested lists.
        (19, _TS(2024, 1, 21, 10, 0, 0), 8, "view", float("nan"), '{"k": 19}'),
        (20, _TS(2024, 1, 21, 11, 0, 0), 8, "view", float("inf"), '{"k": 20}'),
        (21, _TS(2024, 1, 21, 12, 0, 0), 8, "view", float("-inf"), '{"k": 21}'),
        (22, _TS(2024, 1, 21, 13, 0, 0), 8, "view", 2.505, '{"k": 22}'),
        # r12: FULL-TIE duplicate — same ts AND event_id AND user_id AND
        # event_type, different value/props (the at-least-once ingestion
        # artifact where a retry re-sends a mutated payload). Everything
        # that assumed (ts, event_id) or (ts, event_id, event_type) was a
        # unique physical-row identity — dropDuplicates, OHLC min_by/
        # max_by struct tiebreaks, Markov transitions, sessionize — must
        # break the tie on the payload itself, identically on both sides.
        (23, _TS(2024, 1, 22, 9, 0, 0), 5, "click", 1.005, '{"k": 23}'),
        (23, _TS(2024, 1, 22, 9, 0, 0), 5, "click", 2.005, '{"k": 24}'),
        # r12 batch 2: EPOCH-BOUNDARY timestamps — backfills and
        # integer-epoch ingestion bugs land events at or BEFORE
        # 1970-01-01. Arms: negative epoch micros in every ts-arithmetic
        # site (day/week bucketing on negative numbers is where floor vs
        # truncate-toward-zero division forks), hour buckets straddling
        # the epoch, and the ns→µs normalize path on NEGATIVE
        # sub-microsecond fragments (measured r12: Spark `ts div 1000`
        # and DuckDB's parquet TIMESTAMP_NS→TIMESTAMP read BOTH truncate
        # toward zero — these rows pin that agreement forever).
        (24, _TS(1970, 1, 1, 0, 0, 0), 9, "view", 1.115, '{"k": 25}'),
        (25, _TS(1969, 12, 31, 23, 59, 59), 9, "click", 2.225, '{"k": 26}'),
        (26, pd.Timestamp("1969-12-31T23:59:59.999999750"), 9, "view",
         3.335, '{"k": 27}'),
        (27, pd.Timestamp("2024-01-03T08:00:00.000000750"), 9, "purchase",
         4.445, '{"k": 28}'),
    ]
    return pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ), [r[4] for r in rows]


def _tpch() -> dict[str, pd.DataFrame]:
    """One-row and empty-group shapes: customer 103 has no orders, order
    1003 has no lineitems, supplier table is two rows (one NULL acctbal),
    part is two rows in two brands, lineitem has duplicate rows,
    a cross-brand exact price tie, + boundary prices."""
    region = pd.DataFrame({"r_regionkey": [0], "r_name": ["EDGE"]})
    nation = pd.DataFrame(
        {"n_nationkey": [0, 1], "n_name": ["ALPHA", "BETA"], "n_regionkey": [0, 0]}
    )
    customer = pd.DataFrame(
        {
            "c_custkey": [101, 102, 103],
            "c_name": ["Customer#101", "Customer#102", "Customer#103"],
            "c_nationkey": [0, 1, 1],
            "c_acctbal": [0.005, -1.115, None],
            "c_mktsegment": ["BUILDING", "BUILDING", "MACHINERY"],
        }
    )
    supplier = pd.DataFrame(
        {
            "s_suppkey": [11, 12],
            "s_name": ["Supplier#11", "Supplier#12"],
            "s_nationkey": [0, 1],
            "s_acctbal": [5.005, None],
        }
    )
    # two parts in two brands (r9): cross-brand lineitem pairs exist, so
    # the Bradley-Terry duel derivation is exercised for real — including
    # an exact cross-brand price tie (partkey tiebreak) and duplicate
    # duels from order 1001's duplicate rows
    part = pd.DataFrame(
        {
            "p_partkey": [21, 22],
            "p_name": ["edge lavender part", "edge copper part"],
            "p_brand": ["Brand#13", "Brand#42"],
            "p_type": ["SMALL PLATED TIN", "LARGE BRUSHED COPPER"],
            "p_size": [7, 3],
            "p_retailprice": [99.995, 15.005],
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": [1001, 1002, 1003],
            "o_custkey": [101, 101, 102],  # customer 103: EMPTY group
            "o_orderstatus": ["F", "O", "F"],
            "o_totalprice": [10.005, 20.005, 30.005],
            "o_orderdate": [
                _TS(2024, 1, 5),
                _TS(2024, 1, 5),  # duplicate orderdate (tie)
                _TS(2024, 2, 1),
            ],
            "o_orderpriority": ["3-MEDIUM", "3-MEDIUM", "5-LOW"],
        }
    )
    lineitem = pd.DataFrame(
        {
            # order 1003 has NO lineitems; order 1001 has duplicate rows
            "l_orderkey": [1001, 1001, 1001, 1002, 1001, 1002],
            "l_partkey": [21, 21, 21, 21, 22, 22],
            "l_suppkey": [11, 11, 12, 12, 11, 12],
            "l_linenumber": [1, 2, 3, 1, 4, 2],
            "l_quantity": [1.0, 1.0, 2.0, 50.0, 3.0, 1.0],
            # line 4 of order 1001 (part 22): EXACT price tie against the
            # two part-21 lines -> the duel must fall to the partkey
            # tiebreak; line 2 of order 1002 clearly loses to part 21
            "l_extendedprice": [10.005, 10.005, 2.675, 100.005, 10.005, 0.495],
            "l_discount": [0.05, 0.05, 0.0, 0.1, 0.0, 0.0],
            "l_tax": [0.0, 0.0, 0.02, 0.08, 0.01, 0.0],
            "l_returnflag": ["N", "N", "R", "A", "N", "R"],
            "l_linestatus": ["O", "O", "F", "F", "O", "F"],
            "l_shipdate": [
                _TS(2024, 1, 10),
                _TS(2024, 1, 10),  # exact duplicate row vs line 1 except number
                _TS(2024, 1, 12),
                _TS(2024, 2, 10),
                _TS(2024, 1, 11),
                _TS(2024, 2, 12),
            ],
        }
    )
    return {
        "region": region,
        "nation": nation,
        "customer": customer,
        "supplier": supplier,
        "part": part,
        "orders": orders,
        "lineitem": lineitem,
    }


def _documents() -> pd.DataFrame:
    """One-row-per-edge documents: empty text, single repeated token,
    exact duplicate pair, one doc per lang (k=1 groups)."""
    rows = [
        (0, "alpha beta gamma alpha", "en", "src0", 22),
        (1, "alpha beta gamma alpha", "en", "src1", 22),  # exact dup
        (2, "", "de", "src0", 0),  # empty text
        (3, "zzz zzz zzz zzz zzz", "es", "src0", 19),  # one token repeated
        (4, "unique words only here now", "zh", "src1", 26),
        # r10: NULL text + NULL n_chars — production corpora carry fetch
        # failures; every text/dedup/pipeline query must treat the row
        # identically on both engines (ANSI size(NULL), NULLS FIRST/LAST,
        # NULL-weight exclusion are all divergence classes this row arms)
        (5, None, "en", "src1", None),
        # r11 (ADVICE r10): NULL text in the %3==0 (image) and %3==1
        # (audio) media slots — the r10 NULL row sat in the video slot, so
        # mm_resize_images / mm_phash_neardup / audio oracles never saw a
        # NULL payload. src2 is an ALL-NULL-text source (arms per-source
        # aggregates whose oracle and engine disagree on NULL handling).
        (6, None, "fr", "src2", None),
        (7, None, "pt", "src2", None),
        # r11: multibyte + combining characters — precomposed é (U+00E9),
        # decomposed e + U+0301, CJK (no-whitespace tokens), an astral
        # emoji. Arms every byte-vs-char boundary: length/substr in
        # shingles, md5-of-text vs md5-of-bytes, levenshtein, casefold.
        # n_chars = Python len() = codepoints (é̲ decomposed counts 2).
        (8, "café école 東京タワー naïve \U0001f642 café", "ja", "src0", 30),
        # r11: DUPLICATE doc_id — two distinct documents sharing a primary
        # key (re-crawl collision). Keep-min/first-ownership, join-backs,
        # and per-doc ranks must treat the pair identically on both
        # engines; doc_id 9 %3 == 0 also puts TWO payloads in one media id.
        (9, "duplicate key text one", "en", "src0", 22),
        (9, "duplicate key text two", "en", "src1", 22),
        # r11 (second batch): NEGATIVE doc_ids — CDC / synthetic-key
        # pipelines produce them, and `id % k` cycle arithmetic diverges
        # three ways on them: Python % is the non-negative residue,
        # Spark/DuckDB % follow the dividend's sign, and Spark's
        # element_at(arr, id % 3 + 1) CRASHES on the 0 index. -7 lands in
        # the wav codec slot, -8 in jpeg, -6 in png+image (pmod residues
        # 5/4/0) — arming each fixed site; events carries negative ids
        # since r9, documents never did.
        (-6, "negative id doc six", "de", "src0", 19),
        (-7, "negative id doc seven", "en", "src0", 21),
        (-8, "negative id doc eight", "de", "src1", 21),
        # r12 batch 2: VERY-LONG document (~40k chars — a crawl page that
        # dodged the length gate). Arms every O(len)+ text path at a size
        # the micro-fixture never reached: shingling/minhash signature
        # width, token explodes, chunking across many chunks, CDC rolling
        # hashes, BPE pair counting, tfidf/zipf mass concentration, and
        # the levenshtein family's cost guards (prefix blocking +
        # threshold-bounded distance must keep this row CHEAP — an
        # unbounded all-pairs edit distance against 40k chars is the
        # failure mode the guards exist for). Deterministic construction;
        # n_chars = len(text) at the bottom.
        (10, _long_text(), "en", "src1", len(_long_text())),
    ]
    return pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])


def _long_text() -> str:
    """~40k chars, deterministic: a 4000-token distinct run (heavy
    distinct-token mass) followed by a repeated phrase block (heavy
    duplicate-n-gram mass) — both text-quality regimes in one document."""
    toks = [f"tok{i}" for i in range(4000)]
    rep = ["lorem ipsum dolor sit amet"] * 600
    return " ".join(toks + rep)


def _embeddings() -> pd.DataFrame:
    """64-dim vectors (the similarity operators' dimension contract, see
    operators/similarity.py DIM) with edge geometry: an exact-duplicate
    pair (cosine-1 tie), an antipodal pair (cosine −1), an axis vector,
    and two deterministic mixed vectors; k=1 label groups."""
    import numpy as np

    def vec(fn):
        return np.asarray([fn(i) for i in range(64)], dtype="float32")

    base = vec(lambda i: 1.0 if i == 0 else 0.0)
    vecs = [
        base,
        base.copy(),  # exact duplicate → cosine 1 tie
        -base,  # antipodal → cosine -1
        vec(lambda i: 0.25),  # uniform
        vec(lambda i: ((i * 37 + 11) % 101 - 50) / 50.0),  # deterministic mix
        vec(lambda i: 1.0 if i >= 32 else 0.0),  # half-support
        vec(lambda i: 0.0),  # zero-norm (r9): cosine undefined — the ANSI
        # div-by-zero class; every cosine site must NULL-guard, not crash
        # r12: one NaN component (a corrupt upstream encode) — NaN
        # poisons every dot product / norm / centroid it touches, and
        # Spark (NaN > x TRUE, NaN sorts largest) vs DuckDB (IEEE
        # comparisons) resolve the poisoned similarity differently in
        # thresholds and top-k. Written via the pyarrow path below so
        # the NaN survives parquet (pandas would NULL it).
        vec(lambda i: float("nan") if i == 3 else 0.5),
    ]
    return pd.DataFrame(
        {
            "vec_id": [0, 1, 2, 3, 4, 5, 6, 7],
            "embedding": vecs,
            "label": pd.array([0, 0, 1, 1, 2, 3, 4, 5], dtype="int32"),
        }
    )


def build_edge_dir(path) -> str:
    """Write every fixture table's edge twin under ``path`` (a directory);
    returns ``str(path)`` for use as an sf_dir."""
    tables = dict(_tpch())
    tables["events"], raw_event_values = _events()
    tables["documents"] = _documents()
    tables["embeddings"] = _embeddings()
    for name, df in tables.items():
        if name == "events":
            # driver testdata writes events.ts as TIMESTAMP(NANOS) — keep
            # that here so the edge sweep exercises the nanosAsLong path.
            # value goes through an EXPLICIT pyarrow array (r12): pandas
            # float64 uses NaN as its missing marker, so to_parquet would
            # silently turn the planted NaN into NULL; rebuilding the
            # column from the raw Python literals keeps NaN a VALUE and
            # None a NULL — distinct things, as they are in production.
            import pyarrow as pa
            import pyarrow.parquet as pq

            tbl = pa.Table.from_pandas(df, preserve_index=False)
            tbl = tbl.set_column(
                tbl.schema.get_field_index("value"),
                "value",
                pa.array(raw_event_values, type=pa.float64()),
            )
            pq.write_table(tbl, f"{path}/{name}.parquet")
        elif name == "embeddings":
            # same pyarrow-explicit treatment for the NaN vector element:
            # nested NaN would also be nulled by the pandas writer
            import math

            import pyarrow as pa
            import pyarrow.parquet as pq

            tbl = pa.table(
                {
                    "vec_id": pa.array([int(v) for v in df["vec_id"]], pa.int64()),
                    "embedding": pa.array(
                        [[float(x) for x in v] for v in df["embedding"]],
                        pa.list_(pa.float32()),
                    ),
                    "label": pa.array([int(v) for v in df["label"]], pa.int32()),
                }
            )
            assert any(
                math.isnan(x)
                for v in tbl["embedding"].to_pylist()
                for x in v
                if x is not None
            ), "NaN embedding element must survive the parquet write"
            pq.write_table(tbl, f"{path}/{name}.parquet")
        else:
            # TPC-H tables carry µs timestamps in the driver fixtures;
            # pandas' ns default would read back as BIGINT in Spark
            df.to_parquet(
                f"{path}/{name}.parquet", index=False, coerce_timestamps="us"
            )
    return str(path)
