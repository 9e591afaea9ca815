"""Join operators Spark lacks as built-ins: as-of join and range join.

The reference has no join subsystem at all (SURVEY §2.3 — the intended
``multi.py`` merge module is a dangling import at
``/root/reference/dataframe/core.py:445``), so these implement the target
surface's hard cases as compositions of built-in DataFrame ops — no custom
physical operator, no driver-side loops.

Scale design:
- ``asof_join`` uses the union+window formulation: ONE shuffle of
  (left ∪ right) on the key, then a per-key ordered window carrying the most
  recent right row forward. No row explosion, no nested-loop — this is the
  plan that survives 100 TB (both sides hash-partition on the key; skewed
  keys are handled by AQE).
- ``range_join`` buckets the point side and explodes the interval side into
  the buckets it overlaps, turning a nested-loop theta join into an
  equi-join on bucket id + residual predicate — the standard trick to make
  interval joins shuffle-joinable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame

from lithops_dataframe_spark import cache
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | Sequence[str] | None = None,
    *,
    direction: str = "backward",
    suffix: str = "_right",
    allow_exact_matches: bool = True,
    matched_on: str | None = None,
    left_key: str | Sequence[str] | None = None,
    tolerance: int | float | str | None = None,
) -> DataFrame:
    """pandas ``merge_asof`` semantics: for each left row, attach the single
    nearest right row with ``right.on <= left.on`` (backward), ``right.on
    >= left.on`` (forward), or closest in absolute distance with backward
    winning ties (nearest), optionally within ``by`` groups.

    ``nearest`` runs the backward and forward passes and picks per left
    row by distance (ties and one-sided misses resolve like pandas); the
    ``on`` column must be numeric, date, or timestamp for the distance
    comparison. The two passes re-join per left row: ``left_key`` names
    column(s) already unique per left row (cheapest — used as-is); when
    None a deterministic key is DERIVED from the row's own content
    (xxhash64 over all columns + a row_number within each hash bucket),
    costing one extra hash-partition shuffle of the left side but no
    materialization. The derived key is only sound when the left PLAN is
    deterministic — both passes re-evaluate the left lineage, so a plan
    containing ``rand``/``uuid``/``shuffle``/sampling/bare ``LIMIT`` or
    order-dependent aggregates (``first``/``last``/``collect_list``)
    could produce different rows per pass and silently mispair. The
    nearest path therefore inspects the analyzed plan and falls back to
    an eager ``localCheckpoint`` pinning ``monotonically_increasing_id``
    whenever it finds a nondeterminism marker OR an unhashable column
    type (map/variant) — the one variant that copies the left side to
    executor-local storage first (avoid at scale by supplying
    ``left_key``).

    ``matched_on``: when given, the output carries the matched right row's
    ``on`` value under this name (e.g. the click timestamp a purchase was
    attributed to); when None the bookkeeping column is dropped.

    ``tolerance`` (pandas parity): a max staleness for the match — a
    number for numeric ``on`` columns, or an interval string (e.g.
    ``"15 minutes"``) for timestamps. A match farther than the tolerance
    is DISCARDED: the left row survives with null right columns, exactly
    pandas ``merge_asof(tolerance=...)``. Applied as a post-predicate on
    the matched ``on`` value, so it adds no shuffle.

    Implementation: tag and union both sides, sort within key partitions by
    the ``on`` column, and carry the last-seen right ROW (an atomic struct,
    so a matched row's own nulls are carried as-is rather than mixed with
    older rows' values) forward with ``last(..., ignorenulls=True)`` over an
    unbounded-preceding window — a single shuffle on ``by``, linear work,
    no join explosion.

    ``by=None`` (global as-of) cannot use ``Window.orderBy`` alone — that
    is a single task. Instead: range-partition the union on ``on`` (equal
    keys land in one partition, so tie handling stays intra-partition),
    carry within each partition, then patch rows that precede their
    partition's first right row with the previous partitions' carry-out —
    a second tiny pass over one boundary row per partition. Two parallel
    shuffles total; no single-task stage.

    Resource note (ADVICE r4): the ``by=None`` path persists the
    range-partitioned union via :func:`cache.persist_tracked`. Inside the
    query registry that persist is evicted automatically when the next
    builder starts; DIRECT library callers in a long-lived session should
    call :func:`lithops_dataframe_spark.cache.release_all` once the
    result has been materialized, or persisted unions accumulate in
    executor memory across repeated calls.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError("direction must be 'backward', 'forward', or 'nearest'")
    _validate_asof_tolerance(left, on, tolerance)
    if direction == "nearest":
        _mo = matched_on if tolerance is None else (matched_on or "__asof_tol_on")
        res = _asof_nearest(
            left,
            right,
            on,
            by,
            suffix=suffix,
            allow_exact_matches=allow_exact_matches,
            matched_on=_mo,
            left_key=left_key,
        )
        if tolerance is not None:
            _by = [by] if isinstance(by, str) else list(by or [])
            _l = [c for c in left.columns if c != on and c not in _by]
            _rn = [
                (c + suffix if c in _l else c)
                for c in right.columns
                if c != on and c not in _by
            ]
            res = _apply_asof_tolerance(res, on, _mo, _rn, tolerance)
            if matched_on is None:
                res = res.drop(_mo)
        return res
    by_cols = [by] if isinstance(by, str) else list(by or [])

    lcols = [c for c in left.columns if c != on and c not in by_cols]
    rcols = [c for c in right.columns if c != on and c not in by_cols]
    rmap = {c: (c + suffix if c in lcols else c) for c in rcols}

    lt = left.select(
        *by_cols,
        F.col(on).alias(on),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(rmap[c]) for c in rcols],
    )
    rt = right.select(
        *by_cols,
        F.col(on).alias(on),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols],
        *[F.col(c).alias(rmap[c]) for c in rcols],
    )
    unioned = lt.unionByName(rt)

    # Order: by `on`; on ties, right rows first iff exact matches are allowed
    # (so a left row at the same timestamp sees the tied right row).
    tie = F.col("__is_left").asc() if allow_exact_matches else F.col("__is_left").desc()
    if direction == "backward":
        order = [F.col(on).asc(), tie]
    else:
        order = [F.col(on).desc(), tie]
    # the matched right row travels as ONE struct (its own nulls included)
    rstruct = F.when(
        F.col("__is_left") == 0,
        F.struct(
            *[F.col(rmap[c]) for c in rcols], F.col(on).alias("__matched_on")
        ),
    )

    if by_cols:
        w = (
            Window.partitionBy(*by_cols)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        carried = unioned.withColumn("__r", F.last(rstruct, ignorenulls=True).over(w))
    else:
        # global as-of: range-partition so equal `on` values co-locate,
        # carry per partition, then cumulate per-partition carry-outs
        # (one tiny row each) into carry-ins for the partition after them
        sort_col = F.col(on).asc() if direction == "backward" else F.col(on).desc()
        # part feeds BOTH the window carry and the bounds aggregate; the
        # tracked persist stops the union scan + range shuffle running
        # twice (the round-3 multi-branch lesson)
        part = cache.persist_tracked(
            unioned.repartitionByRange(sort_col).withColumn(
                "__pid", F.spark_partition_id()
            )
        )
        wp = (
            Window.partitionBy("__pid")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        local = part.withColumn("__r", F.last(rstruct, ignorenulls=True).over(wp))
        # Per-partition carry-out as a map-side-combinable aggregate (not a
        # second full window): the right row with the extreme `on` per pid;
        # max_by/min_by ignore the null keys left rows contribute, and a
        # pid with no right rows keeps a row with a NULL carry-out (so the
        # cumulative carry-in below skips over it, not past it).
        pick = F.max_by if direction == "backward" else F.min_by
        bounds = part.groupBy("__pid").agg(
            pick(rstruct, F.when(F.col("__is_left") == 0, F.col(on))).alias("__co")
        )
        wcum = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
        carry_in = bounds.select(
            "__pid", F.last("__co", ignorenulls=True).over(wcum).alias("__ci")
        )
        carried = (
            local.join(F.broadcast(carry_in), "__pid", "left")
            .withColumn("__r", F.coalesce(F.col("__r"), F.col("__ci")))
            .drop("__pid", "__ci")
        )

    out = carried.filter(F.col("__is_left") == 1).select(
        *by_cols,
        on,
        *[F.col(c) for c in lcols],
        *[F.col("__r")[rmap[c]].alias(rmap[c]) for c in rcols],
        F.col("__r")["__matched_on"].alias("__asof_" + on),
    )
    if tolerance is not None:
        out = _apply_asof_tolerance(
            out, on, "__asof_" + on, [rmap[c] for c in rcols], tolerance
        )
    if matched_on is not None:
        out = out.withColumnRenamed("__asof_" + on, matched_on)
    else:
        out = out.drop("__asof_" + on)
    return out


# Exact dtype names, not prefixes (ADVICE r7): prefix matching classified
# 'interval day to second' as numeric because it starts with 'int'.
# decimal keeps a prefix test only because its name carries parameters
# ('decimal(10,2)').
_NUMERIC_ON_TYPES = frozenset(
    {"tinyint", "smallint", "int", "bigint", "float", "double"}
)


def _validate_asof_tolerance(
    left: DataFrame, on: str, tolerance: int | float | str | None
) -> None:
    """pandas-parity upfront check (ADVICE r6): a numeric tolerance against a
    timestamp/date ``on`` column would reach ``abs(ts - ts) > number`` — an
    interval-vs-numeric comparison that fails at EXECUTION time with an
    opaque Catalyst analysis error. Match the rest of the surface and raise
    a clear ``ValueError`` at entry instead: temporal ``on`` needs an
    interval STRING tolerance; numeric ``on`` needs a numeric tolerance;
    any other ``on`` dtype supports no tolerance at all."""
    if tolerance is None:
        return
    dtype = dict(left.dtypes).get(on)
    if dtype is None:
        raise ValueError(f"asof_join: 'on' column {on!r} not in left frame")
    temporal = dtype == "date" or dtype.startswith("timestamp")
    numeric = dtype in _NUMERIC_ON_TYPES or dtype.startswith("decimal")
    if temporal and not isinstance(tolerance, str):
        raise ValueError(
            "asof_join: tolerance must be an interval string (e.g. "
            f"'15 minutes') when 'on' is {dtype}; got {type(tolerance).__name__}"
        )
    if numeric and (
        isinstance(tolerance, bool) or not isinstance(tolerance, (int, float))
    ):
        raise ValueError(
            "asof_join: tolerance must be numeric when 'on' is "
            f"{dtype}; got {type(tolerance).__name__}"
        )
    if not temporal and not numeric:
        raise ValueError(
            f"asof_join: tolerance is not supported for 'on' dtype {dtype}"
        )


def _apply_asof_tolerance(
    out: DataFrame,
    on: str,
    mo_col: str,
    right_names: Sequence[str],
    tolerance: int | float | str,
) -> DataFrame:
    """Null out a match (all right columns + the matched-on bookkeeping)
    when it lies farther from ``on`` than ``tolerance`` — pandas
    ``merge_asof(tolerance=...)``. String tolerances are INTERVALs for
    time columns; numbers compare absolute differences."""
    if isinstance(tolerance, str):
        delta = F.expr(f"INTERVAL {tolerance}")
        beyond = F.col(mo_col).isNotNull() & (
            (F.col(mo_col) < F.col(on) - delta) | (F.col(mo_col) > F.col(on) + delta)
        )
    else:
        beyond = F.col(mo_col).isNotNull() & (
            F.abs(F.col(on) - F.col(mo_col)) > F.lit(tolerance)
        )
    for c in list(right_names) + [mo_col]:
        out = out.withColumn(c, F.when(beyond, F.lit(None)).otherwise(F.col(c)))
    return out


# Markers of re-evaluation instability in an ANALYZED plan string: any of
# these means two independent evaluations of the lineage may yield
# different row contents, so a content-derived key could mispair the
# backward/forward passes (ADVICE r5). Function names render lowercase in
# analyzed plans; Sample/Limit are operator node names. first/last/
# collect_list/collect_set/any_value are deterministic only under an
# explicit window ORDER — treating every occurrence as unstable merely
# costs the checkpoint fallback, never correctness.
_NONDET_PLAN_MARKERS = (
    "rand(",
    "randn(",
    "random(",
    "uuid()",
    "shuffle(",
    "monotonically_increasing_id",
    "spark_partition_id",
    "input_file_name",
    "first(",
    "last(",
    "any_value(",
    "collect_list(",
    "collect_set(",
    "Sample ",
    "GlobalLimit",
    "LocalLimit",
)


def _plan_reevaluation_unstable(df: DataFrame) -> bool:
    """True when the analyzed plan contains an expression or operator whose
    output can differ between two evaluations of the same lineage. Used to
    route asof-nearest to the checkpoint fallback; uninspectable plans are
    treated as unstable (safe direction)."""
    try:
        s = df._jdf.queryExecution().analyzed().toString()
    except Exception:
        return True
    return any(m in s for m in _NONDET_PLAN_MARKERS)


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | Sequence[str] | None,
    *,
    suffix: str,
    allow_exact_matches: bool,
    matched_on: str | None,
    left_key: str | Sequence[str] | None = None,
) -> DataFrame:
    """``direction='nearest'``: run the backward and forward carries and
    pick per left row by absolute distance (backward wins ties — pandas).
    The two passes re-join on a per-left-row key; the matched row is
    chosen ATOMICALLY (all columns from one side), never mixed.

    Key strategy (VERDICT r4 task 4 — no eager full-left materialization):

    1. ``left_key`` supplied → trust it (caller guarantees uniqueness).
    2. Otherwise DERIVE a deterministic key from row content:
       ``xxhash64(all columns)`` plus a ``row_number`` within each hash
       bucket ordered by all columns. Re-evaluating the left lineage per
       branch is then harmless: the ordering is content-determined up to
       TRUE duplicate rows, and true duplicates are interchangeable — any
       consistent numbering pairs each copy with *a* copy carrying
       identical values. Cost: one hash-partition shuffle of the left
       side (vs. the old eager ``localCheckpoint``, which copied the
       whole left frame to executor-local storage before either pass).
    3. When a left column's type is unhashable/unorderable (map/variant)
       OR the analyzed plan carries a re-evaluation-instability marker
       (rand/uuid/sample/limit/order-dependent aggregates — see
       :data:`_NONDET_PLAN_MARKERS`), fall back to
       ``monotonically_increasing_id`` pinned by an eager
       ``localCheckpoint`` (two independent lineage evaluations may
       otherwise produce different row contents — silently wrong pairing).
    """
    by_cols = [by] if isinstance(by, str) else list(by or [])
    lcols = [c for c in left.columns if c != on and c not in by_cols]
    rcols = [c for c in right.columns if c != on and c not in by_cols]
    rmap = {c: (c + suffix if c in lcols else c) for c in rcols}

    if left_key is not None:
        key_cols = [left_key] if isinstance(left_key, str) else list(left_key)
        lid = left
    elif not any(
        # xxhash64/orderBy reject these anywhere in the type tree; route
        # them to the checkpoint fallback instead of crashing (VARIANT is
        # Spark 4's unhashable semi-structured type — review finding r5)
        bad in dt
        for _, dt in left.dtypes
        for bad in ("map<", "variant")
    ) and not _plan_reevaluation_unstable(left):
        h = F.xxhash64(*[F.col(c) for c in left.columns])
        wn = Window.partitionBy(h).orderBy(*[F.col(c) for c in left.columns])
        lid = left.withColumn("__lh", h).withColumn(
            "__ln", F.row_number().over(wn)
        )
        key_cols = ["__lh", "__ln"]
    else:
        lid = left.withColumn(
            "__lid", F.monotonically_increasing_id()
        ).localCheckpoint(eager=True)
        key_cols = ["__lid"]
    kwargs = dict(suffix=suffix, allow_exact_matches=allow_exact_matches)
    b = asof_join(lid, right, on, by, direction="backward", matched_on="__mb", **kwargs)
    f = asof_join(lid, right, on, by, direction="forward", matched_on="__mf", **kwargs).select(
        *key_cols,
        F.col("__mf"),
        *[F.col(rmap[c]).alias("__f_" + rmap[c]) for c in rcols],
    )
    j = b.join(f, key_cols)

    def _num(col: Column) -> Column:
        # distance needs a numeric axis; temporal types go through
        # unix_micros — ANSI mode (the Spark 4 / driver default) rejects
        # CAST(timestamp AS DOUBLE) outright. NTZ first casts to TIMESTAMP
        # (session-tz interpretation) — both join sides convert the same
        # way, so distances stay consistent; the micros/1e6 double equals
        # DuckDB's EPOCH() for exact tie-break parity under UTC sessions.
        dt = dict(lid.dtypes)[on]
        if dt == "date" or dt.startswith("timestamp"):
            return F.unix_micros(col.cast("timestamp")) / F.lit(1000000.0)
        return col.cast("double")

    choose_b = (
        F.when(F.col("__mf").isNull(), F.lit(True))
        .when(F.col("__mb").isNull(), F.lit(False))
        .otherwise(
            (_num(F.col(on)) - _num(F.col("__mb")))
            <= (_num(F.col("__mf")) - _num(F.col(on)))
        )
    )
    out = j.select(
        *by_cols,
        on,
        *[F.col(c) for c in lcols],
        *[
            F.when(choose_b, F.col(rmap[c])).otherwise(F.col("__f_" + rmap[c])).alias(rmap[c])
            for c in rcols
        ],
        F.when(choose_b, F.col("__mb")).otherwise(F.col("__mf")).alias("__asof_" + on),
    )
    if matched_on is not None:
        out = out.withColumnRenamed("__asof_" + on, matched_on)
    else:
        out = out.drop("__asof_" + on)
    return out


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    *,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Skew-resistant equi-join: spread each hot key across ``salt``
    reducers.

    Left rows get a deterministic salt (hash of the whole row, mod
    ``salt``); the right side replicates each row to all ``salt`` values;
    the join key becomes (keys..., salt). One hot key's rows now land on
    ``salt`` reducers instead of one, at the cost of a ``salt``× blow-up
    of the (small) right side — use when AQE's skew-join split can't
    apply (e.g. the skewed side feeds an aggregation that pins
    partitioning). Supports inner/left joins (right replication makes
    right-outer semantics wrong by construction).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left'")
    keys = [on] if isinstance(on, str) else list(on)
    l = left.withColumn(
        "__salt", F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(salt))
    )
    r = right.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    return l.join(r, keys + ["__salt"], how).drop("__salt")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lower_col: str,
    upper_col: str,
    *,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``lower <= point < upper``, scalably.

    Buckets of width ``bucket_width``: points get one bucket id; intervals
    explode to every bucket they overlap via ``sequence()``. The join becomes
    an equi-join on bucket id with the exact range predicate re-applied —
    shuffle-joinable and skew-resistant (wide intervals cost ceil(len/width)
    duplicates, a tunable constant), instead of a broadcast nested loop.
    """
    p = points.withColumn("__bucket", F.floor(F.col(point_col) / bucket_width).cast("long"))
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lower_col) / bucket_width).cast("long"),
                F.floor(F.col(upper_col) / bucket_width).cast("long"),
            )
        ),
    )
    cond = (
        (p["__bucket"] == iv["__bucket"])
        & (p[point_col] >= iv[lower_col])
        & (p[point_col] < iv[upper_col])
    )
    return p.join(iv, cond, how).drop(p["__bucket"]).drop(iv["__bucket"])


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    *,
    bucket_width: float,
) -> DataFrame:
    """Join interval rows that OVERLAP: ``l.lo < r.hi AND r.lo < l.hi``
    (half-open intervals), scalably — the interval×interval sibling of
    :func:`range_join`.

    Both sides explode to every bucket their interval touches; candidate
    pairs equi-join on bucket id. A pair overlapping across k shared
    buckets would surface k times, so each pair is attributed ONLY to the
    bucket containing the overlap's start ``greatest(l.lo, r.lo)`` —
    duplicate-free by construction, no distinct needed. Cost is
    Σ ceil(len/width) postings per side; a plain theta join is a
    broadcast nested loop.
    """
    def buckets(df, lo, hi):
        return df.withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col(lo) / bucket_width).cast("long"),
                    F.floor(F.col(hi) / bucket_width).cast("long"),
                )
            ),
        )

    l = buckets(left, left_lo, left_hi).alias("l")
    r = buckets(right, right_lo, right_hi).alias("r")
    start = F.greatest(F.col("l." + left_lo), F.col("r." + right_lo))
    cond = (
        (F.col("l.__bucket") == F.col("r.__bucket"))
        & (F.col("l." + left_lo) < F.col("r." + right_hi))
        & (F.col("r." + right_lo) < F.col("l." + left_hi))
        & (F.floor(start / bucket_width).cast("long") == F.col("l.__bucket"))
    )
    return l.join(r, cond).drop("__bucket")
