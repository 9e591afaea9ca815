"""LDFrame — pandas-flavored veneer over a PySpark DataFrame.

Re-implements the reference's live operator surface (the ten whole-frame
reductions at ``/root/reference/dataframe/core.py:264-404``, row-wise
``apply`` at ``core.py:171-262``) and its *declared* distributed machinery
(``reduction``/``map_partitions``/``apply_concat_apply`` at
``core.py:15-144, 407-548, 551-758``) with pandas semantics
(``skipna``/``min_count``/``ddof``/``axis``) — but executed by Catalyst:

- axis=0 reductions compile to native ``HashAggregate(partial) → Exchange →
  HashAggregate(final)`` plans — exactly the chunk→combine→aggregate tree
  the reference's dead ACA stratum describes (``core.py:551-758``), with
  ``split_every`` fan-in subsumed by Spark's exchange and
  ``split_out`` subsumed by ``spark.sql.shuffle.partitions``/AQE.
- axis=1 reductions are narrow per-row expressions (no shuffle at all).
- ``apply``/``map_partitions`` use Arrow-batched ``mapInPandas``; the
  mandatory output schema plays the role of the reference's Dask ``meta``
  contract (``core.py:221-237``).

Nothing here collects to the driver except the explicit ``to_pandas`` exit.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator, Sequence
from typing import Any

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

NUMERIC_TYPES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def _numeric_cols(df: DataFrame) -> list[str]:
    return [f.name for f in df.schema.fields if isinstance(f.dataType, NUMERIC_TYPES)]


def _bool_like_cols(df: DataFrame) -> list[str]:
    return [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.BooleanType, *NUMERIC_TYPES))
    ]


def from_spark(df: DataFrame) -> "LDFrame":
    return LDFrame(df)


_AGG_FNS: dict[str, Callable[[str], Column]] = {
    "sum": lambda c: F.sum(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
    "mean": lambda c: F.avg(c),
    "avg": lambda c: F.avg(c),
    "count": lambda c: F.count(c),
    "std": lambda c: F.stddev_samp(c),
    "var": lambda c: F.var_samp(c),
    "first": lambda c: F.first(c),
    "last": lambda c: F.last(c),
    "nunique": lambda c: F.countDistinct(c),
}


class LDGroupBy:
    """pandas-flavored grouped frame: ``agg`` with {col: fn} dicts plus the
    named shortcuts (sum/mean/count/...). Compiles to a single Spark
    hash-aggregate (partial → exchange → final)."""

    def __init__(self, df: DataFrame, keys: list[str]):
        self._df = df
        self._keys = keys

    def agg(self, spec: dict[str, str | Sequence[str]]) -> "LDFrame":
        """``agg({'x': 'sum', 'y': ['min', 'max']})`` → columns named
        pandas-flat style ``x_sum``, ``y_min``, ``y_max``."""
        aggs: list[Column] = []
        for col, fns in spec.items():
            for fn in [fns] if isinstance(fns, str) else list(fns):
                if fn not in _AGG_FNS:
                    raise ValueError(f"unsupported aggregate: {fn}")
                aggs.append(_AGG_FNS[fn](col).alias(f"{col}_{fn}"))
        return LDFrame(self._df.groupBy(*self._keys).agg(*aggs))

    def _all_numeric(self, fn: str) -> "LDFrame":
        num = [
            f.name
            for f in self._df.schema.fields
            if isinstance(f.dataType, NUMERIC_TYPES) and f.name not in self._keys
        ]
        return LDFrame(
            self._df.groupBy(*self._keys).agg(*[_AGG_FNS[fn](c).alias(c) for c in num])
        )

    def sum(self) -> "LDFrame":
        return self._all_numeric("sum")

    def mean(self) -> "LDFrame":
        return self._all_numeric("mean")

    def min(self) -> "LDFrame":
        return self._all_numeric("min")

    def max(self) -> "LDFrame":
        return self._all_numeric("max")

    def count(self) -> "LDFrame":
        return LDFrame(self._df.groupBy(*self._keys).agg(F.count(F.lit(1)).alias("count")))

    def size(self) -> "LDFrame":
        return LDFrame(self._df.groupBy(*self._keys).agg(F.count(F.lit(1)).alias("size")))

    def apply_in_pandas(self, fn, schema) -> "LDFrame":
        """Grouped-map escape hatch (pandas ``groupby().apply`` analog)."""
        return LDFrame(self._df.groupBy(*self._keys).applyInPandas(fn, schema))

    def describe(self, cols: Sequence[str] | None = None) -> "LDFrame":
        """pandas ``groupby().describe()`` (flat columns): per-group
        count/mean/std/min/median/max per numeric column. The median is the
        ``approx_percentile`` sketch — per-KEY exact percentiles stay
        tractable at scale, but the sketch keeps describe single-pass and
        mergeable regardless of group sizes; columns named
        ``{col}_{stat}`` pandas-flat style."""
        num = cols or [
            f.name
            for f in self._df.schema.fields
            if isinstance(f.dataType, NUMERIC_TYPES) and f.name not in self._keys
        ]
        aggs: list[Column] = []
        for c in num:
            aggs += [
                F.count(F.col(c)).alias(f"{c}_count"),
                F.avg(F.col(c)).alias(f"{c}_mean"),
                F.stddev_samp(F.col(c)).alias(f"{c}_std"),
                F.min(F.col(c)).cast("double").alias(f"{c}_min"),
                F.approx_percentile(F.col(c), F.lit(0.5), F.lit(10000))
                .cast("double")
                .alias(f"{c}_p50"),
                F.max(F.col(c)).cast("double").alias(f"{c}_max"),
            ]
        return LDFrame(self._df.groupBy(*self._keys).agg(*aggs))


class LDFrame:
    """A thin, lazy pandas-semantics layer; every method returns a new
    LDFrame (or a one-row reduction frame), never materialized data."""

    def __init__(self, df: DataFrame):
        self._df = df

    # -- plumbing ----------------------------------------------------------
    @property
    def spark(self) -> DataFrame:
        """Escape hatch to the underlying Spark DataFrame."""
        return self._df

    @property
    def columns(self) -> list[str]:
        return self._df.columns

    @property
    def npartitions(self) -> int:
        # Reference: DataFrame.npartitions (core.py:12). In Spark this is the
        # RDD partition count of the current plan.
        return self._df.rdd.getNumPartitions()

    def repartition(self, n: int) -> "LDFrame":
        return LDFrame(self._df.repartition(n))

    def persist(self, storage_level: str = "MEMORY_AND_DISK") -> "LDFrame":
        """Cache the frame across actions (the reference re-reads + re-parses
        the whole CSV per operator call, core.py:255 ×9 — persist is the
        Spark answer). Returns self for chaining; pair with unpersist()."""
        from pyspark import StorageLevel

        self._df.persist(getattr(StorageLevel, storage_level))
        return self

    def cache(self) -> "LDFrame":
        return self.persist()

    def unpersist(self) -> "LDFrame":
        self._df.unpersist()
        return self

    def value_counts(self, subset: str | Sequence[str]) -> DataFrame:
        """pandas ``value_counts``: rows per distinct value, descending."""
        cols = [subset] if isinstance(subset, str) else list(subset)
        return (
            self._df.groupBy(*cols)
            .agg(F.count(F.lit(1)).alias("count"))
            .orderBy(F.col("count").desc(), *[F.col(c).asc() for c in cols])
        )

    def nlargest(self, n: int, columns: str | Sequence[str]) -> "LDFrame":
        """Top-n rows by columns — plans as TakeOrderedAndProject."""
        cols = [columns] if isinstance(columns, str) else list(columns)
        return LDFrame(self._df.orderBy(*[F.col(c).desc() for c in cols]).limit(n))

    def nsmallest(self, n: int, columns: str | Sequence[str]) -> "LDFrame":
        cols = [columns] if isinstance(columns, str) else list(columns)
        return LDFrame(self._df.orderBy(*[F.col(c).asc() for c in cols]).limit(n))

    def to_pandas(self) -> pd.DataFrame:
        return self._df.toPandas()

    # -- projection / filtering (SURVEY §2.2) -------------------------------
    def __getitem__(self, key):
        if isinstance(key, str):
            return F.col(key)
        if isinstance(key, Column):
            return LDFrame(self._df.filter(key))
        if isinstance(key, (list, tuple)):
            return LDFrame(self._df.select(*key))
        raise TypeError(f"unsupported key type: {type(key)}")

    def assign(self, **kwargs: Column) -> "LDFrame":
        df = self._df
        for name, col in kwargs.items():
            df = df.withColumn(name, col)
        return LDFrame(df)

    # -- reductions (reference core.py:264-404) ------------------------------
    def _agg_col(
        self,
        c: str,
        fn: Callable[[Column], Column],
        skipna: bool,
        min_count: int | None = None,
    ) -> Column:
        """Wrap a native aggregate with pandas skipna/min_count semantics.

        skipna=False → null result if the column has any null (pandas NaN).
        min_count   → null result unless ≥ min_count non-null values.
        Both wrappers stay inside the single aggregation (no extra pass).
        """
        col = F.col(c)
        agg = fn(col)
        if not skipna:
            agg = F.when(F.count(F.when(col.isNull(), F.lit(1))) > 0, F.lit(None)).otherwise(agg)
        if min_count is not None and min_count > 0:
            agg = F.when(F.count(col) >= F.lit(min_count), agg).otherwise(F.lit(None))
        return agg.alias(c)

    def _reduce0(
        self,
        fn: Callable[[Column], Column],
        cols: Sequence[str],
        skipna: bool = True,
        min_count: int | None = None,
    ) -> DataFrame:
        """axis=0 reduction → one-row DataFrame (pandas Series analog)."""
        return self._df.agg(*[self._agg_col(c, fn, skipna, min_count) for c in cols])

    def _rowwise(self, cols: Sequence[str], expr: Column, name: str) -> DataFrame:
        """axis=1 reduction → per-row column; a narrow map, zero shuffle
        (the reference routes axis=1 to map_partitions, core.py:153-157)."""
        return self._df.select(expr.alias(name))

    def _arr(self, cols: Sequence[str], skipna: bool) -> Column:
        arr = F.array(*[F.col(c).cast("double") for c in cols])
        if skipna:
            arr = F.filter(arr, lambda x: x.isNotNull())
        return arr

    def sum(self, axis: int = 0, skipna: bool = True, min_count: int | None = None) -> DataFrame:
        """Reference: core.py:290-310 (pandas df.sum per chunk + intended agg)."""
        cols = _numeric_cols(self._df)
        if axis in (1, "columns"):
            arr = self._arr(cols, skipna)
            expr = F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)
            if not skipna:
                # any null in the row → null (pandas NaN propagation)
                expr = F.when(F.size(F.filter(self._arr(cols, False), lambda x: x.isNull())) > 0, F.lit(None)).otherwise(expr)
            return self._rowwise(cols, expr, "sum")
        return self._reduce0(F.sum, cols, skipna, min_count)

    def prod(self, axis: int = 0, skipna: bool = True, min_count: int | None = None) -> DataFrame:
        """Reference: core.py:312-332."""
        cols = _numeric_cols(self._df)
        if axis in (1, "columns"):
            arr = self._arr(cols, skipna)
            expr = F.aggregate(arr, F.lit(1.0), lambda acc, x: acc * x)
            return self._rowwise(cols, expr, "prod")
        return self._reduce0(F.product, cols, skipna, min_count)

    def max(self, axis: int = 0, skipna: bool = True) -> DataFrame:
        """Reference: core.py:334-346."""
        cols = _numeric_cols(self._df)
        if axis in (1, "columns"):
            return self._rowwise(cols, F.greatest(*[F.col(c).cast("double") for c in cols]), "max")
        return self._reduce0(F.max, cols, skipna)

    def min(self, axis: int = 0, skipna: bool = True) -> DataFrame:
        """Reference: core.py:348-360."""
        cols = _numeric_cols(self._df)
        if axis in (1, "columns"):
            return self._rowwise(cols, F.least(*[F.col(c).cast("double") for c in cols]), "min")
        return self._reduce0(F.min, cols, skipna)

    def count(self, axis: int = 0) -> DataFrame:
        """Reference: core.py:362-374 — non-null count per column/row."""
        cols = self._df.columns
        if axis in (1, "columns"):
            expr = sum(F.when(F.col(c).isNotNull(), 1).otherwise(0) for c in cols)
            return self._rowwise(cols, expr.cast("long"), "count")
        return self._df.agg(*[F.count(F.col(c)).alias(c) for c in cols])

    def mean(self, axis: int = 0, skipna: bool = True) -> DataFrame:
        """Reference: core.py:376-388 (defective there — maps an undefined
        function; implemented here with the *declared* semantics)."""
        cols = _numeric_cols(self._df)
        if axis in (1, "columns"):
            arr = self._arr(cols, skipna)
            expr = F.aggregate(arr, F.lit(0.0), lambda a, x: a + x) / F.size(arr)
            return self._rowwise(cols, expr, "mean")
        return self._reduce0(F.avg, cols, skipna)

    def std(self, axis: int = 0, skipna: bool = True, ddof: int = 1) -> DataFrame:
        """Reference: core.py:390-404 (defective there — computes count).

        Generic ddof via stddev_samp * sqrt((n-1)/(n-ddof)); Spark's stddev
        is the distributed Welford/M2 merge the reference's chunk/combine/
        aggregate contract describes.
        """
        cols = _numeric_cols(self._df)
        if axis in (1, "columns"):
            arr = self._arr(cols, skipna)
            n = F.size(arr)
            mean = F.aggregate(arr, F.lit(0.0), lambda a, x: a + x) / n
            m2 = F.aggregate(arr, F.lit(0.0), lambda a, x: a + (x - mean) * (x - mean))
            expr = F.when(n > ddof, F.sqrt(m2 / (n - F.lit(ddof)))).otherwise(F.lit(None))
            return self._rowwise(cols, expr, "std")

        def _std(col: Column) -> Column:
            if ddof == 1:
                return F.stddev_samp(col)
            if ddof == 0:
                return F.stddev_pop(col)
            n = F.count(col)
            return F.when(
                n > ddof,
                F.stddev_samp(col) * F.sqrt((n - 1).cast("double") / (n - ddof)),
            ).otherwise(F.lit(None))

        return self._reduce0(_std, cols, skipna)

    def all(self, axis: int = 0, skipna: bool = True) -> DataFrame:
        """Reference: core.py:264-275. Non-zero/true → True, pandas truthiness."""
        cols = _bool_like_cols(self._df)
        def to_bool(c: str) -> Column:
            col = F.col(c)
            b = col.cast("boolean") if isinstance(self._df.schema[c].dataType, T.BooleanType) else (col != 0)
            return b if skipna else F.coalesce(b, F.lit(True))
        if axis in (1, "columns"):
            expr = F.aggregate(F.array(*[F.coalesce(to_bool(c), F.lit(True)) for c in cols]), F.lit(True), lambda a, x: a & x)
            return self._rowwise(cols, expr, "all")
        return self._df.agg(*[F.coalesce(F.bool_and(to_bool(c)), F.lit(True)).alias(c) for c in cols])

    def any(self, axis: int = 0, skipna: bool = True) -> DataFrame:
        """Reference: core.py:277-288."""
        cols = _bool_like_cols(self._df)
        def to_bool(c: str) -> Column:
            col = F.col(c)
            b = col.cast("boolean") if isinstance(self._df.schema[c].dataType, T.BooleanType) else (col != 0)
            return b if skipna else F.coalesce(b, F.lit(False))
        if axis in (1, "columns"):
            expr = F.aggregate(F.array(*[F.coalesce(to_bool(c), F.lit(False)) for c in cols]), F.lit(False), lambda a, x: a | x)
            return self._rowwise(cols, expr, "any")
        return self._df.agg(*[F.coalesce(F.bool_or(to_bool(c)), F.lit(False)).alias(c) for c in cols])

    # -- relational veneer (reference duck-type surface, utils.py:319-336:
    # is_dataframe_like requires `merge` + `groupby` attributes; the merge
    # subsystem was the never-written multi.py, core.py:445) ----------------
    def merge(
        self,
        other: "LDFrame | DataFrame",
        on: str | Sequence[str] | None = None,
        how: str = "inner",
        suffixes: tuple[str, str] = ("_x", "_y"),
    ) -> "LDFrame":
        """pandas ``merge`` → Spark join. Overlapping non-key columns get
        pandas-style suffixes. how: inner/left/right/outer/cross/semi/anti."""
        right = other._df if isinstance(other, LDFrame) else other
        how = {"outer": "full"}.get(how, how)
        if how == "cross":
            return LDFrame(self._df.crossJoin(right))
        keys = [on] if isinstance(on, str) else list(on or [])
        overlap = (set(self._df.columns) & set(right.columns)) - set(keys)
        left_df = self._df
        for c in overlap:
            left_df = left_df.withColumnRenamed(c, c + suffixes[0])
            right = right.withColumnRenamed(c, c + suffixes[1])
        return LDFrame(left_df.join(right, keys or None, how))

    def groupby(self, by: str | Sequence[str]) -> "LDGroupBy":
        """pandas ``groupby`` → Spark groupBy with named-agg surface."""
        keys = [by] if isinstance(by, str) else list(by)
        return LDGroupBy(self._df, keys)

    def sort_values(self, by: str | Sequence[str], ascending: bool | Sequence[bool] = True) -> "LDFrame":
        keys = [by] if isinstance(by, str) else list(by)
        asc = [ascending] * len(keys) if isinstance(ascending, bool) else list(ascending)
        cols = [F.col(k).asc() if a else F.col(k).desc() for k, a in zip(keys, asc)]
        return LDFrame(self._df.orderBy(*cols))

    def drop_duplicates(self, subset: Sequence[str] | None = None) -> "LDFrame":
        return LDFrame(self._df.dropDuplicates(list(subset) if subset else None))

    def rename(self, columns: dict[str, str]) -> "LDFrame":
        df = self._df
        for old, new in columns.items():
            df = df.withColumnRenamed(old, new)
        return LDFrame(df)

    def drop(self, columns: str | Sequence[str]) -> "LDFrame":
        cols = [columns] if isinstance(columns, str) else list(columns)
        return LDFrame(self._df.drop(*cols))

    def fillna(self, value) -> "LDFrame":
        return LDFrame(self._df.fillna(value))

    def dropna(self, subset: Sequence[str] | None = None, how: str = "any") -> "LDFrame":
        return LDFrame(self._df.dropna(how=how, subset=list(subset) if subset else None))

    def melt(
        self,
        id_vars: Sequence[str],
        value_vars: Sequence[str],
        var_name: str = "variable",
        value_name: str = "value",
    ) -> "LDFrame":
        """pandas ``melt`` (wide → long) — Spark's native ``unpivot``."""
        return LDFrame(
            self._df.unpivot(list(id_vars), list(value_vars), var_name, value_name)
        )

    def sample(self, fraction: float, seed: int | None = None) -> "LDFrame":
        """Bernoulli row sample. Deterministic for a fixed seed AND a fixed
        partitioning of the input (per-partition RNG streams) — at scale,
        pin the layout (repartition) before sampling when reproducibility
        matters."""
        return LDFrame(self._df.sample(fraction=fraction, seed=seed))

    def sample_by(self, col: str, fractions: dict, seed: int | None = None) -> "LDFrame":
        """Stratified sample: per-key fractions (pandas groupby-sample
        analog) — one pass, no shuffle."""
        return LDFrame(self._df.sampleBy(col, fractions, seed=seed))

    def describe(
        self,
        percentiles: Sequence[float] = (0.25, 0.5, 0.75),
        *,
        approx: bool = False,
        accuracy: int = 10000,
    ) -> DataFrame:
        """pandas ``describe``: count/mean/std/min/percentiles/max per
        numeric column, one output row per statistic (``summary`` column).

        Uses exact interpolated percentiles (same interpolation as
        pandas/DuckDB quantile_cont); one aggregation pass computes every
        cell, then a literal unpivot shapes the rows — no per-statistic
        rescans (unlike Spark's built-in ``describe`` which omits
        percentiles).

        ``approx=True`` is the 100 TB path: ``approx_percentile``
        (mergeable Greenwald-Khanna sketch, rank error ≤ n/accuracy,
        bounded memory) instead of exact ``percentile``'s full-column
        multiset buffer. Exact stays the default for pandas parity on
        small data.
        """
        cols = _numeric_cols(self._df)
        aggs: list[Column] = []
        for c in cols:
            aggs += [
                F.count(F.col(c)).cast("double").alias(f"{c}__count"),
                F.avg(F.col(c)).alias(f"{c}__mean"),
                F.stddev_samp(F.col(c)).alias(f"{c}__std"),
                F.min(F.col(c)).cast("double").alias(f"{c}__min"),
                # ONE percentile aggregate per column (array of requested
                # points): each F.percentile buffer holds the column's full
                # value multiset, so per-point aggregates would multiply
                # that state — 3 cols × 3 points = 9 copies; the array form
                # keeps exactly one buffer per column (measured 14.6 s →
                # ~5 s on the sf0.1 describe).
                (
                    F.approx_percentile(
                        F.col(c),
                        F.array(*[F.lit(p) for p in percentiles]),
                        F.lit(accuracy),
                    ).cast("array<double>")
                    if approx
                    else F.percentile(
                        F.col(c), F.array(*[F.lit(p) for p in percentiles])
                    )
                ).alias(f"{c}__pcts"),
                F.max(F.col(c)).cast("double").alias(f"{c}__max"),
            ]
        wide = self._df.agg(*aggs)
        for c in cols:
            for i, p in enumerate(percentiles):
                wide = wide.withColumn(
                    f"{c}__p{int(p * 100)}", F.element_at(F.col(f"{c}__pcts"), i + 1)
                )
        stats = (
            ["count", "mean", "std", "min"]
            + [f"p{int(p * 100)}" for p in percentiles]
            + ["max"]
        )
        rows = F.array(
            *[
                F.struct(
                    F.lit("count" if s == "count" else s).alias("summary"),
                    *[F.col(f"{c}__{s}").alias(c) for c in cols],
                )
                for s in stats
            ]
        )
        return wide.select(F.explode(rows).alias("r")).select("r.*")

    def head(self, n: int = 5) -> pd.DataFrame:
        """Driver-side peek (reference analog: the 250 KB sample frame,
        io.py:84-88) — the only other driver-materializing exit besides
        ``to_pandas``."""
        return self._df.limit(n).toPandas()

    # -- UDF surface (reference core.py:171-262, 407-548) --------------------
    def apply(
        self,
        func: Callable[..., Any],
        axis: int = 1,
        args: tuple = (),
        meta: T.StructType | str | None = None,
        **kwds: Any,
    ) -> "LDFrame":
        """Row-wise UDF with pandas semantics, Arrow-batched.

        Reference: ``DataFrame.apply`` (core.py:171-262) ships
        ``df.apply(func, args=args, axis=1, **kwds)`` per CSV chunk; axis=0
        is rejected there (core.py:246-251) and here. ``meta`` is the
        mandatory output schema (the Dask meta contract, core.py:221-237).
        """
        if axis not in (1, "columns"):
            raise NotImplementedError("apply(axis=0) is not supported (parity with reference core.py:246-251)")
        if meta is None:
            raise ValueError("apply requires `meta` (output schema) — Spark needs a declared return schema")

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = pdf.apply(func, axis=1, args=args, **kwds)
                if isinstance(out, pd.Series):
                    out = out.to_frame(name=meta_names[0] if meta_names else "apply")
                yield out

        schema = meta if isinstance(meta, T.StructType) else T._parse_datatype_string(meta)
        meta_names = [f.name for f in schema.fields]
        return LDFrame(self._df.mapInPandas(run, schema))

    def map_partitions(
        self,
        func: Callable[..., pd.DataFrame],
        meta: T.StructType | str,
        *,
        partition_info: bool = False,
    ) -> "LDFrame":
        """Apply ``func(pandas_partition) -> pandas_frame`` per partition.

        Reference: ``map_partitions`` (core.py:407-548, dead stratum).
        ``partition_info`` mirrors its injected ``{'number': n, 'division': d}``
        (core.py:434-435, 531-545) via ``spark_partition_id``. Spark enforces
        the declared schema on returned batches — the reference's
        ``enforce_metadata=True``.
        """
        schema = meta if isinstance(meta, T.StructType) else T._parse_datatype_string(meta)
        src = self._df
        if partition_info:
            src = src.withColumn("__partition_id", F.spark_partition_id())

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if partition_info:
                    pid = int(pdf["__partition_id"].iloc[0]) if len(pdf) else -1
                    pdf = pdf.drop(columns=["__partition_id"])
                    yield func(pdf, partition_info={"number": pid, "division": None})
                else:
                    yield func(pdf)

        return LDFrame(src.mapInPandas(run, schema))

    def reduction(
        self,
        chunk: Callable[[pd.DataFrame], pd.DataFrame],
        aggregate: Callable[[pd.DataFrame], pd.DataFrame],
        meta: T.StructType | str,
        chunk_meta: T.StructType | str | None = None,
        combine: Callable[[pd.DataFrame], pd.DataFrame] | None = None,
        split_every: int | None = None,
    ) -> DataFrame:
        """Generic chunk→combine→aggregate tree reduction (reference
        core.py:15-144, defaults at core.py:59).

        ``chunk`` runs per partition (map-side, Arrow-batched). When
        ``combine``/``split_every`` are given, partials are reduced through
        tree levels of ``combine`` — each level groups ``split_every``
        upstream partitions' partials into one ``combine`` call (a shuffle
        of the tiny partial rows, not the data) — until at most
        ``split_every`` partials remain; then ``aggregate`` runs once over
        their concat. With neither given, partials feed ``aggregate``
        directly (the reference's ``split_every=False``) — the right shape
        while partials are one row per partition; pass ``combine`` when
        chunk output is wide enough that a single final task would bottleneck.

        ``combine`` defaults to ``aggregate`` (reference contract), which
        requires ``meta == chunk_meta``; intermediate combine output must
        conform to ``chunk_meta``.
        """
        chunk_schema = chunk_meta or meta
        cs = chunk_schema if isinstance(chunk_schema, T.StructType) else T._parse_datatype_string(chunk_schema)
        fs = meta if isinstance(meta, T.StructType) else T._parse_datatype_string(meta)

        def run_chunk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            parts = [chunk(p) for p in batches if len(p)]
            if parts:
                yield pd.concat(parts, ignore_index=True)

        def run_agg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            allp = [p for p in batches if len(p)]
            yield aggregate(pd.concat(allp, ignore_index=True) if allp else pd.DataFrame())

        partials = self._df.mapInPandas(run_chunk, cs)
        if combine is not None or split_every:
            se = int(split_every) if split_every else 8
            if se < 2:
                raise ValueError("split_every must be >= 2")
            comb = combine if combine is not None else aggregate

            def run_combine(pdf: pd.DataFrame) -> pd.DataFrame:
                return comb(pdf.drop(columns=["__gid"]))

            n = self._df.rdd.getNumPartitions()
            while n > se:
                n = -(-n // se)  # ceil: groups remaining after this level
                # repartition to exactly n partitions FIRST, then one
                # combine per physical partition: after the first level
                # partials are hash-scattered across shuffle partitions,
                # so dividing raw spark_partition_id by se would group
                # partitions (mostly empty), not partials, and the
                # "<= split_every reach aggregate" contract would not
                # actually hold
                partials = (
                    partials.repartition(n)
                    .withColumn("__gid", F.spark_partition_id().cast("long"))
                    .groupBy("__gid")
                    .applyInPandas(run_combine, cs)
                )
        return partials.coalesce(1).mapInPandas(run_agg, fs)
