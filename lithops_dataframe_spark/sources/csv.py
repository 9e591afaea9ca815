"""``read_csv`` — the reference's sole source, rebuilt on Spark's CSV reader.

Reference: ``read_csv`` at ``/root/reference/dataframe/io.py:13-88`` exposes
the full pandas kwarg surface, samples the first 250 KB to infer a schema,
and wraps ``(filepath, npartitions)`` as a lazy frame. Here the same options
map onto ``spark.read.csv``; Hadoop FS input splits give the byte-range
parallelism Lithops' ``chunk_n`` scatter provided (``core.py:259``), while
correctly handling headers/quoting at split boundaries — deliberately FIXING
the reference's chunk-header hazard (each worker re-parsed its chunk with
default options, ``core.py:255`` vs ``io.py:87``; SURVEY §1.3). One
authoritative schema applies to every partition.

Unsupported-on-Spark pandas kwargs raise ``ValueError`` loudly rather than
silently diverging.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_NUMERIC_DTYPES = {"int8", "int16", "int32", "int64", "float32", "float64"}
_FLOAT_DTYPES = {"float32", "float64"}

#: pandas kwarg → Spark CSV option, when the mapping is 1:1.
_DIRECT_OPTIONS = {
    "sep": "sep",
    "delimiter": "sep",
    "quotechar": "quote",
    "escapechar": "escape",
    "comment": "comment",
    "encoding": "encoding",
    "lineterminator": "lineSep",
    "skipinitialspace": "ignoreLeadingWhiteSpace",
}

_PANDAS_TO_SPARK_DTYPE = {
    "int8": T.ByteType(),
    "int16": T.ShortType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    "float32": T.FloatType(),
    "float64": T.DoubleType(),
    "bool": T.BooleanType(),
    "object": T.StringType(),
    "str": T.StringType(),
    "string": T.StringType(),
    "datetime64[ns]": T.TimestampType(),
}


def _snoop_head(spark: SparkSession, filepath: str, nbytes: int = 262144) -> bytes:
    """Driver-side bounded read of a file's first ``nbytes`` — local paths
    directly, anything with a scheme through the Hadoop FS API (so the
    same code path serves s3a/gs/abfss)."""
    if "://" not in filepath:
        with open(filepath, "rb") as f:
            return f.read(nbytes)
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(filepath)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.open(path)
    try:
        # Hadoop InputStream.read is allowed to return SHORT (object-store
        # streams often do): accumulate until nbytes or EOF, or the snooped
        # sample can silently truncate mid-header (ADVICE r4)
        arr = spark.sparkContext._gateway.new_array(jvm.byte, nbytes)
        got = 0
        while got < nbytes:
            n = stream.read(arr, got, nbytes - got)
            if n <= 0:
                break
            got += n
        if got <= 0:
            return b""
        return bytes(bytearray((b & 0xFF) for b in arr[:got]))
    finally:
        stream.close()


def read_csv(
    spark: SparkSession,
    filepath: str,
    *,
    sep: str = ",",
    header: int | str | None = "infer",
    names: Sequence[str] | None = None,
    usecols: Sequence[str] | None = None,
    dtype: dict[str, str] | None = None,
    parse_dates: Sequence[str] | None = None,
    date_format: str | None = None,
    na_values: str | Sequence[str] | None = None,
    true_values: Sequence[str] | None = None,
    false_values: Sequence[str] | None = None,
    quotechar: str = '"',
    escapechar: str | None = None,
    comment: str | None = None,
    encoding: str | None = None,
    skiprows: int | None = None,
    nrows: int | None = None,
    npartitions: int | None = None,
    sample_infer: bool = True,
    multiline: bool = False,
    thousands: str | None = None,
    decimal: str = ".",
    converters: dict[str, Callable] | None = None,
    **extra_options: str,
) -> DataFrame:
    """Load a CSV with pandas-flavored options into a Spark DataFrame.

    ``npartitions`` (reference default 4, ``io.py:73``) is honored as a
    *minimum* split hint; by default Spark sizes partitions by bytes
    (``spark.sql.files.maxPartitionBytes``), which is the correct policy at
    100 TB — a fixed small npartitions would serialize the scan.

    pandas-parity tail (reference forwards these at ``io.py:13-74``):
    multi-token ``na_values`` (first token via the reader, the rest nulled
    post-read), ``thousands``/``decimal`` separators (stripped via
    regexp_replace before the numeric cast — affected columns read as raw
    strings), and ``converters`` (one Arrow-batched mapInPandas pass over
    raw tokens; results re-stringified, combine with ``dtype`` to type
    them).

    ``skiprows`` is honored for SINGLE-file inputs in its two bounded
    forms (the cases a pandas porter actually hits): ``int n`` — a junk
    preamble before the header — and (r5) a LIST of raw 0-based line
    indices — scattered junk such as repeated mid-file header lines or
    known-corrupt rows. Pandas semantics both ways: indices count
    physical file lines, the header — when present — is the first KEPT
    line (snooped driver-side with a bounded read through the Hadoop FS
    API, so object-store paths work too), and the distributed scan drops
    the skipped rows via a ``monotonically_increasing_id`` filter
    (a ``>=`` prefix predicate for the contiguous int form, an ``isin``
    over the bounded id list otherwise; partition 0 of a single-file
    scan is the file head). Globs/directories still raise — a multi-file
    parallel scan has no stable global row order to skip from — as do
    callable ``skiprows`` (its domain is every global row index), list
    indices beyond the snooped head, and skipped lines containing
    unbalanced quotes (they would swallow following lines in the
    line-splitting scan). Known divergence from
    pandas: without an explicit ``dtype``, types are inferred from the
    snooped HEAD sample only, so a column whose first non-conforming
    token appears deep in a large file reads those cells as NULL
    (PERMISSIVE) instead of widening the whole column — pass ``dtype``
    for mixed-typed columns.
    """
    reader = spark.read
    opts: dict[str, str] = {
        "sep": sep,
        "quote": quotechar,
        "mode": "PERMISSIVE",
    }
    has_header = header == "infer" or header == 0
    if names is not None:
        has_header = header == 0  # explicit names: only skip line if header given
    # names + header=0 (pandas: REPLACE the file's header with names) must
    # still tell Spark header=true so the header LINE is skipped; the rename
    # happens via toDF(*names)/schema below. header=false here would parse
    # the header row as data (nulls/garbage after dtype casts).
    opts["header"] = str(has_header).lower()
    if escapechar:
        opts["escape"] = escapechar
    if comment:
        opts["comment"] = comment
    if encoding:
        opts["encoding"] = encoding
    if multiline:
        # quoted embedded newlines: files can no longer be split on line
        # boundaries, so each file parses as one unit — correctness over
        # parallelism; keep files small when records span lines
        opts["multiLine"] = "true"
    if date_format:
        opts["timestampFormat"] = date_format
    if na_values:
        if isinstance(na_values, str):
            na_values = [na_values]
        # Spark's reader takes ONE nullValue token; the remaining tokens
        # are mapped to null post-read on string-typed columns below.
        opts["nullValue"] = na_values[0]
    opts.update(extra_options)

    skip_total = 0
    skip_ids: list[int] | None = None  # non-contiguous raw-row ids to drop
    if callable(skiprows) and not isinstance(skiprows, bool):
        # pandas applies the callable to EVERY raw row index — only sound
        # when the whole file is known. If the file fits inside the snoop
        # bound (EOF reached), evaluate driver-side into the equivalent
        # index list and fall through to the list path (exact parity,
        # reference io.py:18 forwards the full pandas surface); larger
        # files keep the explicit refusal: a parallel scan has no stable
        # global row order to feed the callable.
        if any(ch in filepath for ch in "*?[") or "," in filepath:
            raise ValueError(
                "skiprows requires a single concrete file: a multi-file scan "
                "has no stable global row order to skip from"
            )
        _raw = _snoop_head(spark, filepath)
        if len(_raw) >= 262144:
            raise ValueError(
                "skiprows callable: file exceeds the snooped head bound — "
                "the callable's domain is every global row index, which a "
                "parallel scan has no stable order to provide; pass the "
                "materialized index list instead"
            )
        _n_lines = len(_raw.decode(encoding or "utf-8", errors="replace").splitlines())
        skiprows = [i for i in range(_n_lines) if skiprows(i)]
    _skip_empty = isinstance(skiprows, (list, tuple, set, range)) and len(skiprows) == 0
    if skiprows is not None and skiprows != 0 and not _skip_empty:
        if isinstance(skiprows, bool):
            raise ValueError(
                "skiprows: bounded int or bounded list of ints only — a "
                "bool is not a row count"
            )
        if isinstance(skiprows, int):
            if skiprows < 0:
                # pandas raises for negative ints too; without this the
                # empty range made skip_list[-1] an IndexError (ADVICE r5)
                raise ValueError("skiprows: must be >= 0")
            skip_list = list(range(skiprows))
        elif isinstance(skiprows, (list, tuple, set, range)) and all(
            isinstance(i, int) and not isinstance(i, bool) and i >= 0 for i in skiprows
        ):
            # pandas list semantics: 0-based RAW file line indices, applied
            # before header detection (r5 — closes the list-form gap; the
            # same head-snoop + monotonic-id machinery handles scattered
            # indices as long as they fall inside the snooped head)
            skip_list = sorted(set(skiprows))
        else:
            raise ValueError(
                "skiprows: only a bounded int or a bounded list of "
                "non-negative ints is supported distributed"
            )
        if any(ch in filepath for ch in "*?[") or "," in filepath:
            raise ValueError(
                "skiprows requires a single concrete file: a multi-file scan "
                "has no stable global row order to skip from"
            )
        import csv as _csvmod
        import io as _io

        head = _snoop_head(spark, filepath).decode(encoding or "utf-8", errors="replace")
        lines = head.splitlines()
        if not lines or skip_list[-1] >= len(lines):
            raise ValueError(
                f"skiprows max index {skip_list[-1]} falls outside the snooped "
                f"file head ({len(lines)} lines) — the skipped lines can't be "
                "validated or located reliably"
            )
        skip_set = set(skip_list)
        for idx in skip_list:
            if quotechar and lines[idx].count(quotechar) % 2:
                raise ValueError(
                    "skiprows: skipped line contains an unbalanced quote — it "
                    "would swallow following lines in the line-splitting scan"
                )
        # pandas: the header is the first line NOT skipped; the body is
        # every following non-skipped line
        first_kept = next(i for i in range(len(lines) + 1) if i not in skip_set)
        if first_kept >= len(lines):
            raise ValueError("skiprows drops every line in the snooped head")
        body = [lines[first_kept]] + [
            ln for i, ln in enumerate(lines) if i > first_kept and i not in skip_set
        ]
        if names is None:
            if not has_header:
                raise ValueError("skiprows without a header line requires names=")
            names = next(_csvmod.reader(_io.StringIO(body[0]), delimiter=sep, quotechar=quotechar))
        if dtype is None:
            import pandas as _pd

            # bounded driver-side type inference over the post-preamble
            # sample (the distributed reader can't infer — it would fold
            # the junk lines into every column's type)
            sample = "\n".join(body[:-1] if len(body) > 1 else body)
            pdf = _pd.read_csv(
                _io.StringIO(sample),
                sep=sep,
                header=0 if has_header else None,
                names=None if has_header else list(names),
                quotechar=quotechar,
                nrows=1000,
            )
            dtype = {
                str(names[i]): str(pdf.dtypes.iloc[i]) for i in range(len(names))
            }
        # the distributed read now runs header=false with the explicit
        # (names, dtype) schema; the skipped (+ header, when present) raw
        # rows are dropped by a monotonic-id filter below — a cheap >=
        # prefix predicate when the drop set is contiguous from 0, an
        # isin over the bounded id list otherwise
        drop_ids = sorted(skip_set | ({first_kept} if has_header else set()))
        if drop_ids == list(range(len(drop_ids))):
            skip_total = len(drop_ids)
        else:
            skip_ids = drop_ids
        has_header = False
        opts["header"] = "false"

    schema: T.StructType | None = None
    deferred: set[str] = set()  # columns read as string for post-processing
    if names is not None and dtype is not None:
        fields = []
        for n in names:
            dname = str(dtype.get(n, "string")).lower()
            dt = _PANDAS_TO_SPARK_DTYPE.get(dname, T.StringType())
            if parse_dates and n in parse_dates:
                dt = T.TimestampType()
            if converters and n in converters:
                # pandas: a converter sees the RAW string token (overrides
                # dtype for that column); cast happens after it runs
                dt = T.StringType()
                deferred.add(n)
            elif dname in _NUMERIC_DTYPES and (
                thousands is not None or (decimal != "." and dname in _FLOAT_DTYPES)
            ):
                # separator-laden numerics ("1,234.5" / "1.234,5") parse as
                # null under a typed reader schema; read the raw token and
                # strip/cast post-read instead
                dt = T.StringType()
                deferred.add(n)
            fields.append(T.StructField(n, dt, True))
        schema = T.StructType(fields)

    if schema is not None:
        reader = reader.schema(schema)
    else:
        # separators and converters need the RAW string tokens: schema
        # inference would pre-parse "1.234" as the double 1.234 and lose
        # the text the post-read strip/converter operates on
        raw_needed = bool(converters) or thousands is not None or decimal != "."
        opts["inferSchema"] = str(sample_infer and not raw_needed).lower()

    df = reader.options(**opts).csv(filepath)

    if skip_total or skip_ids:
        from pyspark.sql import functions as F

        # single-file scan: partition 0 is the file head (splits are taken
        # in offset order for one file), so ids 0..k index the head rows
        # exactly; later partitions' ids start at 2^33, far above any
        # bounded skip index
        mid = F.monotonically_increasing_id()
        if skip_ids:
            df = df.filter(~mid.isin(skip_ids))
        else:
            df = df.filter(mid >= F.lit(skip_total))

    if names is not None and schema is None:
        if len(names) != len(df.columns):
            raise ValueError(f"names has {len(names)} entries but CSV has {len(df.columns)} columns")
        df = df.toDF(*names)
    if converters:
        # pandas converters: arbitrary Python callables over raw string
        # tokens. This is the one genuinely Python-bound option, so it runs
        # as ONE Arrow-batched mapInPandas pass (never row-at-a-time);
        # results are re-stringified so the batch schema stays stable —
        # combine with dtype={col: ...} for a typed result column.
        import pandas as pd  # noqa: F401

        conv = dict(converters)
        out_schema = T.StructType(
            [
                T.StructField(f.name, T.StringType(), True) if f.name in conv else f
                for f in df.schema.fields
            ]
        )

        def _apply_converters(batches):
            for pdf in batches:
                for c, fn in conv.items():
                    pdf[c] = pdf[c].map(lambda v: None if v is None else str(fn(v)))
                yield pdf

        df = df.mapInPandas(_apply_converters, out_schema)
    if na_values and len(na_values) > 1:
        # remaining na tokens (reader handled na_values[0]): null them out
        # on every string-typed column before any cast sees them
        from pyspark.sql import functions as F

        rest = [str(v) for v in na_values]
        for f in df.schema.fields:
            if isinstance(f.dataType, T.StringType):
                df = df.withColumn(
                    f.name,
                    F.when(F.col(f.name).isin(rest), F.lit(None)).otherwise(F.col(f.name)),
                )
    if true_values or false_values:
        # pandas true_values/false_values: map the tokens to canonical
        # 'true'/'false' strings BEFORE any dtype cast, so a subsequent
        # bool cast (dtype={'col': 'bool'}) resolves them; columns stay
        # string-typed otherwise (Spark columns cannot mix types).
        from pyspark.sql import functions as F

        tv = list(true_values or [])
        fv = list(false_values or [])
        for f in df.schema.fields:
            if isinstance(f.dataType, T.StringType):
                df = df.withColumn(
                    f.name,
                    F.when(df[f.name].isin(tv), F.lit("true"))
                    .when(df[f.name].isin(fv), F.lit("false"))
                    .otherwise(df[f.name]),
                )
    if dtype is not None:
        from pyspark.sql import functions as F

        for c, dt in dtype.items():
            dname = str(dt).lower()
            spark_dt = _PANDAS_TO_SPARK_DTYPE.get(dname)
            if spark_dt is None:
                raise ValueError(f"unsupported dtype for column {c}: {dt}")
            if schema is not None and c not in deferred:
                continue  # already typed by the reader schema
            expr = df[c]
            if dname in _NUMERIC_DTYPES and thousands is not None:
                expr = F.regexp_replace(expr.cast("string"), re.escape(thousands), "")
            if dname in _FLOAT_DTYPES and decimal != ".":
                expr = F.regexp_replace(expr.cast("string"), re.escape(decimal), ".")
            df = df.withColumn(c, expr.cast(spark_dt))
    if parse_dates and schema is None:
        for c in parse_dates:
            df = df.withColumn(c, df[c].cast("timestamp"))
    if usecols is not None:
        df = df.select(*usecols)
    if nrows is not None:
        df = df.limit(nrows)
    if npartitions is not None and df.rdd.getNumPartitions() < npartitions:
        df = df.repartition(npartitions)
    return df
