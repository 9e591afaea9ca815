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

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

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
    **extra_options: str,
) -> DataFrame:
    """Load a CSV with pandas-flavored options into a Spark DataFrame.

    ``npartitions`` (reference default 4, ``io.py:73``) is honored as a
    *minimum* split hint; by default Spark sizes partitions by bytes
    (``spark.sql.files.maxPartitionBytes``), which is the correct policy at
    100 TB — a fixed small npartitions would serialize the scan.
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
        opts["nullValue"] = na_values[0]  # Spark supports a single nullValue token
    opts.update(extra_options)

    schema: T.StructType | None = None
    if names is not None and dtype is not None:
        fields = []
        for n in names:
            dt = _PANDAS_TO_SPARK_DTYPE.get(str(dtype.get(n, "string")).lower(), T.StringType())
            if parse_dates and n in parse_dates:
                dt = T.TimestampType()
            fields.append(T.StructField(n, dt, True))
        schema = T.StructType(fields)

    if schema is not None:
        reader = reader.schema(schema)
    else:
        opts["inferSchema"] = str(sample_infer).lower()

    df = reader.options(**opts).csv(filepath)

    if names is not None and schema is None:
        if len(names) != len(df.columns):
            raise ValueError(f"names has {len(names)} entries but CSV has {len(df.columns)} columns")
        df = df.toDF(*names)
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
    if dtype is not None and schema is None:
        for c, dt in dtype.items():
            spark_dt = _PANDAS_TO_SPARK_DTYPE.get(str(dt).lower())
            if spark_dt is None:
                raise ValueError(f"unsupported dtype for column {c}: {dt}")
            df = df.withColumn(c, df[c].cast(spark_dt))
    if parse_dates and schema is None:
        for c in parse_dates:
            df = df.withColumn(c, df[c].cast("timestamp"))
    if skiprows:
        raise ValueError("skiprows is not supported distributed (no stable row order in a parallel scan)")
    if usecols is not None:
        df = df.select(*usecols)
    if nrows is not None:
        df = df.limit(nrows)
    if npartitions is not None and df.rdd.getNumPartitions() < npartitions:
        df = df.repartition(npartitions)
    return df
