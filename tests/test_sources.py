"""Source/sink tests (SURVEY §2.1): read_csv option mapping (the reference's
sole source, io.py:13-88, with its chunk-header hazard deliberately fixed)
and the parquet/csv/json write sinks (ABSENT in the reference) with
round-trip fidelity, partitioned layout, and partition pruning."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from lithops_dataframe_spark.catalog import load_table
from lithops_dataframe_spark.sources.csv import read_csv
from lithops_dataframe_spark.sources.io import read_parquet, write

from tests.conftest import SF_SMOKE

CSV_BODY = "a,b,flag,when\n1,x,yes,2024-01-02\n2,y,no,2024-02-03\n3,,yes,2024-03-04\n"


@pytest.fixture()
def csv_path(tmp_path):
    p = tmp_path / "t.csv"
    p.write_text(CSV_BODY)
    return str(p)


def test_read_csv_header_infer(spark, csv_path):
    df = read_csv(spark, csv_path)
    assert df.columns == ["a", "b", "flag", "when"]
    assert df.count() == 3
    assert dict(df.dtypes)["a"] == "int"


def test_read_csv_usecols_and_dtype(spark, csv_path):
    df = read_csv(spark, csv_path, usecols=["a", "b"], dtype={"a": "float64"})
    assert df.columns == ["a", "b"]
    assert dict(df.dtypes)["a"] == "double"


def test_read_csv_true_false_values(spark, csv_path):
    df = read_csv(
        spark, csv_path, true_values=["yes"], false_values=["no"], dtype={"flag": "bool"}
    )
    got = {r["a"]: r["flag"] for r in df.collect()}
    assert got == {1: True, 2: False, 3: True}


def test_read_csv_parse_dates(spark, csv_path):
    df = read_csv(spark, csv_path, parse_dates=["when"])
    assert dict(df.dtypes)["when"] == "timestamp"


def test_read_csv_names_no_header(spark, tmp_path):
    p = tmp_path / "nh.csv"
    p.write_text("1,foo\n2,bar\n")
    df = read_csv(spark, str(p), names=["id", "name"])
    assert df.columns == ["id", "name"] and df.count() == 2


def test_read_csv_names_replace_header(spark, tmp_path):
    """pandas names + header=0: the file's header LINE is skipped and the
    columns take the given names — the header row must not surface as data."""
    p = tmp_path / "wh.csv"
    p.write_text("x,y\n1,foo\n2,bar\n")
    df = read_csv(spark, str(p), names=["id", "name"], header=0)
    assert df.columns == ["id", "name"]
    assert sorted(map(tuple, df.collect())) == [(1, "foo"), (2, "bar")]


def test_read_csv_names_header0_dtype_schema(spark, tmp_path):
    """names + header=0 + dtype (explicit schema path): header line skipped,
    schema applied — a parsed header row would cast to nulls and fail."""
    p = tmp_path / "whs.csv"
    p.write_text("x,y\n1,1.5\n2,2.5\n")
    df = read_csv(
        spark, str(p), names=["id", "val"], header=0, dtype={"id": "int64", "val": "float64"}
    )
    assert dict(df.dtypes) == {"id": "bigint", "val": "double"}
    assert sorted(map(tuple, df.collect())) == [(1, 1.5), (2, 2.5)]


def test_read_csv_skiprows_preamble_matches_pandas(spark, tmp_path):
    """Bounded skiprows on a single file: junk preamble, then header, then
    data — must equal pandas read_csv(skiprows=n) including inferred types."""
    import pandas as pd

    p = tmp_path / "junk.csv"
    p.write_text("# exported 2024-05-01\nsource: legacy system\n" + CSV_BODY)
    df = read_csv(spark, str(p), skiprows=2)
    exp = pd.read_csv(p, skiprows=2)
    assert df.columns == list(exp.columns)
    assert [f.dataType.simpleString() for f in df.schema.fields][:2] == ["bigint", "string"]
    got = sorted((r["a"], r["b"]) for r in df.collect())
    assert got == sorted(zip(exp["a"].tolist(), exp["b"].fillna("").map(lambda v: v or None)))


def test_read_csv_skiprows_names_header0(spark, tmp_path):
    import pandas as pd

    p = tmp_path / "junk2.csv"
    p.write_text("junk line\n" + CSV_BODY)
    names = ["c1", "c2", "c3", "c4"]
    df = read_csv(spark, str(p), skiprows=1, header=0, names=names, dtype={"c1": "int64"})
    exp = pd.read_csv(p, skiprows=1, header=0, names=names)
    assert df.columns == names
    assert sorted(r["c1"] for r in df.collect()) == sorted(exp["c1"].tolist())


def test_read_csv_skiprows_list_matches_pandas(spark, tmp_path):
    """Bounded LIST skiprows (r5): scattered raw-line indices — junk line,
    header, a mid-file repeated-header line, a corrupt data line — pandas
    semantics: indices count RAW file lines, header is the first kept
    line."""
    import pandas as pd

    p = tmp_path / "scattered.csv"
    p.write_text(
        "# junk preamble\n"  # 0 skipped
        "a,b,c,d\n"  # 1 header
        "1,x,0.5,true\n"  # 2
        "a,b,c,d\n"  # 3 skipped: repeated header mid-file
        "2,y,1.5,false\n"  # 4
        "CORRUPT;;;LINE\n"  # 5 skipped
        "3,z,2.5,true\n"  # 6
    )
    skip = [0, 3, 5]
    df = read_csv(spark, str(p), skiprows=skip)
    exp = pd.read_csv(p, skiprows=skip)
    assert df.columns == list(exp.columns)
    assert sorted(r["a"] for r in df.collect()) == sorted(exp["a"].tolist())
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "bigint", "string", "double", "boolean",
    ]


def test_read_csv_skiprows_rejected_forms(spark, csv_path, tmp_path):
    with pytest.raises(ValueError, match="single concrete file"):
        read_csv(spark, str(tmp_path / "*.csv"), skiprows=2)
    with pytest.raises(ValueError, match="single concrete file"):
        read_csv(spark, str(tmp_path / "*.csv"), skiprows=lambda i: i % 2 == 0)
    with pytest.raises(ValueError, match="bounded list of"):
        read_csv(spark, csv_path, skiprows=[0, -2])
    # negative INT must ValueError too, not IndexError on an empty
    # range's last element (ADVICE r5)
    with pytest.raises(ValueError, match="must be >= 0"):
        read_csv(spark, csv_path, skiprows=-1)
    with pytest.raises(ValueError, match="outside the snooped"):
        read_csv(spark, csv_path, skiprows=[0, 10_000_000])
    p = tmp_path / "badquote.csv"
    p.write_text('it"s junk\n' + CSV_BODY)
    with pytest.raises(ValueError, match="unbalanced quote"):
        read_csv(spark, str(p), skiprows=1)


def test_write_parquet_roundtrip(spark, tmp_path):
    src = load_table(spark, SF_SMOKE, "nation")
    out = str(tmp_path / "nation_pq")
    write(src, out, fmt="parquet")
    back = read_parquet(spark, out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_write_partitioned_parquet_prunes(spark, tmp_path):
    src = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_orderpriority")
    out = str(tmp_path / "orders_part")
    write(src, out, fmt="parquet", partition_by=["o_orderpriority"])
    back = read_parquet(spark, out).filter(F.col("o_orderpriority") == "1-URGENT")
    # partition pruning: the physical scan must touch only the matching dir
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert back.count() == src.filter(F.col("o_orderpriority") == "1-URGENT").count()
    assert "PartitionFilters" in plan or "o_orderpriority=1-URGENT" not in plan


def test_write_csv_roundtrip(spark, tmp_path):
    src = load_table(spark, SF_SMOKE, "region").select("r_regionkey", "r_name")
    out = str(tmp_path / "region_csv")
    write(src, out, fmt="csv", header="true")
    back = read_csv(spark, out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_write_orc_roundtrip(spark, tmp_path):
    from lithops_dataframe_spark.sources.io import read_orc

    src = load_table(spark, SF_SMOKE, "region").select("r_regionkey", "r_name")
    out = str(tmp_path / "region_orc")
    write(src, out, fmt="orc")
    back = read_orc(spark, out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_read_csv_gzip(spark, tmp_path):
    import gzip

    p = tmp_path / "t.csv.gz"
    with gzip.open(p, "wt") as f:
        f.write(CSV_BODY)
    df = read_csv(spark, str(p))
    assert df.count() == 3 and df.columns == ["a", "b", "flag", "when"]


def test_binary_file_source(spark, tmp_path):
    """binaryFile source — the multimodal ingestion path (SURVEY §2.11):
    opaque bytes + path/length metadata, no decode on read."""
    payloads = {f"img_{i}.bin": bytes([i]) * (10 + i) for i in range(3)}
    for name, data in payloads.items():
        (tmp_path / name).write_bytes(data)
    df = spark.read.format("binaryFile").load(str(tmp_path))
    rows = {r["path"].rsplit("/", 1)[-1]: (r["length"], bytes(r["content"])) for r in df.collect()}
    assert rows == {n: (len(d), d) for n, d in payloads.items()}


def test_payload_files_roundtrip(spark, tmp_path):
    """Executor-side per-object payload write + binaryFile read-back:
    content and doc ids survive bit-exact (the media-lake ingest path)."""
    from pyspark.sql import functions as F

    from lithops_dataframe_spark.operators.multimodal import (
        media_table,
        read_binary_files,
        write_payload_files,
    )

    docs = load_table(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < 20)
    media = media_table(docs)
    n = write_payload_files(media, str(tmp_path))
    want = {
        r["doc_id"]: bytes(r["payload"])
        for r in media.collect()
        if len(bytes(r["payload"])) > 0  # writer contract: non-empty only
    }
    assert n == len(want) > 0
    back = read_binary_files(spark, str(tmp_path), pattern="*.bin")
    got = {
        int(r["path"].rsplit("/", 1)[-1][: -len(".bin")]): bytes(r["content"])
        for r in back.collect()
    }
    assert got == want


def test_payload_writer_empty_duplicate_keeps_nonempty_min(spark, tmp_path):
    """ADVICE r11: a doc_id carrying BOTH an empty and a non-empty payload
    must keep the non-empty min — empty payloads are excluded before the
    key-collision min, never allowed to shadow a real object (a zero-byte
    object wouldn't round-trip through binaryFile anyway). A key with ONLY
    empty payloads gets no object at all."""
    from lithops_dataframe_spark.operators.multimodal import (
        media_table,
        read_binary_files,
        write_payload_files,
    )

    docs = spark.createDataFrame(
        [
            (1, "zz real payload", "en", "s0", 15),
            (1, "", "en", "s1", 0),  # empty duplicate: binary min, must lose
            (1, "aa real payload", "en", "s2", 15),  # non-empty min: must win
            (2, "", "en", "s0", 0),  # only-empty key: no object
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    n = write_payload_files(media_table(docs), str(tmp_path))
    assert n == 1
    back = read_binary_files(spark, str(tmp_path), pattern="*.bin").collect()
    assert len(back) == 1
    assert bytes(back[0]["content"]) == b"aa real payload"


def test_write_json_roundtrip(spark, tmp_path):
    from lithops_dataframe_spark.sources.io import read_json

    src = load_table(spark, SF_SMOKE, "region").select("r_regionkey", "r_name")
    out = str(tmp_path / "region_json")
    write(src, out, fmt="json")
    back = read_json(spark, out).select("r_regionkey", "r_name")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_read_csv_multi_na_values(spark, tmp_path):
    p = tmp_path / "na.csv"
    p.write_text("c1,c2\nNA,1\nn/a,2\n-,3\nok,4\n")
    df = read_csv(spark, str(p), na_values=["NA", "n/a", "-"])
    rows = {r["c2"]: r["c1"] for r in df.collect()}
    assert rows == {1: None, 2: None, 3: None, 4: "ok"}


def test_read_csv_thousands_decimal(spark, tmp_path):
    p = tmp_path / "eu.csv"
    p.write_text('n,price\n"1.234","1.234,56"\n"12","7,5"\n')
    df = read_csv(
        spark,
        str(p),
        dtype={"n": "int64", "price": "float64"},
        thousands=".",
        decimal=",",
    )
    got = sorted(map(tuple, df.select("n", "price").collect()))
    assert got == [(12, 7.5), (1234, 1234.56)]


def test_read_csv_thousands_decimal_with_names_schema(spark, tmp_path):
    """names + dtype normally produce a typed reader schema; separator
    columns must still defer to post-read string parsing."""
    p = tmp_path / "eu2.csv"
    p.write_text('"1.000","2,5",x\n"2.000","3,5",y\n')
    df = read_csv(
        spark,
        str(p),
        header=None,
        names=["n", "price", "tag"],
        dtype={"n": "int64", "price": "float64", "tag": "string"},
        thousands=".",
        decimal=",",
    )
    got = sorted(map(tuple, df.collect()))
    assert got == [(1000, 2.5, "x"), (2000, 3.5, "y")]


def test_read_csv_converters(spark, tmp_path):
    p = tmp_path / "conv.csv"
    p.write_text("name,v\nAlpha,1\nBETA,2\n")
    df = read_csv(spark, str(p), converters={"name": str.lower}, dtype={"v": "int64"})
    got = sorted(map(tuple, df.collect()))
    assert got == [("alpha", 1), ("beta", 2)]


def test_read_csv_converter_then_dtype(spark, tmp_path):
    """converters run on raw tokens; dtype casts their (re-stringified)
    output — pandas' converters-override-then-cast composition."""
    p = tmp_path / "conv2.csv"
    p.write_text("v\n10\n20\n")
    df = read_csv(
        spark, str(p), converters={"v": lambda s: int(s) * 3}, dtype={"v": "int64"}
    )
    assert sorted(r["v"] for r in df.collect()) == [30, 60]


def test_pyds_push_filters_prune_partitions(spark):
    """pushFilters contract (Spark 4.1): doc_id range predicates tighten
    the generated id range BEFORE partition planning; category equality is
    consumed; anything else is yielded back for Spark to re-apply."""
    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, IsNotNull, LessThan

    from lithops_dataframe_spark.sources.pyds import _DocsReader

    r = _DocsReader({"n": "1000", "n_parts": "8"})
    leftover = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("doc_id",), 300),
                LessThan(("doc_id",), 420),
                EqualTo(("category",), "cat3"),
                IsNotNull(("score",)),  # unsupported -> returned
            ]
        )
    )
    assert [type(f).__name__ for f in leftover] == ["IsNotNull"]
    parts = r.partitions()
    assert min(p.start for p in parts) == 300
    assert max(p.end for p in parts) == 420
    # rows materialized only from the pruned range, category consumed
    rows = [row for p in parts for row in r.read(p)]
    assert all(300 <= row[0] < 420 for row in rows)
    assert all(row[2] == "cat3" for row in rows)
    assert len(rows) == sum(1 for d in range(300, 420) if d % 7 == 3)


def test_pyds_pushdown_end_to_end(spark):
    from lithops_dataframe_spark.sources.pyds import register_sources

    register_sources(spark)
    df = (
        spark.read.format("lds_docs")
        .option("n", 1000)
        .option("n_parts", 4)
        .load()
        .filter("doc_id >= 100 AND doc_id < 150 AND category = 'cat1'")
    )
    got = sorted(r["doc_id"] for r in df.collect())
    assert got == [d for d in range(100, 150) if d % 7 == 1]


def test_read_csv_skiprows_callable_matches_pandas(spark, tmp_path):
    """Callable skiprows (r6): exact pandas parity when the whole file is
    known (fits the snoop bound) — the callable is evaluated driver-side
    over every raw line index and becomes the equivalent list."""
    import pandas as pd

    p = tmp_path / "call.csv"
    p.write_text(
        "# junk\n"  # 0
        "a,b\n"  # 1 header (first kept: callable skips 0 only among head)
        "1,x\n"  # 2
        "2,y\n"  # 3  skipped (odd raw index)
        "3,z\n"  # 4
        "4,w\n"  # 5  skipped
    )
    fn = lambda i: i == 0 or (i >= 3 and i % 2 == 1)  # noqa: E731
    df = read_csv(spark, str(p), skiprows=fn)
    exp = pd.read_csv(p, skiprows=fn)
    assert [tuple(r) for r in df.collect()] == list(map(tuple, exp.itertuples(index=False)))
    assert df.columns == list(exp.columns)


def test_read_csv_skiprows_callable_large_file_refused(spark, tmp_path):
    p = tmp_path / "big.csv"
    with open(p, "w") as f:
        f.write("a,b\n")
        for i in range(40_000):
            f.write(f"{i},xxxxxxxxxxxxxxxx\n")  # > 256 KiB snoop bound
    with pytest.raises(ValueError, match="exceeds the snooped head bound"):
        read_csv(spark, str(p), skiprows=lambda i: i % 2 == 0)
