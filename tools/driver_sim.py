"""Simulate the driver's verify gate locally.

Fresh-imports ``__spark_entry__``, smoke-runs ``entry(spark)``, then runs
every ``queries()[name]`` at sf0.01 against ``oracle_sql()[name]`` in DuckDB
with the driver's comparison shape: sorted column names, row count, and an
order-insensitive value-hash (columns sorted by name, floats %.9g,
None/NaN → NULL). Exits nonzero on any mismatch.

Usage: python tools/driver_sim.py [--engine-session] [sf_dir]

Default session is DRIVER-SHAPED (plain Spark 4 defaults + heap — the
parity gate; both r5 escapes were session divergence). --engine-session
runs the engine's tuned get_spark() instead: use it for the heavy sf0.1
float-boundary sweep, where the hunt is for data-dependent rounding ties
(session-independent) and the tuned session is several times faster; the
sf0.01 default-session run stays the parity gate.
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402

from lithops_dataframe_spark.catalog import TABLES, table_path  # noqa: E402


def driver_shaped_spark():
    """A session shaped like the DRIVER's, not the engine's tuned one.

    The driver passes its own SparkSession to entry()/queries() — plain
    Spark 4 defaults (ANSI on, 200 shuffle partitions, no legacy confs).
    Round-5 lesson: gating locally under the engine's tuned get_spark()
    (then ANSI-off) let an int32 overflow ship green and crash on the
    driver. The only non-defaults here are CAPACITY knobs, which change
    what fits, never what a query computes: the master string and the
    JVM heap (Spark's 1g default OOMs the heavy sf0.1 sweep queries —
    any real deployment sizes executor memory to the data).
    """
    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("driver-sim")
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    return spark


def complex_cols(df) -> list[str]:
    """Top-level array/map/struct/variant output columns — the driver's
    pandas canonicalizer (toPandas().sort_values over all columns) cannot
    sort/hash list cells, so these FAIL on the driver even when values are
    right (round-5 escape: emb_pca_power_iteration's v array<double>)."""
    from pyspark.sql import types as T

    bad = (T.ArrayType, T.MapType, T.StructType)
    out = []
    for f in df.schema.fields:
        if isinstance(f.dataType, bad) or f.dataType.typeName() == "variant":
            out.append(f"{f.name}:{f.dataType.simpleString()}")
    return out


def norm(v) -> str:
    """Type-strict normalizer: int 3 and float 3.0 MUST differ (the real
    driver distinguishes them — round-1 lesson: %.9g-collapsing them let
    four oracle-typing bugs ship 'green'). Decimals are also kept distinct
    from floats so oracles are forced to CAST to the exact Spark type."""
    import decimal

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return f"f:{v:.9g}"
    if isinstance(v, decimal.Decimal):
        return f"d:{v}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main() -> int:
    args = [a for a in sys.argv[1:]]
    engine = "--engine-session" in args
    args = [a for a in args if a != "--engine-session"]
    sf = args[0] if args else "/root/testdata/sf0.01"
    if engine:
        from lithops_dataframe_spark.session import get_spark

        spark = get_spark("driver-sim-engine")
    else:
        spark = driver_shaped_spark()

    df = entry_mod.entry(spark)
    rows = df.collect()
    print(f"entry rows: {len(rows)} schema: {df.schema.simpleString()}")
    assert len(rows) > 0, "entry() must return >0 rows"

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf, t)}')")

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    only = {n for n in os.environ.get("LDS_ONLY", "").split(",") if n}
    if only:
        qs = {n: f for n, f in qs.items() if n in only}
    fails = 0
    # iterate in queries() dict order — the driver sweeps a PREFIX of this
    # order (50 entries in round 1), so position matters; print it.
    for pos, name in enumerate(qs, 1):
        sdf = qs[name](spark, sf)
        bad = complex_cols(sdf)
        if bad:
            fails += 1
            print(f"FAIL [{pos:3d}] {name}: complex output columns {bad}")
            continue
        srows = [tuple(r) for r in sdf.collect()]
        scols = list(sdf.columns)
        if name in oracles:
            rel = con.sql(oracles[name])
            # Fetch through Arrow, not fetchall(): that is how DuckDB's
            # HUGEINT (SUM over BIGINT) degrades to float64 — the exact
            # behavior the driver's gate exhibits. fetchall() hides it.
            tbl = rel.arrow()
            dcols = list(tbl.column_names)
            dpy = [tbl.column(i).to_pylist() for i in range(tbl.num_columns)]
            drows = list(zip(*dpy)) if dpy else []
            ok = (
                sorted(scols) == sorted(dcols)
                and len(srows) == len(drows)
                and value_hash(scols, srows) == value_hash(dcols, drows)
            )
            fails += 0 if ok else 1
            print(f"{'OK  ' if ok else 'FAIL'} [{pos:3d}] {name}: rows {len(srows)}/{len(drows)}")
            if not ok and len(srows) == len(drows) and sorted(scols) == sorted(dcols):
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
                ls = sorted("|".join(norm(r[i]) for i in order_s) for r in srows)
                ld = sorted("|".join(norm(r[i]) for i in order_d) for r in drows)
                for a, b in zip(ls, ld):
                    if a != b:
                        print(f"   spark : {a}\n   duckdb: {b}")
                        break
        else:
            print(f"ROWS [{pos:3d}] {name}: {len(srows)} rows (no oracle)")
    print(f"FAILS: {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
