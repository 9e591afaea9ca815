"""Compact triage for edge-sweep failures: run each named query on the
edge fixture and print ONE line per query — OK, or the crash class /
first row diff. Usage: python tools/edge_triage.py name1 name2 ..."""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")

import duckdb

from lithops_dataframe_spark.catalog import TABLES
from lithops_dataframe_spark.plans import ORACLES, QUERIES
from lithops_dataframe_spark.session import get_spark

from tests.edge_fixtures import build_edge_dir
from tests.conftest import _norm_cell


def main() -> None:
    names = sys.argv[1:]
    d = tempfile.mkdtemp(prefix="edge_triage_")
    build_edge_dir(d)
    con = duckdb.connect()
    con.execute("SET threads=1")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
        )
    spark = get_spark("edge-triage")
    for name in names:
        try:
            sdf = QUERIES[name](spark, d)
            sp_cols = sorted(sdf.columns)
            sp = sorted(
                (tuple(_norm_cell(r[c]) for c in sp_cols) for r in sdf.collect()),
                key=lambda t: tuple(str(x) for x in t),
            )
        except Exception as e:
            msg = str(e).split("\n")[0][:160]
            print(f"{name}: SPARK CRASH: {msg}")
            continue
        try:
            rel = con.sql(ORACLES[name])
            dk_cols = [x[0] for x in rel.description]
            idx = {c: i for i, c in enumerate(dk_cols)}
            dk = sorted(
                (
                    tuple(_norm_cell(r[idx[c]]) for c in sorted(dk_cols))
                    for r in rel.fetchall()
                ),
                key=lambda t: tuple(str(x) for x in t),
            )
        except Exception as e:
            msg = str(e).split("\n")[0][:160]
            print(f"{name}: ORACLE CRASH: {msg}")
            continue
        if sorted(sp_cols) != sorted(dk_cols):
            print(f"{name}: COLS {sp_cols} vs {dk_cols}")
            continue
        if len(sp) != len(dk):
            only_sp = [r for r in sp if r not in dk][:2]
            only_dk = [r for r in dk if r not in sp][:2]
            print(
                f"{name}: ROWS {len(sp)} vs {len(dk)}; spark-only {only_sp} "
                f"oracle-only {only_dk} (cols {sp_cols})"
            )
            continue
        bad = [(a, b) for a, b in zip(sp, dk) if a != b]
        if bad:
            print(f"{name}: DIFF {len(bad)} rows; first: spark {bad[0][0]} vs oracle {bad[0][1]} (cols {sp_cols})")
        else:
            print(f"{name}: OK")


if __name__ == "__main__":
    main()
