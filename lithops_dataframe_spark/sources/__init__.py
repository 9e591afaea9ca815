"""Sources & sinks: CSV (pandas option surface), Parquet/JSON/ORC, writers."""

from lithops_dataframe_spark.sources.csv import read_csv
from lithops_dataframe_spark.sources.io import read_parquet, read_json, read_orc, write

__all__ = ["read_csv", "read_parquet", "read_json", "read_orc", "write"]
