"""lithops_dataframe_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
``cloudbutton/lithops-dataframe`` (pandas DataFrames over serverless
functions), re-expressed Spark-first: the logical plan is declared with
the DataFrame/SQL API and Catalyst + Tungsten pick the physical strategy.

Layout
------
- :mod:`~lithops_dataframe_spark.session`   — SparkSession factory (AQE on, tuned for local[N] and cluster)
- :mod:`~lithops_dataframe_spark.catalog`   — fixture/table loaders for the star schema
- :mod:`~lithops_dataframe_spark.sources`   — readers/writers (CSV with the pandas option surface, parquet/json/orc)
- :mod:`~lithops_dataframe_spark.frame`     — pandas-flavored veneer (reductions with skipna/min_count/ddof, apply, map_partitions)
- :mod:`~lithops_dataframe_spark.operators` — joins (as-of/range), dedup, similarity search (LSH/IVF/PQ/ADC), sketches (Bloom/CMS), clustering, multimodal, Z-order layout
- :mod:`~lithops_dataframe_spark.functions` — hashing, text features, pure-stdlib media codecs (PNG/BMP/GIF/PPM/WAV)
- :mod:`~lithops_dataframe_spark.plans`     — registered query library (TPC-H shapes, LLM-pipeline ops, each paired with a DuckDB oracle)
- :mod:`~lithops_dataframe_spark.streaming` — Structured Streaming slice over the events table

The reference's capability surface is documented in SURVEY.md; each module
cites the reference file:line whose semantics it re-implements.
"""

from lithops_dataframe_spark.session import get_spark, stop_spark
from lithops_dataframe_spark.catalog import load_tables, register_views
from lithops_dataframe_spark.sources.csv import read_csv
from lithops_dataframe_spark.frame import LDFrame, from_spark

__all__ = [
    "get_spark",
    "stop_spark",
    "load_tables",
    "register_views",
    "read_csv",
    "LDFrame",
    "from_spark",
]

__version__ = "0.1.0"
