"""Query plan library.

Every implemented operator/query from SURVEY.md §2 registers itself here as
a named pair: a PySpark builder ``(spark, sf_dir) -> DataFrame`` and (when
SQL-expressible) an equivalent ANSI-SQL oracle string for DuckDB. The
driver contract in ``__spark_entry__.py`` re-exports this registry.
"""

from lithops_dataframe_spark.plans.registry import (
    QUERIES,
    ORACLES,
    register,
    query_names,
    ordered_queries,
)

# Importing the modules populates the registry.
from lithops_dataframe_spark.plans import relational  # noqa: F401
from lithops_dataframe_spark.plans import reductions  # noqa: F401
from lithops_dataframe_spark.plans import joins_q  # noqa: F401
from lithops_dataframe_spark.plans import windows_q  # noqa: F401
from lithops_dataframe_spark.plans import setops_q  # noqa: F401
from lithops_dataframe_spark.plans import scalars_q  # noqa: F401
from lithops_dataframe_spark.plans import dedup_q  # noqa: F401
from lithops_dataframe_spark.plans import similarity_q  # noqa: F401
from lithops_dataframe_spark.plans import text_q  # noqa: F401
from lithops_dataframe_spark.plans import multimodal_q  # noqa: F401
from lithops_dataframe_spark.plans import codecs_q  # noqa: F401
from lithops_dataframe_spark.plans import sketches_q  # noqa: F401
from lithops_dataframe_spark.plans import classifier_q  # noqa: F401
from lithops_dataframe_spark.plans import pca_q  # noqa: F401
from lithops_dataframe_spark.plans import lm_q  # noqa: F401
from lithops_dataframe_spark.plans import pyds_q  # noqa: F401
from lithops_dataframe_spark.plans import retrieval_q  # noqa: F401
from lithops_dataframe_spark.plans import dq_q  # noqa: F401
from lithops_dataframe_spark.plans import pq_q  # noqa: F401
from lithops_dataframe_spark.plans import streaming_q  # noqa: F401
from lithops_dataframe_spark.plans import udf_q  # noqa: F401
from lithops_dataframe_spark.plans import tpch_more  # noqa: F401
from lithops_dataframe_spark.plans import tpch_rest  # noqa: F401
from lithops_dataframe_spark.plans import traindata_q  # noqa: F401
from lithops_dataframe_spark.plans import sql_q  # noqa: F401
from lithops_dataframe_spark.plans import rollup_q  # noqa: F401
from lithops_dataframe_spark.plans import describe_q  # noqa: F401
from lithops_dataframe_spark.plans import pipeline_q  # noqa: F401
from lithops_dataframe_spark.plans import funnel_q  # noqa: F401
from lithops_dataframe_spark.plans import kmeans_q  # noqa: F401
from lithops_dataframe_spark.plans import io_q  # noqa: F401
from lithops_dataframe_spark.plans import selection_q  # noqa: F401
from lithops_dataframe_spark.plans import recsys_q  # noqa: F401

__all__ = ["QUERIES", "ORACLES", "register", "query_names", "ordered_queries"]
