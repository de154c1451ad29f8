"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship BM25 top-k over the sf0.001 documents
table; ``queries()``/``oracle_sql()`` expose the engine's operator registry
(websearchengine_spark/plans/registry.py) for the driver's DuckDB
correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from websearchengine_spark.plans import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: BM25 (k1=1.2, b=0.75)
    conjunctive top-10 over the documents table."""
    return registry.q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (plus the
    training-data-pipeline ops); see plans/registry.py for the inventory."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL mirroring each Spark query; keys absent here
    fall back to the driver's rows-only check."""
    return registry.oracle_sql()
