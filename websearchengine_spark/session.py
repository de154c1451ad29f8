"""SparkSession factory with the engine's standard configuration.

Tuned for correctness-at-scale semantics even though tests run on
``local[N]``: AQE on (runtime skew-join + partition coalescing), Arrow
enabled for all pandas UDF exchange, and a modest shuffle-partition default
that callers override per data size.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "websearchengine_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    # Make the package importable on executor workers.  On a real cluster
    # the pipeline ships via ``spark-submit --py-files`` (north_star); in
    # local mode the forked Python workers inherit PYTHONPATH, so export the
    # package's parent dir before the JVM starts.
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if pkg_parent not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_parent + (os.pathsep + pp if pp else "")
        )

    master = master or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
    if shuffle_partitions is None:
        # local[N] -> N shuffle partitions keeps small runs tight; a real
        # cluster sets this to ~2-3x total cores (or relies on AQE coalesce)
        n = master.removeprefix("local[").removesuffix("]")
        shuffle_partitions = 32 if n in ("*", "") or not n.isdigit() else max(int(n), 4)
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
