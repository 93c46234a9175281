"""SparkSession factory with scale-appropriate defaults.

Defaults here are the ones that matter at 100 TB just as much as on
``local[32]``: AQE on (runtime coalescing + skew-join splitting for the
Zipf-skewed term joins), Arrow on (every analysis kernel is a pandas UDF),
and a shuffle-partition count that callers override per data size.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("ALIX_SHUFFLE_PARTITIONS", "32"))


def get_spark(
    app_name: str = "alix_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` in the sandbox; on a
    real cluster it is supplied by spark-submit and must be left None.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and not os.environ.get("SPARK_MASTER_SET"):
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    conf = {
        "spark.sql.shuffle.partitions": str(
            shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
        ),
        # AQE: runtime partition coalescing + automatic skew-join splitting.
        # Term-keyed shuffles are Zipf-skewed by nature (SURVEY.md §7.4).
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # All analysis kernels are Arrow-vectorized pandas UDFs.
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
        # Keep driver results small by construction (top-k everywhere), but
        # be explicit about the guard.
        "spark.driver.maxResultSize": "2g",
        "spark.ui.enabled": "false",
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
