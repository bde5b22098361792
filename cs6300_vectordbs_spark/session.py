"""SparkSession builder with scale-aware defaults.

Local testing runs on local[N] but every conf here is chosen to also be
the right default on a large cluster: AQE (runtime re-plan, skew-join
splitting, shuffle coalescing), Arrow for the few Pandas-UDF paths, and
a broadcast threshold big enough that dimension tables and query
batches broadcast instead of shuffling the corpus.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "cs6300-vectordbs-spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS or all cores. Shuffle
    partitions default to 2x parallelism locally; on a real cluster AQE
    coalescing makes the static number mostly irrelevant.
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    if shuffle_partitions is None:
        try:
            shuffle_partitions = max(int(str(cpus)), 8)
        except ValueError:
            shuffle_partitions = 32

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # AQE: runtime plan fixes — shuffle coalesce, skew-join split,
        # dynamic broadcast conversion. Essential at 100 TB, harmless at sf0.001.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Deterministic event-time semantics: the NTZ→LTZ cast in
        # io.normalize_ts and all date_trunc/window math run in UTC, so
        # wall-clock values round-trip and match the DuckDB oracles.
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow transfer for the (rare) pandas-UDF paths (embedding stage,
        # multimodal decode) — batch columnar, not row pickling.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Query batches and dimension tables are small; broadcast them
        # rather than shuffling the big fact/corpus side.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # HotSpot refuses to JIT-compile methods over 8000 bytecodes
        # (DontCompileHugeMethods, on by default) — and this engine's
        # statically-unrolled vector chains (functions/vector.py)
        # routinely codegen into single methods past that limit when
        # they land in a Filter/Join consume path, which then runs
        # INTERPRETED. Measured r09 on the IVF near-dup self-join at
        # sf0.1: 4.4 s -> 1.0 s from this flag alone (jstack showed the
        # hot frame stuck in the un-JIT-ed GeneratedIterator). Applied
        # to the driver (the only JVM in local mode) and executors (the
        # same generated code runs there on a cluster).
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:-DontCompileHugeMethods",
        )
        .config(
            "spark.executor.extraJavaOptions",
            "-XX:-DontCompileHugeMethods",
        )
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
