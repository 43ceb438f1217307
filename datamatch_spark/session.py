"""SparkSession factory with the engine's recommended configs.

Local mode is a stand-in for a multi-executor cluster: partitioning,
AQE and skew-join settings are chosen so the same plans hold on a
1000-executor deployment (submit via ``spark-submit --py-files``).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONFS = {
    # AQE: runtime coalescing + skew-join splitting — essential for the
    # blocked self-join whose block sizes are data-dependent.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for all pandas UDF traffic (the scoring kernels).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # pairs tables are narrow; bigger maxRecordsPerBatch amortizes
    # Arrow transfer overhead in the scoring UDFs.
    "spark.sql.execution.arrow.maxRecordsPerBatch": "20000",
}


def effective_parallelism(spark: SparkSession) -> int:
    """Race-free total-core estimate for partition-count decisions.

    ``sc.defaultParallelism`` on a standalone cluster is
    ``max(totalCores, 2)`` — and totalCores is 0 until executors
    REGISTER, so any operator that sizes its partitioning in a fresh
    ``local-cluster``/standalone session before the first executor
    heartbeat sees 2 and serializes its pre-shuffle stages for the
    whole job. The explicitly-configured shuffle partitions (set to
    the intended total core count by :func:`get_spark` and every
    deploy script) is the race-free floor; whichever is larger wins.
    """
    try:
        conf_p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        conf_p = 0  # unset, or non-numeric under exotic AQE configs
    return max(spark.sparkContext.defaultParallelism, conf_p, 1)


def checkpoint_storage_level():
    """Storage level for lineage-truncating ``localCheckpoint`` calls.

    Default: ``MEMORY_AND_DISK_DESER`` — Spark's own localCheckpoint
    default, kept after measurement. The serialized variant looked
    attractive on GC metrics (the sf1 scoring stage holds 168M
    checkpointed pair rows as a live object graph and measured 682–1224
    task-seconds of JVM GC, vs 10–112 serialized), but an INTERLEAVED
    same-JVM A/B (scripts/probe_sf1_er.py harness, alternating the
    level per pass so warm-up and host window cancel) showed serialized
    is 30–60% SLOWER on wall: ser 46/99/50 s vs deser 35/30/35 s — the
    row-block serialization CPU (JVM executor CPU roughly doubles)
    costs more wall than the young-GC scans it removes.

    ``SPARK_GRAFT_CHECKPOINT_LEVEL`` overrides by name: ``DISK_ONLY``
    caps executor heap at cluster scale (the standard choice when
    storage memory competes with execution), ``MEMORY_AND_DISK`` for
    the serialized trade.
    """
    from pyspark.storagelevel import StorageLevel

    name = os.environ.get(
        "SPARK_GRAFT_CHECKPOINT_LEVEL", "MEMORY_AND_DISK_DESER"
    )
    return getattr(StorageLevel, name)


def iceberg_confs(catalog: str, warehouse: str) -> dict:
    """Session configs that register a Hadoop-backed Iceberg catalog
    (the standard public Iceberg-Spark runtime wiring). The runtime
    jar (``iceberg-spark-runtime``) must be on the classpath —
    ``spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-
    <spark_ver>_<scala_ver>:<iceberg_ver>`` on a real cluster."""
    return {
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
    }


def get_spark(
    master: str | None = None,
    app_name: str = "datamatch-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
    iceberg_warehouse: str | None = None,
    iceberg_catalog: str = "local",
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    ``master="inherit"`` never calls ``builder.master()`` — use it under
    spark-submit so the submit-time ``--master`` conf wins (builder
    options would override it); shuffle partitions are then also left
    to the submit conf unless passed explicitly.
    ``shuffle_partitions`` defaults to the local core count so that
    local runs don't pay 200 empty-partition task launches.

    ``iceberg_warehouse``: when set, the session registers an Iceberg
    catalog named ``iceberg_catalog`` over that warehouse path (see
    :func:`iceberg_confs`; requires the Iceberg runtime jar). When
    unset — the sandbox default — stage resumability is provided by
    the parquet+manifest path (``checkpointing.StageManifest``), which
    implements the same commit contract without the jar.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        if master == "inherit":
            # the submit environment decides parallelism; Spark's own
            # default (or a submit-time conf) governs shuffle width
            shuffle_partitions = None
        elif master.startswith("local["):
            # 'local[N,maxFailures]' is a legal Spark master form —
            # only the first field is the core count
            inner = master[len("local[") : -1].split(",")[0]
            # local[*] means THIS machine's core count, not the
            # SPARK_GRAFT_CPUS default (review r5: a 4-core box would
            # get 32 shuffle partitions — exactly the empty-partition
            # task launches this default exists to avoid)
            shuffle_partitions = (
                (os.cpu_count() or cpus) if inner == "*" else max(int(inner), 1)
            )
        else:
            shuffle_partitions = 200
    # master="inherit": do NOT call builder.master() — builder options
    # override the submit-time conf, so a cluster job launched via
    # spark-submit --master yarn would otherwise silently run local.
    # The master then comes from the existing gateway / spark.master.
    if master == "inherit":
        builder = SparkSession.builder.appName(app_name)
    else:
        builder = SparkSession.builder.master(master).appName(app_name)
    for k, v in DEFAULT_CONFS.items():
        builder = builder.config(k, v)
    if shuffle_partitions is not None:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(shuffle_partitions)
        )
    builder = builder.config("spark.ui.enabled", "false")
    if iceberg_warehouse:
        for k, v in iceberg_confs(iceberg_catalog, iceberg_warehouse).items():
            builder = builder.config(k, v)
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, str(v))
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
