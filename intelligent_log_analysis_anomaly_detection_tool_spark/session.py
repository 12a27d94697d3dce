"""SparkSession factory tuned for this engine.

Pins UTC (the reference parses timestamps through ``mktime`` which is
localtime-dependent, /root/reference/src/utils/TimeUtils.cpp:73-112; we pin
UTC everywhere and generate fixtures in UTC so semantics are reproducible),
enables AQE + skew-join handling (hot conversations are a first-class skew
concern at scale), and Arrow for the pandas-UDF parse stage.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_MIB = 1024 * 1024


def dir_bytes(path: str) -> int:
    """Total size of the data files under a (parquet) directory."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.startswith(("_", ".")):
                continue
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def derive_max_partition_bytes(
    input_bytes: int,
    parallelism: int,
    waves: int | None = None,
    floor: int | None = None,
    cap: int = 128 * _MIB,
) -> int:
    """Per-job input-split size: target ~``waves`` scan waves at the given
    parallelism, clamped to [floor, cap].

    Round-3/4 findings (BENCH.md): a CONSTANT split size cannot serve both
    ends of the scale — Spark's 128 MB default leaves a ~1 GB input as ~7
    one-minute straggler tasks on 8 cores (2->8 efficiency 0.595) — but
    small scan tasks are actively harmful on this engine: sub-~20 MB splits
    multiply the Arrow-parse per-task fixed cost and were measured
    catastrophic on the concurrent DAG at local[32] (61 s -> 137-139 s at
    both 4 MB and 8 MB splits, round 3 and round 4 independently). Hence:
    At LOW parallelism (< 16 cores) ``input_bytes / (waves x parallelism)``
    gives every core ~``waves`` tasks to level stragglers, with a 24 MB
    floor above the per-task-overhead knee: at 27.9M rows / 8 cores the
    round-4 matrix reads 310 s (derived 25.6 MB) vs ~395 s (128 MB
    stragglers) vs 572 s (4 MB shatter). At HIGH parallelism (>= 16 cores)
    the derivation returns the stock 128 MB cap unchanged: concurrency
    there comes from parallel DAG branches, not intra-stage scan width, and
    every sub-stock split size measured WORSE on the local[32] concurrent
    DAG (58 s at 128 MB vs 66-137 s at 96/24/8 MB — round-4 matrix), so
    any real multi-executor cluster sees Spark's stock scan behavior.
    Env overrides (SPARK_GRAFT_SCAN_WAVES / SPARK_GRAFT_SCAN_FLOOR /
    round-3 split knobs) win for studies."""
    if waves is None:
        waves = int(os.environ.get("SPARK_GRAFT_SCAN_WAVES", "4"))
    if floor is None:
        floor = int(os.environ.get("SPARK_GRAFT_SCAN_FLOOR", str(24 * _MIB)))
    if input_bytes <= 0 or parallelism <= 0:
        return cap
    if parallelism >= 16:
        return cap
    return int(min(cap, max(floor, input_bytes // (waves * parallelism))))


def get_spark(
    master: str | None = None,
    app_name: str = "log-transcript-pipeline",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    input_path: str | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's standard configs.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster pass ``None`` and let spark-submit supply the master. On a
    1000-executor cluster the same conf applies; only shuffle_partitions
    should scale with total cores (AQE coalesces the excess at runtime).
    """
    os.environ.setdefault("TZ", "UTC")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(8, int(cpus) if cpus.isdigit() else 32)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: runtime re-planning, partition coalescing, skew-join splitting.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # allow joins to reuse an existing subset-key partitioning instead
        # of reshuffling BOTH sides over all join keys: the pattern stage's
        # representative-string attach joins (conv_id, turn_idx) against a
        # frame already hash-partitioned by conv_id — with the stock
        # setting Spark re-exchanged the string-bearing side (plan-probed,
        # round 4); with subset co-partitioning it stays put
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
        # Arrow transfer for pandas UDFs (the parse stage is Arrow-batched).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        # Generous driver memory for local[32] runs on the 128 GiB box.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
    )
    if master.startswith("local"):
        # Per-job derived split sizing (round 4): when the caller names its
        # input, the split size targets ~4 scan waves per core instead of a
        # constant — see derive_max_partition_bytes for the full rationale
        # (constant 128 MB starves 8 cores on GB-scale inputs; constant 4 MB
        # shatters local[32]). The env knob remains the top-priority
        # override for single-stage studies; with neither, Spark's 128 MB
        # default stands (the 100 TB-correct value).
        default_split = "128m"
        if input_path is not None:
            n_cores = int(cpus) if cpus.isdigit() else 32
            if master.startswith("local["):
                inner = master[6:-1]
                if inner.isdigit():
                    n_cores = int(inner)
            default_split = str(
                derive_max_partition_bytes(dir_bytes(input_path), n_cores)
            )
        builder = (
            builder.config(
                "spark.sql.files.maxPartitionBytes",
                os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", default_split),
            ).config(
                "spark.sql.files.openCostInBytes",
                os.environ.get("SPARK_GRAFT_OPEN_COST_BYTES", "4194304"),
            )
        )
    # shuffle scratch on tmpfs when available: local-mode shuffles otherwise
    # contend on the (virtual) disk and cap multi-core scaling
    shm = os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local")
    try:
        os.makedirs(shm, exist_ok=True)
        builder = builder.config("spark.local.dir", shm)
    except OSError:
        pass
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
