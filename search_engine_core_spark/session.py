"""SparkSession factory tuned for this engine.

Local-mode settings mirror what a 1000-executor cluster deployment would
set per-executor; the only local-specific knobs are master and driver
memory. AQE is on so skewed shuffle partitions get split at runtime.
"""

from __future__ import annotations

import os
import pathlib
import zipfile

from pyspark.sql import SparkSession


def _package_zip() -> str:
    """Zip this package for distribution to executors (the local-mode
    equivalent of ``spark-submit --py-files``). Idempotent per process."""
    pkg_dir = pathlib.Path(__file__).resolve().parent
    out = pathlib.Path(f"/tmp/search_engine_core_spark-{os.getpid()}.zip")
    if not out.exists():
        with zipfile.ZipFile(out, "w") as zf:
            for py in sorted(pkg_dir.rglob("*.py")):
                zf.write(py, f"{pkg_dir.name}/{py.relative_to(pkg_dir)}")
    return str(out)


def _local_dir() -> str:
    base = os.environ.get("SPARK_LOCAL_DIRS")
    if base:
        return base
    shm = pathlib.Path("/dev/shm")
    root = (shm if shm.is_dir() else pathlib.Path("/tmp")) / "spark_local"
    root.mkdir(exist_ok=True)
    return str(root)


def get_spark(
    app_name: str = "search_engine_core_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    master: str | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` defaults to $SPARK_GRAFT_CPUS or all local cores. Shuffle
    partitions default to the core count: on a real cluster this would be
    2-3x total executor cores; AQE coalesces the excess either way.
    ``master`` overrides the default ``local[cores]`` — e.g.
    ``local-cluster[4,4,8192]`` runs 4 real executor JVMs (the honest
    multi-executor proxy for scaling measurements).
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 8
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)

    builder = (
        SparkSession.builder.master(master or f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        # Input splits sized for CPU-bound scans, not IO-bound ones: this
        # engine's big scans feed the Arrow tokenize stage, where a byte of
        # input costs ~25x its read time in regex work. The stock 128 MB
        # splits leave fewer tasks than cores on mid-size inputs (measured:
        # the 2M-doc tokenize stage got 14 splits for 16 cores -> 0.47
        # scaling efficiency; 32 MB splits give >=4 tasks/core and the
        # stragglers amortize). openCost 1 MB keeps many-small-file layouts
        # from being re-packed into the same too-coarse splits.
        .config("spark.sql.files.maxPartitionBytes", "33554432")
        .config("spark.sql.files.openCostInBytes", "1048576")
        # Shuffle/spill to tmpfs: the sandbox has ONE shared spinning-ish
        # disk, so concurrent shuffle writers serialize on iowait there; a
        # real cluster gives each executor local NVMe. tmpfs is the honest
        # local proxy (and RAM is plentiful: 128 GiB).
        .config("spark.local.dir", _local_dir())
    )
    if master and master.startswith("local-cluster"):
        # executor memory must equal the per-worker MiB in the master
        # string local-cluster[n,cores,mem_mib]
        mem_mib = master.rstrip("]").split(",")[-1].strip()
        builder = builder.config("spark.executor.memory", f"{mem_mib}m").config(
            "spark.driver.memory", "8g"
        )
        # Standalone workers IGNORE spark.local.dir — each executor's
        # shuffle files go to the worker's SPARK_LOCAL_DIRS (or its work
        # dir on the one shared sandbox disk, where 4 concurrent shuffle
        # writers serialize on iowait: measured 17 s shuffle-write per
        # task vs 0.2 s single-JVM on the same data). local-cluster forks
        # the workers from THIS process, so exporting the env var before
        # session start routes them to the same tmpfs the local[*] path
        # already uses — the honest proxy for per-executor NVMe.
        os.environ.setdefault("SPARK_LOCAL_DIRS", _local_dir())
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    # Ship the package to executor Python workers so closures that
    # reference this module resolve regardless of the driver's cwd —
    # same mechanism as spark-submit --py-files on a real cluster.
    sc = spark.sparkContext
    if not getattr(sc, "_secs_pkg_shipped", False):
        sc.addPyFile(_package_zip())
        sc._secs_pkg_shipped = True
    return spark
