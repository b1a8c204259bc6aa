"""SparkSession bootstrap.

Local-mode testing runs on ``local[N]`` (one JVM); production posture is a
multi-executor cluster reading ~100 TB, so every knob here is chosen to be
correct at both scales:

* AQE on (runtime partition coalescing + skew-join splitting) so plans
  re-shape themselves at real data volumes.
* ``spark.sql.shuffle.partitions`` defaults to ~cores locally; on a real
  cluster AQE's coalescing makes the initial number mostly moot.
* UTC session timezone — the DuckDB oracle compares timestamps as
  UTC-naive values.
* Arrow enabled for every pandas interchange (Pandas UDFs are the only
  sanctioned Python hot path).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "data_ingestion_system_spark",
              cpus: str | int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    Driver-provided sessions (``__spark_entry__.entry``) bypass this; the
    tuning below is also applied lazily per-query where it matters
    (broadcast hints, repartition) so the engine behaves on any session.
    """
    cpus = str(cpus or DEFAULT_CPUS)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # ContextCleaner only reclaims shuffle files / broadcasts after a
        # DRIVER GC; the default periodicGC.interval (30min) never fires
        # within a bench/driver run, so hundreds of query executions
        # accumulate state and inflate later queries ~2x (measured:
        # graph_pagerank 2.5s isolated vs 6.4s late in a 143-query run)
        .config("spark.cleaner.periodicGC.interval", "45s")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


_SHIPPED: set[str] = set()


def ship_package(spark: SparkSession) -> None:
    """Make the engine importable by executor Python workers.

    Closures handed to mapInPandas/pandas_udf reference functions in this
    package by module path; workers unpickle them and must import it.  On
    a real cluster the package ships as a ``--py-files`` zip — this is the
    runtime equivalent (``sc.addPyFile``), and it also covers a local
    driver whose cwd/sys.path doesn't contain the repo (the grading
    driver's session).  Zip name is content-hashed: idempotent re-adds,
    and edits during a long-lived session get a fresh file."""
    import hashlib
    import tempfile
    import zipfile

    sc = spark.sparkContext
    if sc.applicationId in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    sources = []
    for root, _dirs, files in os.walk(pkg_dir):
        for fn in sorted(files):
            if fn.endswith(".py"):
                full = os.path.join(root, fn)
                arc = os.path.join(pkg_name, os.path.relpath(full, pkg_dir))
                sources.append((full, arc))
    digest = hashlib.md5()
    for full, arc in sources:
        digest.update(arc.encode())
        with open(full, "rb") as f:
            digest.update(f.read())
    zip_path = os.path.join(
        tempfile.gettempdir(), f"{pkg_name}-{digest.hexdigest()[:12]}.zip"
    )
    if not os.path.exists(zip_path):
        tmp = zip_path + ".tmp"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
            for full, arc in sources:
                zf.write(full, arc)
        os.replace(tmp, zip_path)
    sc.addPyFile(zip_path)
    _SHIPPED.add(sc.applicationId)


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable subset of our tuning to a session we did
    not create (e.g. the driver's).  Static configs (driver memory) can't
    change post-start and are left alone."""
    for k, v in {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
    }.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf may be static on this session; keep going
    return spark


def ensure_input_parallelism(df, spark: SparkSession):
    """Repartition ``df`` to the session's core count ONLY when its scan
    has fewer splits — the input-parallelism guard for queries whose
    heaviest stage is a per-row projection over a small file (the
    multimodal_image_roundtrip lesson, SCALING.md r7).  A no-op at real
    scale, where the scan itself has thousands of row-group splits.

    One shared helper (VERDICT r8 #7) so the probe idiom lives in one
    place: ``df.rdd.getNumPartitions()`` is plan-time only (it builds
    the RDD handle without running a job), but it is still a JVM
    round-trip + conversion boundary object — callers should hit it
    once per query, through here."""
    cores = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < cores:
        return df.repartition(cores)
    return df
