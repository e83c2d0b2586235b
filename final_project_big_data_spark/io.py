"""Source/sink layer.

The reference reads/writes Parquet on HDFS and CSV via a driver-side pandas
detour (``tasks/scripts/prepare_data.py:16``, ``:39-40``); here every format
goes through ``spark.read``/``df.write`` directly so filters and column
pruning push into the scan and writes stay distributed.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from final_project_big_data_spark.schemas import TABLE_NAMES, TABLE_SCHEMAS

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _pin_session_confs(spark: SparkSession) -> None:
    """Pin runtime-settable confs required for deterministic oracle parity,
    even when the engine runs under a session it did not build (e.g. the
    verification driver's): UTC rendering, and nanos-as-long so Spark 4 can
    scan the ns-precision ``events.ts`` parquet column at all.

    Once per session: each ``conf.set`` is a py4j round trip, and
    ``load_table`` sits on every builder's path (hundreds of calls per
    registry sweep) — re-pinning already-pinned confs is pure overhead.
    """
    if _session_alive(spark) and id(spark) in _CONFS_PINNED:
        return
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # ship the engine package to Python workers (foreign-session safe)
    from final_project_big_data_spark.session import ship_package

    ship_package(spark)
    _CONFS_PINNED.add(id(spark))


_CONFS_PINNED: set[int] = set()


def _session_alive(spark: SparkSession) -> bool:
    """True iff per-session cached state for ``id(spark)`` belongs to THIS
    object. CPython reuses ids after GC, and sibling sessions share an
    applicationId, so (appId, id) alone could hand session B state pinned
    by a dead session A. A weakref to the registrant makes the check
    airtight: id reuse requires the old object to be dead, and then the
    weakref no longer resolves to ``spark``. On mismatch, all state keyed
    to the stale id is purged and the new session registered.
    """
    import weakref

    ref = _SESSION_REFS.get(id(spark))
    if ref is not None and ref() is spark:
        return True
    _CONFS_PINNED.discard(id(spark))
    for k in [k for k in _TABLE_CACHE if k[1] == id(spark)]:
        del _TABLE_CACHE[k]
    try:
        _SESSION_REFS[id(spark)] = weakref.ref(spark)
    except TypeError:  # non-weakref-able session stand-in (mocks)
        _SESSION_REFS.pop(id(spark), None)
    return False


_SESSION_REFS: dict[int, "object"] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan for one fixture table (lazy; pushdown-friendly).

    Schema comes from the Parquet footer; ``TABLE_SCHEMAS[name]`` documents
    the contract and is asserted in tests rather than forced on the reader
    (forcing a schema would disable some Parquet filter pushdown paths).

    ``events.ts`` has shipped in two fixture generations: parquet
    TIMESTAMP(NANOS) (scanned as a raw nanos long under ``nanosAsLong``,
    then truncated to µs with integer division — ``div 1000`` keeps full
    int64 precision, matching DuckDB's ns→µs truncation exactly) and plain
    µs TIMESTAMP (passes through untouched). The branch below keys on the
    *scanned* dtype so either generation loads; any other drift raises via
    ``_check_fixture_schema``.
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    _pin_session_confs(spark)
    # Per-(app, dir, table) DataFrame cache: Spark fires a footer/schema
    # -inference metadata job on EVERY spark.read.parquet call, so without
    # this an engine session re-reads the same footers once per builder
    # (154× per registry sweep). DataFrames are immutable — handing every
    # caller the same logical scan node is safe, and lets Catalyst see
    # identical subplans for reuse. Bounded: |tables| × |sf dirs| × |apps|.
    # keyed on session *object* identity as well as applicationId: sibling
    # sessions from spark.newSession() share one appId, but a DataFrame is
    # bound to the session that created it (temp views, conf lookups), so
    # handing session A's cached scan to sibling B would silently target A
    app_id = spark.sparkContext.applicationId
    key = (app_id, id(spark), os.path.abspath(sf_dir), name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    # single-generation cache: entries keyed to OTHER applicationIds belong
    # to stopped sessions (a restarted session gets a fresh appId) — evict
    # them so a driver that restarts its session per round can't pin dead
    # py4j/JVM objects for the process lifetime
    for k in [k for k in _TABLE_CACHE if k[0] != app_id]:
        del _TABLE_CACHE[k]
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # parquet µs TIMESTAMP without isAdjustedToUTC scans as NTZ in
            # Spark 4; with the session tz pinned UTC this cast is a pure
            # type relabel (same µs value), restoring the TimestampType
            # contract every downstream query was written against.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    _check_fixture_schema(name, df)
    _TABLE_CACHE[key] = df
    return df


_TABLE_CACHE: dict[tuple, DataFrame] = {}


def _check_fixture_schema(name: str, df: DataFrame) -> None:
    """Fixture-drift tripwire: one loud, named error instead of N cryptic
    downstream AnalysisExceptions when the driver regenerates testdata with
    a changed column type (this exact failure cost round 2 its bench run —
    ``events.ts`` moved ns-int64 → µs-timestamp under us).

    Compares the scanned dtypes column-by-column against the documented
    contract in ``TABLE_SCHEMAS``. Cheap (metadata only, no job) and cached
    per (table, schema) so the check runs once per distinct shape.
    """
    expected = {f.name: f.dataType.simpleString() for f in TABLE_SCHEMAS[name].fields}
    actual = dict(df.dtypes)
    key = (name, tuple(sorted(actual.items())))
    if key in _SCHEMA_OK:
        return
    missing = [c for c in expected if c not in actual]
    extra = [c for c in actual if c not in expected]
    drifted = {
        c: (expected[c], actual[c])
        for c in expected
        if c in actual and actual[c] != expected[c]
    }
    if missing or extra or drifted:
        parts = []
        if missing:
            parts.append(f"missing columns {missing}")
        if extra:
            parts.append(f"unexpected columns {extra}")
        for c, (want, got) in drifted.items():
            parts.append(f"column {c!r} drifted: expected {want}, scanned {got}")
        raise RuntimeError(
            f"fixture drift in table {name!r}: " + "; ".join(parts) + ". "
            "The on-disk parquet no longer matches TABLE_SCHEMAS — update "
            "final_project_big_data_spark/schemas.py (and any dtype-dependent "
            "load branch in io.load_table) for the new fixture generation."
        )
    _SCHEMA_OK.add(key)


_SCHEMA_OK: set = set()


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register fixture tables as temp views for the SQL entry point."""
    for name, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(name)


def read_csv(spark: SparkSession, path: str, schema_name: str) -> DataFrame:
    """CSV scan with a declared schema — no inference, no pandas staging.

    Spark-native replacement for the reference's driver-side
    ``pd.read_csv`` (``tasks/scripts/prepare_data.py:16``).
    """
    return spark.read.csv(path, header=True, schema=TABLE_SCHEMAS[schema_name])


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Distributed Parquet sink, overwrite mode (reference O6).

    ``partition_by`` enables partition pruning for downstream scans — the
    100 TB layout knob the reference never used.
    """
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def read_json(spark: SparkSession, path: str, schema_name: str) -> DataFrame:
    """JSON-lines scan with a declared schema (no inference pass over the
    data — at scale, schema inference is a full extra read)."""
    return spark.read.json(path, schema=TABLE_SCHEMAS[schema_name])


def write_json(df: DataFrame, path: str) -> None:
    """JSON-lines sink (row-per-line; the distributed analogue of the
    reference's per-row ``to_json`` Kafka payloads, O15)."""
    df.write.mode("overwrite").json(path)


_CORRUPT = "_corrupt_record"


def read_json_quarantine(
    spark: SparkSession, path: str, schema_name: str
) -> tuple[DataFrame, DataFrame]:
    """JSON-lines scan that splits clean rows from malformed ones instead of
    failing the job: PERMISSIVE parse with ``_corrupt_record`` capture →
    (good, quarantine) pair.

    At 100 TB one bad record must not kill the job (FAILFAST) or silently
    vanish (DROPMALFORMED): the quarantine side keeps the raw line for
    replay/debugging. Spark refuses to filter on the corrupt column straight
    off a raw scan (SPARK-2115x guard), so the parsed frame is cached — both
    outputs then come from one materialized scan; callers ``.unpersist()``
    it via either returned frame when done.
    """
    import pyspark.sql.types as T

    schema = T.StructType(
        TABLE_SCHEMAS[schema_name].fields + [T.StructField(_CORRUPT, T.StringType())]
    )
    parsed = spark.read.json(
        path,
        schema=schema,
        mode="PERMISSIVE",
        columnNameOfCorruptRecord=_CORRUPT,
    ).cache()
    good = parsed.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    bad = parsed.filter(F.col(_CORRUPT).isNotNull()).select(_CORRUPT)
    return good, bad


def write_csv(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("header", "true").csv(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    """Bucketed managed table (warehouse): pre-shuffles once at write time
    so every later equi-join/aggregation on ``bucket_cols`` is co-located —
    zero shuffle at read time. This is the 100 TB answer to repeated joins
    on the same key (e.g. fact tables keyed by orderkey): pay the shuffle
    once, amortize it over every downstream query.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a crashed earlier write can leave an orphan location that blocks
    # re-creating the managed table — clear it (local warehouse only)
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(warehouse.removeprefix("file:"), table.lower())
    if os.path.isdir(loc):
        import shutil

        shutil.rmtree(loc, ignore_errors=True)
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def compact_files(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> int:
    """Small-file compaction: rewrite a parquet dataset into
    ``ceil(bytes / target_file_bytes)`` right-sized files (returned).

    The 100 TB operational reality this answers: streaming sinks and
    per-task writers leave thousands of KB-scale files per partition, and
    scan planning degrades linearly with file count (footer reads, task
    scheduling) long before data volume hurts. Sizing from the SOURCE
    BYTES (driver-side listing — metadata, not data) avoids both failure
    modes of a fixed fan-in: too few files (giant tasks, no parallelism)
    and too many (the problem re-created). With ``sort_cols`` the rewrite
    range-partitions and sorts-within (clustered compaction — footer
    min/max stay useful, the ``write_zordered`` companion for one key);
    without, a round-robin ``repartition`` balances bytes exactly.
    """
    import math

    # mode("overwrite") deletes dst before/while the lazy read of src
    # runs — a dst that IS src (or nests either way) would destroy the
    # input mid-job, so refuse up front
    s, d = os.path.abspath(src), os.path.abspath(dst)
    assert (
        d != s
        and not d.startswith(s + os.sep)
        and not s.startswith(d + os.sep)
    ), f"compact_files: dst must be disjoint from src (src={s}, dst={d})"

    total = 0
    for root, _dirs, files in os.walk(src):
        for f in files:
            if not f.startswith((".", "_")):
                total += os.path.getsize(os.path.join(root, f))
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src)
    if sort_cols:
        out = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(dst)
    return n_files


def write_zordered(
    df: DataFrame, path: str, x_col: str, y_col: str, n_files: int = 8
) -> None:
    """Z-order-clustered parquet rewrite: range-partition on the Morton
    interleave of (x_col, y_col), sort within each file by it, drop the
    key, write. Each output file then covers a contiguous Z-curve
    segment, so its parquet footer min/max stats bound BOTH dimensions
    tightly — a later scan filtering on EITHER column prunes whole
    files/row-groups from stats alone, which a single-column sort only
    gives its leading key. This is the layout q104 reports on;
    ``tests/test_io_engine.py::test_write_zordered_footer_stats_tight``
    proves the claim against the REAL footer stats (pyarrow-read), the
    bytes engines actually prune with. One range shuffle at write time,
    amortized over every downstream multi-dimensional scan — the same
    pay-once posture as ``write_bucketed``.
    """
    from final_project_big_data_spark.operators.zorder import zvalue

    (
        df.withColumn("_zval", zvalue(F.col(x_col), F.col(y_col)))
        .repartitionByRange(n_files, "_zval")
        .sortWithinPartitions("_zval")
        .drop("_zval")
        .write.mode("overwrite")
        .parquet(path)
    )


def register_stats_tables(
    spark: SparkSession,
    sf_dir: str,
    tables: list[str] | tuple[str, ...],
) -> str:
    """Register fixture tables as external catalog tables with CBO
    statistics (round 11, SURVEY §4.2's last unexercised row).

    Path-based ``spark.read.parquet`` plans carry only file-size
    estimates, so the cost-based optimizer (``spark.sql.cbo.enabled``)
    has nothing to reorder joins with — CBO needs CATALOG tables whose
    row counts and column NDV/min/max were collected by ``ANALYZE
    TABLE``. This helper creates an external ``USING parquet`` table per
    fixture (no data copy — the table is a catalog pointer at the same
    files every other builder scans) inside a per-corpus database
    (md5 of ``sf_dir``, so two fixture dirs never share stats), then
    runs ``ANALYZE TABLE ... COMPUTE STATISTICS FOR ALL COLUMNS`` — one
    distributed scan per table collecting rowCount + per-column
    NDV/min/max/null-count (HLL-approximate NDV, never a driver
    materialization).

    Idempotent per session AND cheap on re-entry: an already-registered
    table is not re-analyzed (the driver invokes builders twice).
    Returns the database name; query the tables as ``{db}.{name}``.

    At 100 TB this is the nightly ``ANALYZE`` any warehouse runs: stats
    collection scans once so every subsequent multi-join plan starts
    from measured cardinalities instead of size-ratio guesses. AQE
    complements but cannot replace it — AQE re-plans per-stage at
    runtime yet never changes the join ORDER the optimizer committed to.
    """
    import hashlib

    db = f"sg_stats_{hashlib.md5(sf_dir.encode()).hexdigest()[:12]}"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    for t in tables:
        full = f"{db}.{t}"
        if spark.catalog.tableExists(full):
            continue
        spark.sql(
            f"CREATE TABLE {full} USING parquet "
            f"LOCATION '{table_path(sf_dir, t)}'"
        )
        if not _restore_table_stats(spark, db, t, sf_dir):
            _analyze(spark, full)
            _snapshot_table_stats(spark, db, t, sf_dir)
    return db


def _analyze(spark: SparkSession, full: str) -> None:
    """One distributed stats-collection scan (separable so tests can prove
    the restore path never re-runs it)."""
    spark.sql(f"ANALYZE TABLE {full} COMPUTE STATISTICS FOR ALL COLUMNS")


def _stats_path(sf_dir: str, table: str) -> str:
    """CBO stats snapshots live beside the repo warehouse (round 12,
    VERDICT r11 #3): the in-memory catalog dies with the session, so the
    ANALYZE cost (224 s at the 1000× corpus) must amortize ACROSS
    sessions — the nightly-ANALYZE posture a warehouse metastore gives
    for free. ``SPARK_GRAFT_STATS_DIR`` overrides (e.g. shared storage on
    a real cluster)."""
    import hashlib

    base = os.environ.get("SPARK_GRAFT_STATS_DIR") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "spark-warehouse",
        "stats",
    )
    h = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    return os.path.join(base, f"{h}_{table}.json")


def _snapshot_table_stats(
    spark: SparkSession, db: str, table: str, sf_dir: str
) -> None:
    """Serialize the ANALYZE result so it survives session restarts the
    in-memory catalog cannot: the ``CatalogStatistics`` object itself is
    java-serialized (base64) — py4j cannot round-trip its ``BigInt``
    fields as typed arguments (py4j converts any ``java.lang.Number`` to
    a Python int on return, so a rebuilt object never matches the
    constructor signature); a byte-level round trip keeps the object
    JVM-side end to end. Readable row/size/column fields ride along for
    humans and tests."""
    import base64
    import json

    jvm = spark._jvm
    cat = spark._jsparkSession.sessionState().catalog()
    ti = jvm.org.apache.spark.sql.catalyst.TableIdentifier(
        table, jvm.scala.Option.apply(db)
    )
    stats_opt = cat.getTableMetadata(ti).stats()
    if not stats_opt.isDefined():
        return
    s = stats_opt.get()
    bos = jvm.java.io.ByteArrayOutputStream()
    oos = jvm.java.io.ObjectOutputStream(bos)
    oos.writeObject(s)
    oos.close()
    blob = base64.b64encode(bytes(bos.toByteArray())).decode("ascii")
    cols = []
    it = s.colStats().iterator()
    while it.hasNext():
        cols.append(it.next()._1())
    out = {
        "sizeInBytes": str(s.sizeInBytes()),
        "rowCount": str(s.rowCount().get()) if s.rowCount().isDefined() else None,
        "columns": sorted(cols),
        "catalogStatisticsJavaSer": blob,
    }
    path = _stats_path(sf_dir, table)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)


def _restore_table_stats(
    spark: SparkSession, db: str, table: str, sf_dir: str
) -> bool:
    """Inject a snapshot back into the session catalog WITHOUT a scan
    (``alterTableStats`` — the call ANALYZE itself ends with). Returns
    False when no snapshot exists or it fails to deserialize (e.g. a
    Spark upgrade changed the class shape) — the caller then pays the
    one-time ANALYZE and re-snapshots, so a stale cache degrades to the
    old behavior, never to an error."""
    import base64
    import json

    path = _stats_path(sf_dir, table)
    if not os.path.exists(path):
        return False
    try:
        with open(path) as f:
            snap = json.load(f)
        jvm = spark._jvm
        cat = spark._jsparkSession.sessionState().catalog()
        ti = jvm.org.apache.spark.sql.catalyst.TableIdentifier(
            table, jvm.scala.Option.apply(db)
        )
        raw = base64.b64decode(snap["catalogStatisticsJavaSer"])
        bis = jvm.java.io.ByteArrayInputStream(bytearray(raw))
        ois = jvm.java.io.ObjectInputStream(bis)
        stats = ois.readObject()
        cat.alterTableStats(ti, jvm.scala.Option.apply(stats))
        return True
    except Exception:  # noqa: BLE001 — stale/foreign snapshot → re-ANALYZE
        return False
