"""Loaders for the driver's synthetic parquet tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings, one parquet per table under /root/testdata/sf*/.

The only wrinkle is ``events.ts``'s physical type, which has differed
across driver testdata generations — TIMESTAMP(NANOS) in early rounds,
naive timestamp[us] since round 3 — so ``load_table`` defends both:
``spark.sql.legacy.parquet.nanosAsLong=true`` reads a NANOS column as
LONG and converts it back to a micros TIMESTAMP, and
``spark.sql.parquet.inferTimestampNTZ.enabled=false`` reads a naive
column as an LTZ UTC instant (``unix_millis`` rejects NTZ). Either way
the value matches DuckDB's ``epoch_ms(ts)`` on the same file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


_TABLE_CACHE: dict[tuple[str, str], tuple[SparkSession, DataFrame]] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table, pinning oracle-parity session confs.

    SIDE EFFECT — part of the public contract, not an accident: this
    call sets ``spark.sql.session.timeZone=UTC`` and
    ``spark.sql.parquet.inferTimestampNTZ.enabled=false`` (plus
    ``nanosAsLong`` for events) on the CALLER'S session, and the
    settings persist after the call. They cannot be scoped
    set/restore around the read: DataFrames are lazy, so the confs
    must still hold when the query EXECUTES (timeZone drives calendar
    functions at run time, and a restored conf would silently shift
    day/year boundaries). A session that shares queries with this
    loader therefore runs on UTC calendar semantics throughout —
    callers needing a different session zone should use a separate
    SparkSession (``SparkSession.newSession()`` shares the JVM but
    not session confs)."""
    # Naive (no-tz) parquet timestamps must load as LTZ UTC instants, not
    # TIMESTAMP_NTZ: unix_millis() rejects NTZ, and LTZ matches DuckDB's
    # epoch_ms() interpretation of the same stored int64 regardless of the
    # session time zone. Set at runtime (session-settable SQL conf) because
    # the driver harness calls queries() with its OWN SparkSession.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    # Day/year boundaries of the LTZ timestamps (CAST(ts AS DATE),
    # year(l_shipdate), ...) resolve through the session time zone;
    # the DuckDB oracle's naive casts are UTC-fixed, so a foreign
    # session on a non-UTC JVM would shift them. unix_millis itself is
    # tz-independent, but the calendar functions are not.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # Defensive: the conf is baked into get_spark's sessions, but the
        # driver harness calls queries() with its OWN SparkSession — set
        # it at runtime (it is a session-settable SQL conf) so the nanos
        # column never hard-fails the scan.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Round-12 (guide §7.3 — driver-side work): every call re-ran file
    # listing + parquet schema inference on the driver (~tens of ms),
    # and a bench pass makes ~400 such calls. The analyzed relation is
    # immutable and the testdata directories are static by contract,
    # so cache the DataFrame per (session, dir, table); the conf sets
    # above stay per-call — they are the documented side effect.
    # The static-files assumption is load-bearing: an on-disk change to
    # a testdata parquet is invisible within a process (the analyzed
    # relation pins the old footer). Testdata dirs are immutable by
    # contract; anything mutable (the engine warehouse) never goes
    # through this cache.
    key = (sf_dir, name)
    hit = _TABLE_CACHE.get(key)
    if hit is not None and hit[0] is spark:
        return hit[1]
    if hit is not None:
        # Round-13 (ADVICE r12): a session mismatch on ANY key means a
        # session was replaced — drop every entry of dead sessions
        # instead of pinning their plans for the process lifetime
        # (entries were only evicted on same-key re-request before).
        for k, (s, _) in list(_TABLE_CACHE.items()):
            if s is not spark:
                del _TABLE_CACHE[k]
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # Integer division: `/` would go through double and lose
        # precision at ~1.7e18 ns (53-bit mantissa < epoch-nanos).
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    _TABLE_CACHE[key] = (spark, df)
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    for name in tables or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def events_as_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → canonical Orestes points: time_ms/value plus tags
    {event_type, user_id}. The natural carrier for the reference's
    fixture shapes at scale (FIXTURES.md §4)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.unix_millis(F.col("ts")).alias("time_ms"),
        F.col("value").cast("double").alias("value"),
        F.map_from_arrays(
            F.array(F.lit("event_type"), F.lit("user_id")),
            F.array(F.col("event_type"), F.col("user_id").cast("string")),
        ).alias("tags"),
    )
