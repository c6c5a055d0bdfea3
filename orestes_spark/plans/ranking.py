"""Distributed exact global ranking — row_number/ntile over a total
order WITHOUT the single-partition window sort (`Exchange
SinglePartition`) that a bare ``Window.orderBy`` plans, which at scale
is one straggler task sorting the world.

The classic two-phase shape:

  1. range-partition by the order (parallel range sort — the same
     machinery as ``df.orderBy``),
  2. rank locally per partition (a PARTITIONED window → parallel),
  3. add per-partition row-count offsets.

The only driver-side data is one row count per partition — bounded by
the partition count, never by the data — which is also what makes the
result exact rather than sampled.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_global_rank(
    df: DataFrame,
    order_cols: list[Column],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """(df + rank_col, total_rows): exact 1-based global row_number in
    the ``order_cols`` total order. The order must be total (add a
    unique tiebreak) for the rank to be deterministic.

    Range-partition boundaries come from Spark's reservoir sampling —
    WHERE the partition cuts land varies run to run, but local-rank +
    exact offsets make the global rank identical regardless."""
    p = num_partitions or int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    # Round-12 opt (guide §2.4 — remove shuffles outright): the local
    # rank used to be row_number() OVER (PARTITION BY _pid ORDER BY
    # order) — but range partitioning does not satisfy that window's
    # hashpartitioning(_pid) requirement, so the plan re-shuffled the
    # ENTIRE frame a second time just to re-group rows that were
    # already grouped. sortWithinPartitions establishes the local
    # order on the range exchange itself, and
    # monotonically_increasing_id() — whose documented layout is
    # (partitionId << 33) + rowIndexInPartition — yields the same
    # local row number masked to the low 33 bits, with zero
    # additional exchanges. Valid for < 2^33 rows per partition
    # (~8.5e9 — far above any sane partition).
    tagged = df.repartitionByRange(p, *order_cols).sortWithinPartitions(*order_cols)
    local = tagged.select(
        "*",
        F.spark_partition_id().alias("_pid"),
        (
            F.monotonically_increasing_id().bitwiseAND(F.lit((1 << 33) - 1)) + 1
        ).alias("_lrn"),
    ).localCheckpoint()
    counts = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n")).collect()
    offsets, acc = [], 0
    for r in sorted(counts, key=lambda r: r["_pid"]):
        offsets.append((r["_pid"], acc))
        acc += r["_n"]
    if not offsets:
        return df.withColumn(rank_col, F.lit(None).cast("long")), 0
    off_df = df.sparkSession.createDataFrame(offsets, "_pid INT, _off LONG")
    out = (
        local.join(F.broadcast(off_df), "_pid")
        .withColumn(rank_col, (F.col("_off") + F.col("_lrn")).cast("long"))
        .drop("_pid", "_lrn", "_off")
    )
    return out, acc


def with_global_ntile(
    df: DataFrame,
    k: int,
    order_cols: list[Column],
    tile_col: str = "tile",
    num_partitions: int | None = None,
) -> DataFrame:
    """SQL-ntile(k) semantics over the distributed rank: the first
    (n mod k) tiles get ceil(n/k) rows, the rest floor(n/k) — exactly
    what ``ntile(k) OVER (ORDER BY ...)`` returns, minus the
    single-partition sort."""
    ranked, n = with_global_rank(df, order_cols, rank_col="_grank", num_partitions=num_partitions)
    if n == 0:
        return ranked.withColumnRenamed("_grank", tile_col)
    q, r = divmod(n, k)
    boundary = r * (q + 1)
    rank0 = F.col("_grank") - 1
    if q == 0:  # fewer rows than tiles: each row is its own tile
        tile = F.col("_grank")
    else:
        tile = (
            F.when(F.col("_grank") <= boundary, F.floor(rank0 / (q + 1)) + 1)
            .otherwise(r + F.floor((rank0 - boundary) / q) + 1)
        )
    return ranked.withColumn(tile_col, tile.cast("int")).drop("_grank")


def with_global_cumsum(
    df: DataFrame,
    order_cols: list[Column],
    value_col: str,
    cumsum_col: str = "cumsum",
    num_partitions: int | None = None,
) -> DataFrame:
    """(df + cumsum_col): exact INCLUSIVE running sum of ``value_col``
    in the ``order_cols`` total order — the budget-selection primitive
    ("take documents in quality order until the token budget is
    full"). Same two-phase shape as with_global_rank: range-partition
    by the order, window-cumsum locally (partitioned → parallel), add
    per-partition sum offsets; the only driver-side data is one sum
    per partition. A bare ``Window.orderBy`` cumsum would plan the
    single-partition exchange this module exists to avoid."""
    p = num_partitions or int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    tagged = df.repartitionByRange(p, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = tagged.withColumn("_lcs", F.sum(value_col).over(w)).localCheckpoint()
    sums = local.groupBy("_pid").agg(F.sum(value_col).alias("_s")).collect()
    offsets, acc = [], 0
    for r in sorted(sums, key=lambda r: r["_pid"]):
        offsets.append((r["_pid"], acc))
        acc += r["_s"] or 0
    if not offsets:
        return df.withColumn(cumsum_col, F.lit(None).cast("long"))
    off_df = df.sparkSession.createDataFrame(offsets, "_pid INT, _off LONG")
    return (
        local.join(F.broadcast(off_df), "_pid")
        .withColumn(cumsum_col, (F.col("_off") + F.col("_lcs")).cast("long"))
        .drop("_pid", "_lcs", "_off")
    )


def with_grouped_ntile(
    df: DataFrame,
    k: int,
    group_cols: list[str],
    order_cols: list[Column],
    tile_col: str = "tile",
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-group ntile(k) — `ntile(k) OVER (PARTITION BY group ORDER
    BY ...)` semantics when the GROUPS are few but each group is
    corpus-sized (per-metric quartiles, per-stratum tertiles): one
    range partition over (group, order) ranks every group in a single
    pass, instead of one single-partition window — or one
    with_global_ntile round trip — per group.

    Same exact-offset construction as with_global_rank, with offsets
    and totals computed per (partition, group): the driver collect is
    |partitions| x |groups| rows, so the contract is a BOUNDED group
    count (metrics, strata — not user ids); order_cols + group must be
    a total order for determinism, and group values must be non-NULL
    (a NULL group raises — see the in-body note). The ntile arithmetic is columnar
    (each group has its own n): first n%k tiles get ceil(n/k) rows —
    identical to the SQL function, per group."""
    p = num_partitions or int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    gcols = [F.col(g) for g in group_cols]
    tagged = df.repartitionByRange(p, *gcols, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = Window.partitionBy("_pid", *group_cols).orderBy(*order_cols)
    local = tagged.withColumn("_lrn", F.row_number().over(w)).localCheckpoint()
    counts = local.groupBy("_pid", *group_cols).agg(F.count(F.lit(1)).alias("_n")).collect()
    by_group: dict[tuple, list[tuple[int, int]]] = {}
    for r in counts:
        g = tuple(r[c] for c in group_cols)
        if any(v is None for v in g):
            # The offset/total equi-joins are null-unsafe, so a NULL
            # group would silently VANISH from the output where SQL
            # ntile would tile it as its own partition. The check is
            # free — counts are already on the driver.
            raise ValueError(
                f"with_grouped_ntile: NULL in group columns {group_cols}"
                f" (group {g}): null groups would be dropped by the"
                " offset joins, diverging from PARTITION BY semantics."
                " Filter or fill the group column first."
            )
        by_group.setdefault(g, []).append((r["_pid"], r["_n"]))
    off_rows, tot_rows = [], []
    for g, lst in by_group.items():
        acc = 0
        for pid, n in sorted(lst):
            off_rows.append((*g, pid, acc))
            acc += n
        tot_rows.append((*g, acc))
    if not off_rows:
        return df.withColumn(tile_col, F.lit(None).cast("int"))
    spark = df.sparkSession
    off_df = spark.createDataFrame(off_rows, group_cols + ["_pid", "_off"])
    tot_df = spark.createDataFrame(tot_rows, group_cols + ["_gn"])
    ranked = (
        local.join(F.broadcast(off_df), group_cols + ["_pid"])
        .join(F.broadcast(tot_df), group_cols)
        .withColumn("_grank", (F.col("_off") + F.col("_lrn")).cast("long"))
    )
    ranked = ranked.withColumn("_q", F.expr(f"_gn div {int(k)}")).withColumn(
        "_r", F.col("_gn") - F.col("_q") * k
    )
    # Integer div keeps ranks exact past 2^53; q == 0 never reaches
    # the ELSE branch (boundary == n there), so its div-by-zero is
    # never evaluated for such groups.
    tile = F.expr(
        "CASE WHEN _grank <= _r * (_q + 1)"
        " THEN (_grank - 1) div (_q + 1) + 1"
        " ELSE _r + ((_grank - 1) - _r * (_q + 1)) div _q + 1 END"
    )
    return ranked.withColumn(tile_col, tile.cast("int")).drop(
        "_pid", "_lrn", "_off", "_gn", "_grank", "_q", "_r"
    )
