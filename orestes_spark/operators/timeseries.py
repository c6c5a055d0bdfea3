"""Time-series analytics operators beyond the reference's surface:
as-of join, resampling (downsampling), and gap-filling — the queries a
time-series store is actually asked for once it has more than `count`.

All are single-shuffle window/groupBy compositions:

  - asof_join: the classic "latest right row at or before each left
    row" — implemented as union + last(ignorenulls) over one
    (key, time)-sorted window, NOT a range join: one shuffle, no
    per-row range probe, skew-safe under AQE. This is the scalable
    formulation for a 100 TB fact stream against a quote/state stream.
  - resample: floor(time / step) bucketing per series with standard
    reducers (avg/min/max/sum/count/first/last) — map-side partial
    aggregation, one shuffle on (series, bucket).
  - gap_fill: dense per-series time grid via sequence+explode, left
    join of the resampled frame, optional forward fill
    (last ignorenulls window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str = "time_ms",
    right_time: str = "time_ms",
    value_cols: list[str] | None = None,
    tolerance_ms: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the nearest right row for the same
    ``on`` key: with ``direction="backward"`` (default) the latest row
    with ``right_time <= left_time``; with ``"forward"`` the earliest
    row with ``right_time >= left_time``. Ties (equal times) take the
    right row in both directions — DuckDB/pandas ASOF semantics.
    ``tolerance_ms`` drops matches farther than the window. Right rows
    must be unique per (key, time); pre-aggregate if not.

    Output: left columns + the right ``value_cols`` (NULL if no match).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof direction must be backward|forward, got {direction!r}")
    value_cols = value_cols or [c for c in right.columns if c not in (on, right_time)]
    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*left.columns).alias("_lrow"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_v_{c}") for c in value_cols],
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_tagged.schema["_lrow"].dataType).alias("_lrow"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    unioned = l_tagged.unionByName(r_tagged)
    # Backward: right rows (side 0) sort before left rows at equal
    # time and the preceding-frame last() carries them → inclusive <=.
    # Forward: order flips the side (left first at equal time) and the
    # following-frame first() picks the next right row → inclusive >=.
    # Carried values (and the matched right timestamp, for tolerance)
    # MUST be computed over the union — filtering to left rows first
    # would remove the very rows the window carries values from.
    if direction == "backward":
        w = Window.partitionBy("_k").orderBy("_t", "_side").rowsBetween(Window.unboundedPreceding, 0)
        carry = lambda c: F.last(c, ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy("_k")
            .orderBy(F.col("_t").asc(), F.col("_side").desc())
            .rowsBetween(0, Window.unboundedFollowing)
        )
        carry = lambda c: F.first(c, ignorenulls=True).over(w)
    # The matched right row is carried as ONE struct (time + all value
    # columns), never as independently-carried columns: per-column
    # last/first(ignorenulls) would skip a NULL field back to an OLDER
    # right row, splicing values from different rows together and
    # desynchronizing the tolerance timestamp from the values.
    rrow = F.when(
        F.col("_side") == 0,
        F.struct(F.col("_t").alias("_rt"), *[F.col(f"_v_{c}").alias(c) for c in value_cols]),
    )
    carried = unioned.select("_side", "_t", "_lrow", carry(rrow).alias("_r")).where(
        F.col("_side") == 1
    )
    cols = [F.col(f"_lrow.{c}").alias(c) for c in left.columns]
    if tolerance_ms is not None:
        gap = (
            F.col("_t") - F.col("_r._rt")
            if direction == "backward"
            else F.col("_r._rt") - F.col("_t")
        )
        return carried.select(
            *cols, *[F.when(gap <= tolerance_ms, F.col(f"_r.{c}")).alias(c) for c in value_cols]
        )
    return carried.select(*cols, *[F.col(f"_r.{c}").alias(c) for c in value_cols])


def resample(
    points: DataFrame,
    step_ms: int,
    key_cols: list[str],
    time_col: str = "time_ms",
    value_col: str = "value",
    aggs: list[str] = ("avg", "min", "max", "count"),
) -> DataFrame:
    """Downsample to fixed ``step_ms`` buckets per key:
    (key_cols..., bucket_ms, <aggs>). ``first``/``last`` are
    time-ordered (min_by/max_by on the timestamp)."""
    fns = {
        "avg": F.avg(value_col).alias("avg_value"),
        "min": F.min(value_col).alias("min_value"),
        "max": F.max(value_col).alias("max_value"),
        "sum": F.sum(value_col).alias("sum_value"),
        "count": F.count(F.lit(1)).alias("n"),
        # first/last via struct-min/max rather than min_by/max_by: the
        # struct comparison breaks (time, value) ties on the value, so
        # duplicate timestamps can't make the result engine-arbitrary.
        "first": F.min(F.struct(F.col(time_col), F.col(value_col)))[value_col].alias("first_value"),
        "last": F.max(F.struct(F.col(time_col), F.col(value_col)))[value_col].alias("last_value"),
        # decimal-exact average: engine-order-independent (see queries.py
        # float discipline note)
        "dec_avg": F.round(
            F.sum(F.col(value_col).cast("decimal(28,10)")).cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_value"),
    }
    unknown = [a for a in aggs if a not in fns]
    if unknown:
        raise ValueError(f"unsupported resample aggs: {unknown}")
    bucket = (F.floor(F.col(time_col) / step_ms) * step_ms).cast("long").alias("bucket_ms")
    return points.groupBy(*key_cols, bucket).agg(*[fns[a] for a in aggs])


def gap_fill(
    resampled: DataFrame,
    step_ms: int,
    key_cols: list[str],
    bucket_col: str = "bucket_ms",
    fill_cols: list[str] | None = None,
    forward_fill: bool = False,
) -> DataFrame:
    """Densify the per-key bucket grid from each key's min to max
    bucket; missing buckets appear with NULLs (or the previous value
    when ``forward_fill``). Grid generation is per-key sequence+explode
    — no driver-side loop, no cross join."""
    fill_cols = fill_cols or [c for c in resampled.columns if c not in (*key_cols, bucket_col)]
    grid = (
        resampled.groupBy(*key_cols)
        .agg(F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi"))
        .select(
            *key_cols,
            F.explode(F.sequence(F.col("_lo"), F.col("_hi"), F.lit(step_ms))).alias(bucket_col),
        )
    )
    out = grid.join(resampled, [*key_cols, bucket_col], "left")
    if forward_fill:
        w = Window.partitionBy(*key_cols).orderBy(bucket_col).rowsBetween(Window.unboundedPreceding, 0)
        out = out.select(
            *key_cols,
            bucket_col,
            *[F.last(c, ignorenulls=True).over(w).alias(c) for c in fill_cols],
        )
    return out


def ohlc(
    points: DataFrame,
    step_ms: int,
    key_cols: list[str],
    time_col: str = "time_ms",
    value_col: str = "value",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Candlestick downsample: per (key, bucket) the open (value at the
    earliest point), high, low, and close (value at the latest point).
    ``tiebreak_col`` disambiguates duplicate timestamps — open/close
    take the value at the smallest/largest (time, tiebreak) pair, so
    the result is engine-deterministic even with equal-time points.

    Single groupBy — map-side partial min_by/max_by, one shuffle on
    (key, bucket), no window. The standard TSDB rollup for financial /
    metric data; the reference's only reducer is count
    (/root/reference/lib/orestes.js:143-150) — this is the natural
    generalization alongside engine.aggregate_points."""
    order = F.col(time_col).cast("long")
    if tiebreak_col is not None:
        # composite BIGINT order key: ms * 2^20 + tiebreak (fits while
        # ms < 2^43 ≈ year 2248 and tiebreak < 2^20; callers with
        # larger ids pass a pre-built key column instead)
        order = F.shiftleft(order, 20) + F.col(tiebreak_col).cast("long")
    bucket = (F.floor(F.col(time_col) / step_ms) * step_ms).cast("long").alias("bucket_ms")
    return points.groupBy(*key_cols, bucket).agg(
        F.min_by(F.col(value_col), order).alias("open"),
        F.max(value_col).alias("high"),
        F.min(value_col).alias("low"),
        F.max_by(F.col(value_col), order).alias("close"),
        F.count(F.lit(1)).alias("n"),
    )


def interpolate_linear(
    dense: DataFrame,
    key_cols: list[str],
    bucket_col: str = "bucket_ms",
    value_col: str = "avg_value",
) -> DataFrame:
    """Linear interpolation over a dense per-key grid (the output of
    ``gap_fill`` without forward_fill): every NULL value between two
    non-NULL anchors becomes the straight-line interpolation
    v_prev + (v_next − v_prev) · (t − t_prev)/(t_next − t_prev);
    rows before the first or after the last anchor stay NULL.

    Two windows over the same (key, bucket) sort — Spark executes both
    in one shuffle (same partitioning/ordering), forward pass for the
    previous anchor, backward pass for the next. No self-join, no
    range probe: the scalable formulation for sensor-grade gap repair
    on billions of rows."""
    wf = Window.partitionBy(*key_cols).orderBy(bucket_col).rowsBetween(Window.unboundedPreceding, 0)
    wb = Window.partitionBy(*key_cols).orderBy(bucket_col).rowsBetween(0, Window.unboundedFollowing)
    t = F.col(bucket_col).cast("double")
    prev_v = F.last(value_col, ignorenulls=True).over(wf)
    prev_t = F.last(F.when(F.col(value_col).isNotNull(), t), ignorenulls=True).over(wf)
    next_v = F.first(value_col, ignorenulls=True).over(wb)
    next_t = F.first(F.when(F.col(value_col).isNotNull(), t), ignorenulls=True).over(wb)
    interp = prev_v + (next_v - prev_v) * (t - prev_t) / (next_t - prev_t)
    filled = (
        F.when(F.col(value_col).isNotNull(), F.col(value_col).cast("double"))
        .when(prev_v.isNotNull() & next_v.isNotNull(), interp)
        .otherwise(F.lit(None).cast("double"))
    )
    return dense.select(
        *key_cols,
        bucket_col,
        F.round(filled, 6).alias("value"),
        F.col(value_col).isNotNull().alias("observed"),
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str | None = None,
    point_time: str = "time_ms",
    start_col: str = "start_ms",
    end_col: str = "end_ms",
    bucket_ms: int = 3_600_000,
) -> DataFrame:
    """Interval (range) join: each point row joins every interval row
    with ``start <= t < end`` (and equal ``on`` key, if given) —
    WITHOUT the cross-product a naive theta-join plans.

    Both sides are bucketized to ``bucket_ms``: a point belongs to one
    bucket; an interval explodes to every bucket it overlaps. The join
    is then a plain equi-join on (key, bucket) + the exact range
    filter. Each qualifying (point, interval) pair meets in exactly
    one bucket — the point's — so no dedup is needed.

    Scale shape: one hash shuffle per side on (key, bucket); interval
    fan-out is ceil(length/bucket_ms)+1 rows, so pick bucket_ms near
    the typical interval length (fan-out ~2). Skewed buckets (hot
    hours) are ordinary AQE skew-join territory, not a cross join.
    """
    pb = points.withColumn("_b", (F.col(point_time) / bucket_ms).cast("long"))
    ib = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                (F.col(start_col) / bucket_ms).cast("long"),
                # end is exclusive: a zero-length or bucket-aligned end
                # must not spill into the next bucket.
                (
                    F.greatest(F.col(end_col) - 1, F.col(start_col)) / bucket_ms
                ).cast("long"),
            )
        ),
    )
    keys = ["_b"] + ([on] if on else [])
    return (
        pb.join(ib, keys)
        .where((F.col(point_time) >= F.col(start_col)) & (F.col(point_time) < F.col(end_col)))
        .drop("_b")
    )


def m4(
    points: DataFrame,
    step_ms: int,
    key_cols: list[str],
    time_col: str = "time_ms",
    value_col: str = "value",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """M4 downsampling (Jugel et al., PVLDB 7(10), 2014): per (key,
    bucket) the COORDINATES of the first, last, min and max points —
    the four rows per pixel column that make a line-chart rendering of
    the downsample pixel-perfect. `ohlc` keeps only the values; M4
    keeps (t, v) pairs, which is what a visualization tier needs.

    Determinism under duplicate timestamps/values: first/last take the
    point at the smallest/largest composite (time, tiebreak) key;
    t_min/t_max take the SMALLEST composite key among the rows that
    attain the bucket's min/max value (ties on the extreme value break
    toward the earliest point). Values pass through untouched — no
    float arithmetic, so no cross-engine divergence.

    Scale shape: one exchange on (key, bucket) reused by the
    min/max-resolving window and the final aggregation; partial
    min/max/count still combine map-side. No window over a global or
    per-key-only partition — parallelism is (keys x buckets).
    """
    order = F.col(time_col).cast("long")
    if tiebreak_col is not None:
        # composite BIGINT order key — same envelope as ohlc: valid
        # while ms < 2^43 and tiebreak < 2^20.
        order = F.shiftleft(order, 20) + F.col(tiebreak_col).cast("long")
        decode = lambda c: F.shiftright(c, 20)  # noqa: E731
    else:
        decode = lambda c: c  # noqa: E731
    bucketed = points.withColumn(
        "bucket_ms", (F.floor(F.col(time_col) / step_ms) * step_ms).cast("long")
    ).withColumn("_ord", order)
    w = Window.partitionBy(*key_cols, "bucket_ms")
    v = F.col(value_col)
    resolved = bucketed.withColumn("_vmin", F.min(v).over(w)).withColumn(
        "_vmax", F.max(v).over(w)
    )
    return (
        resolved.groupBy(*key_cols, "bucket_ms")
        .agg(
            decode(F.min("_ord")).alias("t_first"),
            F.min_by(v, F.col("_ord")).alias("v_first"),
            decode(F.min(F.when(v == F.col("_vmin"), F.col("_ord")))).alias("t_min"),
            F.min(v).alias("v_min"),
            decode(F.min(F.when(v == F.col("_vmax"), F.col("_ord")))).alias("t_max"),
            F.max(v).alias("v_max"),
            decode(F.max("_ord")).alias("t_last"),
            F.max_by(v, F.col("_ord")).alias("v_last"),
            F.count(F.lit(1)).alias("n"),
        )
    )
