"""Temporal / interval join operators Spark's optimizer can't plan well.

Spark has no ASOF JOIN, and a raw inequality join (``l.ts >= r.ts`` or
point-in-interval) falls back to BroadcastNestedLoopJoin — a cartesian
product that dies at scale. These re-express both as shuffle-bounded
plans:

  * :func:`asof_join` — the sort-based union trick (pandas
    ``merge_asof`` / Flink temporal-join semantics): tag both sides,
    union, ONE window pass per key ordered by time carries the latest
    right-hand row forward. Cost = one shuffle of |L|+|R| rows on the
    join key; no pair blow-up, no driver state.
  * :func:`range_join_point` — interval binning: each interval explodes
    to the fixed-width bins it covers, points equi-join their bin, the
    exact predicate refines. Cost = one equi-join of |P| + |I|·span/w
    rows instead of |P|·|I| comparisons.

Both are deterministic and ANSI-mirrorable (DuckDB has native ASOF JOIN
and inequality joins), so the driver contract oracles them directly
(q53/q54). The reference engine has no temporal surface — these belong
to the training-pipeline additions, like `textops`/`similarity`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on,
              left_ts: str = "ts", right_ts: str | None = None,
              direction: str = "backward", tolerance=None,
              right_cols=None, suffix: str = "_r") -> DataFrame:
    """Left as-of join: for every left row, attach the single right row
    with the greatest ``right_ts`` <= ``left_ts`` (``backward``; ties at
    equal ts match) or the least ``right_ts`` >= ``left_ts``
    (``forward``), per ``on`` key. Unmatched left rows keep NULLs
    (left-join semantics). ``tolerance`` (a Column interval or literal,
    e.g. ``F.expr("INTERVAL 1 HOUR")``) voids matches farther than that
    from the left timestamp.

    The right payload travels as ONE struct through
    ``last(..., ignorenulls=True)`` so every output column comes from
    the SAME matched row (per-column last() could mix rows when a
    payload column is legitimately NULL).

    Right rows must be unique per (key, ts) — duplicate timestamps make
    "the" as-of match ambiguous in any engine (DuckDB ASOF picks an
    arbitrary one); pre-dedupe with a deterministic tiebreak.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    on = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    # a NULL right timestamp satisfies no as-of predicate in any engine
    # (ts >= NULL is never true); without this filter the asc NULLS
    # FIRST ordering would carry its payload forward as a phantom match
    right = right.where(F.col(right_ts).isNotNull())
    if right_cols is None:
        right_cols = [c for c in right.columns
                      if c not in on and c != right_ts]

    payload = F.struct(F.col(right_ts).alias("__ts"),
                       *[F.col(c) for c in right_cols])
    l_tag = left.select(
        *on, F.col(left_ts).alias("__ts"), F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        F.lit(None).cast(
            right.select(payload.alias("x")).schema["x"].dataType
        ).alias("__rrow"))
    r_tag = right.select(
        *on, F.col(right_ts).alias("__ts"), F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in left.columns])
                        .alias("x")).schema["x"].dataType).alias("__lrow"),
        payload.alias("__rrow"))

    both = l_tag.unionByName(r_tag)
    # backward: ascending time, right (0) before left (1) at equal ts so
    # an equal-timestamp right row is visible to the left row's frame.
    # forward: descending time, same tag order -> least right ts >= left.
    ts_ord = F.col("__ts").asc() if direction == "backward" \
        else F.col("__ts").desc()
    w = (Window.partitionBy(*on)
         .orderBy(ts_ord, F.col("__is_left").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = (both
               .withColumn("__m", F.last("__rrow", ignorenulls=True).over(w))
               .where(F.col("__is_left") == 1)
               # NULL left ts matches nothing either (desc sorts NULLS
               # LAST, which would otherwise see every right row)
               .withColumn("__m", F.when(F.col("__ts").isNotNull(),
                                         F.col("__m"))))
    if tolerance is not None:
        gap = (F.col("__ts") - F.col("__m.__ts")) if direction == "backward" \
            else (F.col("__m.__ts") - F.col("__ts"))
        matched = matched.withColumn(
            "__m", F.when(F.col("__m").isNotNull()
                          & (gap <= tolerance), F.col("__m")))
    out_left = [F.col(f"__lrow.{c}").alias(c) for c in left.columns]
    out_right = [F.col("__m.__ts").alias(f"{right_ts}{suffix}")] + [
        F.col(f"__m.{c}").alias(
            f"{c}{suffix}" if c in left.columns or c in on else c)
        for c in right_cols]
    return matched.select(*out_left, *out_right)


def range_join_point(points: DataFrame, intervals: DataFrame,
                     point_col: str, lo_col: str, hi_col: str,
                     bin_width: float, extra_on=None,
                     how: str = "inner") -> DataFrame:
    """Point-in-interval join (``lo <= point < hi``, half-open) as a
    bin-bucketed equi-join. Every interval is exploded to the integer
    bins ``floor(lo/w) .. floor(hi/w)`` it can touch (floor is monotone,
    so the bin match is a strict superset of the true match — the exact
    predicate then refines with zero false negatives); every point joins
    its single bin. Overlapping intervals are fine — a point matches
    each one. ``bin_width`` should be on the order of the typical
    interval span: the exploded side carries ~span/w rows per interval.

    ``extra_on``: additional equi-join key columns present on both
    sides. ``how``: ``inner`` or ``left`` (unmatched points with NULL
    interval columns).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left: {how}")
    extra_on = ([extra_on] if isinstance(extra_on, str)
                else list(extra_on or []))
    w = float(bin_width)
    if not w > 0:
        raise ValueError(f"bin_width must be > 0: {bin_width}")

    binned_iv = intervals.withColumn(
        "__bin",
        F.explode(F.sequence(
            F.floor(F.col(lo_col) / F.lit(w)).cast("long"),
            F.floor(F.col(hi_col) / F.lit(w)).cast("long"))))
    binned_pt = points.withColumn(
        "__bin", F.floor(F.col(point_col) / F.lit(w)).cast("long"))
    refine = ((F.col(point_col) >= F.col(lo_col))
              & (F.col(point_col) < F.col(hi_col)))
    joined = (binned_pt.join(binned_iv, ["__bin", *extra_on])
              .where(refine).drop("__bin"))
    if how == "inner":
        return joined
    # left: add back unmatched points (bin miss OR refine fail) with NULL
    # interval columns — one anti-join against the matched point rows.
    # NULL-SAFE equality: name-list anti-joins compare with `=`, whose
    # NULL result would re-add every matched point that has a NULL in
    # any payload column as a spurious unmatched row
    iv_cols = [c for c in intervals.columns if c not in extra_on]
    matched_pts = (joined.select(*points.columns)
                   .dropDuplicates(points.columns).alias("__m"))
    pts = points.alias("__p")
    cond = None
    for c in points.columns:
        eq = F.col(f"__p.{c}").eqNullSafe(F.col(f"__m.{c}"))
        cond = eq if cond is None else cond & eq
    missing = (pts.join(matched_pts, cond, "left_anti")
               .select(*[F.col(f"__p.{c}") for c in points.columns]))
    for c in iv_cols:
        missing = missing.withColumn(
            c, F.lit(None).cast(dict(intervals.dtypes)[c]))
    return joined.unionByName(missing.select(*joined.columns))
