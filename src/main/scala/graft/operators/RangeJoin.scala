package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join — points matched into half-open intervals
  * `[start, end)` of the same key — an operator Spark has no built-in for
  * (the naive form degenerates to a broadcast-nested-loop / cross join with
  * a range predicate; DuckDB plans a specialized IEJoin, used as the q58
  * oracle).
  *
  * Spark-first shape: BUCKETIZE time. Each point lands in exactly ONE
  * fixed-width bucket; each interval EXPLODES into every bucket it
  * overlaps; the join is then a plain equi-join on (key, bucket) followed
  * by the exact containment filter. Because a point has exactly one
  * bucket, a qualifying (point, interval) pair meets in exactly one
  * joined row — no post-join dedup. No cross join, no window, no skewed
  * funnel: just one hash shuffle on a short (key, bucket) pair per side.
  *
  * At 100 TB: pick `bucketWidth` near the TYPICAL interval length — the
  * interval side's replication factor is len/width + 1 (×2 at the default),
  * and bucket keys subdivide hot keys by time, so a hot user's history
  * spreads over many tasks instead of one (the skew story is BETTER than a
  * per-key window). Degenerate widths are the only trap: width ≫ interval
  * lengths re-concentrates a key into one bucket; width ≪ lengths blows up
  * the explode. Both are visible as the replication factor in the plan's
  * generate-side row count.
  */
object RangeJoin {

  /** Floor-division of a (possibly negative) integral column by w — exact
    * 64-bit integer arithmetic: subtracting the (always non-negative) pmod
    * first makes the integral divide's truncation equal floor, and no
    * double ever enters, so timestamps beyond 2^53 (e.g. epoch NANOS at
    * ~1.7e18) still bucket exactly. The `/` operator on long columns is
    * DOUBLE division and silently collapses adjacent buckets out there. */
  private[operators] def idiv(c: Column, w: Long): Column = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    GraftBridge.column(IntegralDivide(
      GraftBridge.expression(c - pmod(c, lit(w))),
      GraftBridge.expression(lit(w))))
  }

  /** Inner point-in-interval join: rows = every (point, interval) pair of
    * equal `key` with `start <= pointTs < end` (half-open). Output carries
    * all columns of both inputs (key once); empty or inverted intervals
    * (`end <= start`) match nothing. Column names across the two inputs
    * must be disjoint apart from `key`. Timestamps are integral (caller
    * converts, e.g. `unix_micros`); `bucketWidth` in the same unit. */
  def pointInInterval(
      points: DataFrame, pointTs: String,
      intervals: DataFrame, startCol: String, endCol: String,
      key: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val p = points.withColumn("_bkt", idiv(col(pointTs), bucketWidth))
    // end is exclusive: the last bucket an interval can reach is the one
    // holding end-1. The end>start guard also keeps the sequence ascending
    // (Spark's sequence() would otherwise happily step BACKWARD and
    // fabricate buckets for inverted intervals).
    val i = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("_bkt", explode(sequence(
        idiv(col(startCol), bucketWidth), idiv(col(endCol) - 1, bucketWidth))))
    p.join(i, Seq(key, "_bkt"))
      .filter(col(pointTs) >= col(startCol) && col(pointTs) < col(endCol))
      .drop("_bkt")
  }
}
