package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, the LATEST right row of the same key
  * with `right.ts <= left.ts` (inclusive) — an operator Spark lacks as a
  * built-in (DuckDB: `ASOF JOIN`, used verbatim as the q56 oracle).
  *
  * Spark-first shape: NOT a per-left-row subquery and NOT a range cross
  * join — tag the two inputs, union, and carry a per-key running
  * `last(right_payload, ignoreNulls)` over (key ORDER BY ts, tag) with
  * right rows sorted BEFORE left rows at equal timestamps (that one sort
  * bit IS the inclusive bound). One shuffle on the key, per-key windows
  * (bounded, partitioned — never a global window), linear in
  * |left| + |right|.
  *
  * Precondition for deterministic output: the right side must be unique
  * per (key, ts) — pre-aggregate ties (e.g. keep max id) or the carried
  * match among equal-ts right rows is plan-dependent. Left-outer
  * semantics: left rows with no prior right row get a null match struct.
  *
  * At 100 TB: the shuffle is the same hash-on-key exchange a groupBy
  * costs; a hot key concentrates ONE user's history in a task — bound it
  * by windowing time into buckets (join within bucket, fix up boundaries
  * with the previous bucket's final state), the GapAudit two-phase
  * pattern. Not needed at the reference's key cardinalities.
  */
object AsOf {

  /** `left` as-of `right` on key/ts columns; returns every left column
    * plus a nullable `asof` struct holding the matched right row.
    *
    * NULL semantics follow SQL ASOF (the DuckDB oracle): a NULL key or
    * NULL ts never matches — right rows with either are dropped up front
    * (they could otherwise be carried as a bogus "earliest ever" match),
    * left rows with either survive with a null `asof` struct. */
  def asofJoin(left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String): DataFrame = {
    val reserved = Seq("_k", "_t", "_tag", "_r", "_l")
    val clash = (left.columns ++ right.columns).filter(reserved.contains) ++
      left.columns.filter(_ == "asof")
    require(clash.isEmpty,
      s"asofJoin reserves column names ${reserved.mkString(", ")} and the " +
        s"output column 'asof'; input carries ${clash.mkString(", ")}")
    val rPayload = struct(right.columns.map(col).toIndexedSeq: _*)
    val lPayload = struct(left.columns.map(col).toIndexedSeq: _*)
    val r = right
      .filter(col(key).isNotNull && col(rightTs).isNotNull)
      .select(
        col(key).as("_k"), col(rightTs).as("_t"),
        lit(0).as("_tag"), rPayload.as("_r"))
    val rType = r.schema("_r").dataType
    val l = left.select(
      col(key).as("_k"), col(leftTs).as("_t"),
      lit(1).as("_tag"), lit(null).cast(rType).as("_r"), lPayload.as("_l"))
    val all = r.withColumn("_l",
      lit(null).cast(l.schema("_l").dataType)).unionByName(l)
    // right (tag 0) sorts before left (tag 1) at equal ts -> inclusive bound
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    all
      .withColumn("asof", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .select(col("_l.*"), col("asof"))
  }
}
