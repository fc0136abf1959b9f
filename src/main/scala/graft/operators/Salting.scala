package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit key-salting for skewed aggregations and joins — the north-rule
  * mega-conversation treatment, as a named, reusable primitive.
  *
  * Context: AQE's skew handling splits oversized SHUFFLE JOIN partitions but
  * does not split a skewed AGGREGATION or WINDOW key (SURVEY §4.3). The
  * engine's primary defenses are structural — extraction never groups by
  * conv_id at all; dedup uses partial-aggregating min_by so a hot key
  * collapses map-side; ordered output range-partitions so one conversation
  * spans many tasks — but when a per-key aggregate over a skewed key IS
  * required, this two-stage salted form bounds any single task to
  * |key| / saltBuckets rows:
  *
  *   stage 1: groupBy(key, salt = hash(fine-grain col) % buckets)  — partial
  *   stage 2: groupBy(key)                                          — final
  *
  * Works for any algebraic aggregate (count/sum/min/max and their
  * compositions like avg = sum/count).
  */
object Salting {

  def saltCol(fineGrain: Column, buckets: Int): Column =
    pmod(hash(fineGrain), lit(buckets))

  /** Salted count of rows per key. */
  def saltedCount(df: DataFrame, key: Column, fineGrain: Column, buckets: Int = 32): DataFrame =
    df.groupBy(key.as("key"), saltCol(fineGrain, buckets).as("_salt"))
      .agg(count(lit(1)).as("_c"))
      .groupBy(col("key"))
      .agg(sum(col("_c")).as("count"))

  /** Salted sum of `value` per key. */
  def saltedSum(df: DataFrame, key: Column, value: Column, fineGrain: Column,
      buckets: Int = 32): DataFrame =
    df.groupBy(key.as("key"), saltCol(fineGrain, buckets).as("_salt"))
      .agg(sum(value).as("_s"), count(lit(1)).as("_c"))
      .groupBy(col("key"))
      .agg(sum(col("_s")).as("sum"), sum(col("_c")).as("count"))

  /** Broadcast-replicated salted join for a skewed LEFT key joining a small
    * dimension: the dimension is exploded `buckets`-ways so every salted
    * left partition finds its match — the classic skew-join salt when the
    * dimension is too large for a plain broadcast but the key histogram is
    * brutal. (With truly small dims, prefer broadcast(); this is the
    * pattern for the middle regime.) */
  def saltedJoin(
      bigSkewed: DataFrame, key: String, fineGrain: Column,
      dim: DataFrame, dimKey: String, buckets: Int = 32): DataFrame = {
    val salted = bigSkewed.withColumn("_salt", saltCol(fineGrain, buckets))
    val replicated = dim
      .withColumn("_salt", explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated,
      salted(key) === replicated(dimKey) && salted("_salt") === replicated("_salt"))
      .drop("_salt")
  }
}
