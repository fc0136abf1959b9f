package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core._
import graft.fixtures.TranscriptGen
import graft.pipeline.ExtractPipeline

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Deterministic corpus size per scale-factor directory (extraction queries
    * synthesize their own transcript input — no external data). */
  def nConvsFor(sfDir: String): Long =
    if (sfDir.contains("sf0.1")) 2500L
    else if (sfDir.contains("sf0.01")) 400L
    else 60L

  private def load(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(s"$sfDir/$table.parquet")

  /** Full extraction run (shared by the extraction queries). */
  def runExtraction(spark: SparkSession, sfDir: String) = {
    val turns = ExtractPipeline.transcripts(spark, nConvsFor(sfDir),
      spark.sparkContext.defaultParallelism)
    val ctx = ExtractPipeline.makeContext(TranscriptGen.allEntityIds)
    ExtractPipeline.extract(turns, ctx)
  }

  /** Flagship query on sf=0.001-equivalent synthetic transcripts; driver
    * smoke-checks rows>0: the deduped, ordered extracted-module table. */
  def entry(spark: SparkSession): DataFrame = {
    val ex = runExtraction(spark, "sf0.001")
    ExtractPipeline.ordered(
      ExtractPipeline.dedupModules(ExtractPipeline.modules(ex)))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- relational spine over the driver tables (oracle-checked) ----------
    "q01_agg" -> ((s, dir) => {
      load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice")).as("sum_price"),
          avg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("cnt"))
    }),
    "q02_filter_pushdown" -> ((s, dir) => {
      load(s, dir, "lineitem")
        .filter(col("l_quantity") > 45 && col("l_discount") <= 0.02)
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    }),
    "q03_broadcast_join" -> ((s, dir) => {
      val o = load(s, dir, "orders")
      val c = load(s, dir, "customer")
      val n = load(s, dir, "nation")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("o_totalprice")).as("revenue"),
          count(lit(1)).as("n_orders"))
    }),
    "q04_anti_join" -> ((s, dir) => {
      // J4 resume analog: customers with no urgent order yet.
      val c = load(s, dir, "customer")
      val o = load(s, dir, "orders").filter(col("o_orderpriority").startsWith("1"))
      c.join(o.select(col("o_custkey")), c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),
    "q05_semi_join" -> ((s, dir) => {
      val c = load(s, dir, "customer")
      val o = load(s, dir, "orders").filter(col("o_totalprice") > 100000)
      c.join(o.select(col("o_custkey")), c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_mktsegment"))
    }),
    "q06_dedup_first_wins" -> ((s, dir) => {
      // first event per user by (ts, event_id): min_by keeps partial agg.
      val e = load(s, dir, "events")
      e.groupBy(col("user_id"))
        .agg(min_by(struct(col("event_id"), col("event_type"), col("value")),
          struct(col("ts"), col("event_id"))).as("first"))
        .select(col("user_id"), col("first.event_id").as("event_id"),
          col("first.event_type").as("event_type"), col("first.value").as("value"))
    }),
    "q07_window_gap_audit" -> ((s, dir) => {
      // O5 analog (annuary_data.py:81-89): missing-id gap detection via lag
      // over the sorted key space (keys bucketed so gaps exist at any sf).
      import org.apache.spark.sql.expressions.Window
      val keys = load(s, dir, "orders")
        .select(floor(col("o_totalprice")).cast("long").as("k"))
        .distinct()
      val w = Window.orderBy(col("k"))
      keys.withColumn("prev", lag(col("k"), 1).over(w))
        .filter(col("prev").isNotNull && col("k") - col("prev") > 1)
        .select(col("prev").as("gap_start"), col("k").as("gap_end"),
          (col("k") - col("prev") - 1).as("missing"))
    }),
    "q08_topk_per_group" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val o = load(s, dir, "orders")
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      o.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          col("rn").cast("long").as("rn"))
    }),

    // ---- extraction pipeline over synthetic transcripts (rows-only) --------
    "q20_extract_modules" -> ((s, dir) => {
      val ex = runExtraction(s, dir)
      ExtractPipeline.ordered(
        ExtractPipeline.dedupModules(ExtractPipeline.modules(ex)))
        .withColumn("zones", concat_ws("|", col("zones")))
    }),
    "q21_extract_clean_text" -> ((s, dir) => {
      val ex = runExtraction(s, dir)
      ExtractPipeline.cleanTurns(ex).toDF()
        .select(col("conv_id"), col("turn_idx"), col("clean_text"),
          col("n_blocks_total"), col("n_blocks_kept"))
        .filter(length(col("clean_text")) > 0)
    }),
    "q22_extract_errors" -> ((s, dir) => {
      val ex = runExtraction(s, dir)
      ExtractPipeline.errors(ex).groupBy(col("code")).count()
    }),
    "q23_extract_entities" -> ((s, dir) => {
      val ex = runExtraction(s, dir)
      ExtractPipeline.dedupEntities(ExtractPipeline.headerEntities(ex))
        .toDF().orderBy(col("num_id"))
    }),
    "q24_extract_metrics" -> ((s, dir) => {
      val ex = runExtraction(s, dir)
      ExtractPipeline.partitionMetrics(ex).toDF()
        .agg(sum(col("turns")).as("turns"),
          sum(col("blocks_total")).as("blocks_total"),
          sum(col("blocks_kept")).as("blocks_kept"),
          sum(col("modules_ok")).as("modules_ok"),
          sum(col("modules_err")).as("modules_err"),
          sum(col("span_chars")).as("span_chars"))
    }),
    "q25_zone_audit" -> ((s, dir) => {
      val ex = runExtraction(s, dir)
      val deduped = ExtractPipeline.dedupModules(ExtractPipeline.modules(ex))
      ExtractPipeline.zoneAudit(deduped, ExtractPipeline.catalogDim(s))
        .groupBy(col("catalog_id"))
        .agg(count(lit(1)).as("zones"), sum(when(col("hit"), 1).otherwise(0)).as("hits"))
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  sum(l_extendedprice) AS sum_price,
        |  avg(l_discount) AS avg_disc,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_pushdown" ->
      """SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
        |WHERE l_quantity > 45 AND l_discount <= 0.02""".stripMargin,
    "q03_broadcast_join" ->
      """SELECT n_name, sum(o_totalprice) AS revenue, count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "q04_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority LIKE '1%')""".stripMargin,
    "q05_semi_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 100000)""".stripMargin,
    "q06_dedup_first_wins" ->
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT user_id, event_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events) t WHERE rn = 1""".stripMargin,
    "q07_window_gap_audit" ->
      """SELECT prev AS gap_start, k AS gap_end, k - prev - 1 AS missing
        |FROM (SELECT k, lag(k) OVER (ORDER BY k) AS prev
        |      FROM (SELECT DISTINCT CAST(FLOOR(o_totalprice) AS BIGINT) AS k
        |            FROM orders) d) t
        |WHERE prev IS NOT NULL AND k - prev > 1""".stripMargin,
    "q08_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t WHERE rn <= 2""".stripMargin
  )
}
