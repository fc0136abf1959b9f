package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RangeJoin.pointInInterval vs a naive driver-side double loop. */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("bucketized join == naive all-pairs containment on a randomized input") {
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    val points = Seq.fill(500)(
      (rnd.nextInt(8).toLong, rnd.nextInt(10000).toLong, rnd.nextInt(1000000).toLong))
    // lengths 0..~3.3 buckets at width 700: exercises empty intervals,
    // single-bucket, and multi-bucket explodes
    val intervals = Seq.fill(120) {
      val s = rnd.nextInt(10000).toLong
      (rnd.nextInt(8).toLong, s, s + rnd.nextInt(2400).toLong, rnd.nextInt(1000000).toLong)
    }
    val p = points.toDF("k", "pts", "pid").repartition(7)
    val i = intervals.toDF("k", "ws", "we", "iid").repartition(5)

    val got = RangeJoin.pointInInterval(p, "pts", i, "ws", "we", "k", bucketWidth = 700L)
      .select("k", "pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val expect = (for {
      (pk, pts, pid) <- points
      (ik, ws, we, iid) <- intervals
      if pk == ik && pts >= ws && pts < we
    } yield (pk, pid, iid)).sorted
    assert(got == expect)
    assert(expect.nonEmpty)
  }

  test("half-open bounds: start inclusive, end exclusive; inverted interval matches nothing") {
    import spark.implicits._
    val p = Seq((1L, 100L, 1L), (1L, 200L, 2L)).toDF("k", "pts", "pid")
    val i = Seq((1L, 100L, 200L, 10L), (1L, 500L, 400L, 11L)).toDF("k", "ws", "we", "iid")
    val got = RangeJoin.pointInInterval(p, "pts", i, "ws", "we", "k", 64L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 10L))) // pts=100 in, pts=200 out, inverted out
  }

  test("no duplicate pairs when an interval spans many buckets") {
    import spark.implicits._
    val p = Seq((1L, 50L, 1L)).toDF("k", "pts", "pid")
    val i = Seq((1L, 0L, 1000L, 10L)).toDF("k", "ws", "we", "iid")
    val rows = RangeJoin.pointInInterval(p, "pts", i, "ws", "we", "k", 10L).collect()
    assert(rows.length == 1)
  }

  test("exact bucketing beyond 2^53: epoch-nanos timestamps still match") {
    import spark.implicits._
    // ~1.7e18 >> 2^53: double division would misplace buckets out here
    val base = 1700000000000000123L
    val p = Seq((1L, base, 1L), (1L, base + 999L, 2L)).toDF("k", "pts", "pid")
    val i = Seq((1L, base - 5L, base + 1000L, 10L)).toDF("k", "ws", "we", "iid")
    val got = RangeJoin.pointInInterval(p, "pts", i, "ws", "we", "k", 1000000000L)
      .select("pid").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 2L))
  }

  test("plan is an equi-join: no cartesian / broadcast-nested-loop node") {
    import spark.implicits._
    val p = Seq((1L, 1L, 1L)).toDF("k", "pts", "pid")
    val i = Seq((1L, 0L, 2L, 10L)).toDF("k", "ws", "we", "iid")
    val plan = RangeJoin.pointInInterval(p, "pts", i, "ws", "we", "k", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("BroadcastNestedLoop"))
  }
}
