package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AsOf.asofJoin vs a naive driver-side per-left-row scan. */
class AsOfSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("asof == naive latest-right-at-or-before on a randomized corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val lefts = Seq.fill(400)((rnd.nextInt(12).toLong, rnd.nextInt(1000).toLong,
      rnd.nextInt(100000).toLong))
    // unique right per (key, ts) — the documented precondition
    val rights = Seq.fill(300)((rnd.nextInt(12).toLong, rnd.nextInt(1000).toLong))
      .distinct.map { case (k, t) => (k, t, k * 100000 + t) }

    val l = lefts.toDF("k", "lts", "lid").repartition(7)
    val r = rights.toDF("k", "rts", "rid").repartition(5)
    val got = AsOf.asofJoin(l, r, "k", "lts", "rts")
      .select(col("k"), col("lts"), col("lid"),
        col("asof.rid").as("rid"), col("asof.rts").as("rts"))
      .collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2),
        if (row.isNullAt(3)) None else Some(row.getLong(3))))
      .sortBy(t => (t._1, t._2, t._3))

    val byKey = rights.groupBy(_._1)
    val expect = lefts.map { case (k, lt, lid) =>
      val best = byKey.getOrElse(k, Nil).filter(_._2 <= lt)
        .sortBy(_._2).lastOption.map(_._3)
      (k, lt, lid, best)
    }.sortBy(t => (t._1, t._2, t._3))
    assert(got.toSeq == expect)
    assert(got.length == lefts.length) // left-outer: every left row survives
    assert(got.exists(_._4.isEmpty) && got.exists(_._4.nonEmpty))
  }

  test("inclusive bound: an equal-ts right row matches") {
    import spark.implicits._
    val l = Seq((1L, 100L, 10L)).toDF("k", "lts", "lid")
    val r = Seq((1L, 100L, 77L)).toDF("k", "rts", "rid")
    val out = AsOf.asofJoin(l, r, "k", "lts", "rts")
      .select(col("asof.rid")).collect()
    assert(out(0).getLong(0) == 77L)
  }

  test("SQL null semantics: null key/ts never matches; left nulls survive unmatched") {
    import spark.implicits._
    val l = Seq((Some(1L), Some(100L), 1L), (None, Some(100L), 2L),
      (Some(1L), None, 3L)).toDF("k", "lts", "lid")
    val r = Seq((Some(1L), Some(50L), 10L), (Some(1L), None, 11L),
      (None, Some(10L), 12L)).toDF("k", "rts", "rid")
    val got = AsOf.asofJoin(l, r, "k", "lts", "rts")
      .select(col("lid"), col("asof.rid").as("rid")).collect()
      .map(row => row.getLong(0) ->
        (if (row.isNullAt(1)) None else Some(row.getLong(1)))).toMap
    // lid=1 matches the one valid right row; null-key (2) and null-ts (3)
    // left rows survive unmatched; null-ts right row 11 is never carried
    // as an "earliest ever" match, null-key right row 12 matches nothing
    assert(got == Map(1L -> Some(10L), 2L -> None, 3L -> None))
  }

  test("reserved/output column names are rejected loudly") {
    import spark.implicits._
    val l = Seq((1L, 1L, 1L)).toDF("k", "lts", "asof")
    val r = Seq((1L, 1L, 1L)).toDF("k", "rts", "rid")
    intercept[IllegalArgumentException] {
      AsOf.asofJoin(l, r, "k", "lts", "rts")
    }
    val l2 = Seq((1L, 1L, 1L)).toDF("k", "lts", "_tag")
    intercept[IllegalArgumentException] {
      AsOf.asofJoin(l2, r, "k", "lts", "rts")
    }
  }

  test("per-key window only: no unpartitioned window in the plan") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val l = Seq((1L, 1L, 1L)).toDF("k", "lts", "lid")
    val r = Seq((1L, 1L, 1L)).toDF("k", "rts", "rid")
    val plan = AsOf.asofJoin(l, r, "k", "lts", "rts")
      .queryExecution.optimizedPlan
    val bad = plan.collect { case w: LWindow if w.partitionSpec.isEmpty => w }
    assert(bad.isEmpty)
  }
}
