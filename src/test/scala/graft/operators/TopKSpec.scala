package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** TopK heap aggregate: differential vs the row_number window form (the
  * retired q44 shape), ties, k larger than the group, and heap internals. */
class TopKSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy(col("g")).orderBy(col("s").desc, col("id"))
    df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("g"), col("id"), col("s"), col("rank").cast("long").as("rank"))
  }

  test("heap aggregate == row_number window on a seeded many-group corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // deliberate tie pressure: scores quantized to 20 distinct values
    val rows = (1 to 5000).map { i =>
      (rnd.nextInt(17).toLong, i.toLong, (rnd.nextInt(20) / 10.0))
    }
    val df = rows.toDF("g", "id", "s").repartition(8)
    val a = TopK.topKPerGroup(df, "g", "id", "s", 5).collect().toSet
    val b = windowTopK(df, 5).collect().toSet
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("k larger than the group returns the whole group, ranked") {
    import spark.implicits._
    val df = Seq((1L, 10L, 0.5), (1L, 11L, 0.9), (2L, 20L, 0.1))
      .toDF("g", "id", "s")
    val out = TopK.topKPerGroup(df, "g", "id", "s", 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(t => (t._1, t._4))
    assert(out.toSeq == Seq((1L, 11L, 0.9, 1L), (1L, 10L, 0.5, 2L), (2L, 20L, 0.1, 1L)))
  }

  test("heap state: eviction keeps best k under (score desc, id asc)") {
    val st = new TopK.State(3)
    Seq((0.5, 1L), (0.9, 2L), (0.1, 3L), (0.9, 9L), (0.5, 0L)).foreach {
      case (s, i) => st.insert(s, i)
    }
    // best 3: (0.9,2), (0.9,9), (0.5,0) — tie at 0.5 resolved to lower id
    assert(st.sorted == Seq(TopK.Hit(2, 0.9), TopK.Hit(9, 0.9), TopK.Hit(0, 0.5)))
  }

  test("merge of partial heaps equals single-pass heap") {
    val all = (1 to 200).map(i => ((i * 37 % 100) / 10.0, i.toLong))
    val single = new TopK.State(7)
    all.foreach { case (s, i) => single.insert(s, i) }
    val (h1rows, h2rows) = all.splitAt(83)
    val h1 = new TopK.State(7); h1rows.foreach { case (s, i) => h1.insert(s, i) }
    val h2 = new TopK.State(7); h2rows.foreach { case (s, i) => h2.insert(s, i) }
    assert(h1.mergeFrom(h2).sorted == single.sorted)
  }

  test("NaN scores are rejected: heap never admits or wedges on NaN") {
    val st = new TopK.State(2)
    st.insert(Double.NaN, 1L) // would occupy the root and veto all inserts
    st.insert(0.3, 2L)
    st.insert(Double.NaN, 3L)
    st.insert(0.7, 4L)
    st.insert(0.5, 5L) // evicts 0.3 — proves the heap still orders
    assert(st.sorted == Seq(TopK.Hit(4, 0.7), TopK.Hit(5, 0.5)))
  }
}
