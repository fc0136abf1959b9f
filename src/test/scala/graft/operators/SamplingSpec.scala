package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sampling operators: determinism, rate accuracy, stratification, seed
  * independence, decontamination semantics. */
class SamplingSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def ids(n: Int) = {
    import spark.implicits._
    (1L to n.toLong).toDF("id")
  }

  test("hash sample is deterministic and partition-independent") {
    val a = Sampling.sample(ids(5000), "id", "seedA", "4000")
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.sample(ids(5000).repartition(13), "id", "seedA", "4000")
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("rate tracks the threshold (4000/10000 hex ~ 25%)") {
    val kept = Sampling.sample(ids(20000), "id", "seedA", "4000").count()
    val rate = kept.toDouble / 20000
    assert(rate > 0.22 && rate < 0.28, s"rate $rate")
  }

  test("different seeds give independent samples") {
    val a = Sampling.sample(ids(20000), "id", "seedA", "8000")
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.sample(ids(20000), "id", "seedB", "8000")
      .collect().map(_.getLong(0)).toSet
    assert(a != b)
    // overlap of two independent 50% samples ~ 25% of the universe
    val overlap = (a intersect b).size.toDouble / 20000
    assert(overlap > 0.2 && overlap < 0.3, s"overlap $overlap")
  }

  test("stratified: per-stratum rates honored") {
    import spark.implicits._
    val df = (1L to 20000L).map(i => (i, if (i % 2 == 0) "en" else "zh"))
      .toDF("id", "lang")
    val kept = Sampling.stratifiedSample(df, "id", "lang",
      Map("en" -> "8000"), defaultHex = "1999", seed = "s")
    val byLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val enRate = byLang("en").toDouble / 10000
    val zhRate = byLang("zh").toDouble / 10000
    assert(enRate > 0.46 && enRate < 0.54, s"en $enRate")
    assert(zhRate > 0.07 && zhRate < 0.13, s"zh $zhRate")
  }

  test("decontaminate drops exactly the fingerprint-colliding candidates") {
    import spark.implicits._
    val cands = Seq((1L, "fpA"), (2L, "fpB"), (3L, "fpC"), (4L, "fpB"))
      .toDF("doc_id", "fp")
    val eval = Seq((100L, "fpB"), (101L, "fpZ")).toDF("eval_id", "fp")
    val out = Sampling.decontaminate(cands, eval, "fp")
      .collect().map(_.getAs[Long]("doc_id")).sorted
    assert(out.toSeq == Seq(1L, 3L))
  }
}
