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

  test("decontaminateNgrams: any shared n-gram kills the candidate") {
    import spark.implicits._
    val evalDoc = "the quick brown fox jumps over the lazy dog tonight"
    val eval = Seq((100L, evalDoc)).toDF("doc_id", "text")
    val cands = Seq(
      // contains the eval 4-gram "brown fox jumps over" mid-document
      (1L, "intro words here brown fox jumps over and more trailing text"),
      // no 4-gram overlap (words overlap, windows never align)
      (2L, "fox brown the quick dog lazy jumps tonight over the"),
      // clean
      (3L, "completely unrelated content with zero shared windows at all"))
      .toDF("doc_id", "text")
    val out = Sampling.decontaminateNgrams(cands, "doc_id", "text",
      eval, "text", n = 4)
      .collect().map(_.getAs[Long]("doc_id")).sorted
    assert(out.toSeq == Seq(2L, 3L))
  }

  test("decontaminateNgrams: short docs (< n words) use exact-text semantics") {
    import spark.implicits._
    val eval = Seq((100L, "short secret")).toDF("doc_id", "text")
    val cands = Seq(
      (1L, "short secret"), // exact match -> dropped
      (2L, "short secret plus"), // 3 words < n=13 -> whole-text gram differs
      (3L, "other tiny doc")).toDF("doc_id", "text")
    val out = Sampling.decontaminateNgrams(cands, "doc_id", "text",
      eval, "text", n = 13)
      .collect().map(_.getAs[Long]("doc_id")).sorted
    assert(out.toSeq == Seq(2L, 3L))
  }

  test("decontaminateNgrams: majority-contaminated corpus degrades to a " +
    "shuffle anti-join, not a driver-size cliff") {
    // adversarial inverse of the design case: 90% of candidates carry the
    // leaked phrase, so the contaminated-id set is row-scaled. With the
    // old forced broadcast() this shape is a driver OOM at scale; without
    // the hint it is just a join whose strategy AQE picks from the real
    // size. Correctness must be identical either way.
    import spark.implicits._
    val leak = (1 to 13).map(i => s"w$i").mkString(" ") // one eval 13-gram
    val eval = Seq((9999L, leak)).toDF("doc_id", "text")
    val cands = (0L until 500L).map { i =>
      if (i % 10 != 0L) (i, s"doc $i prefix $leak suffix $i")
      else (i, s"clean document number $i with its own private words")
    }.toDF("doc_id", "text")
    val out = Sampling.decontaminateNgrams(cands, "doc_id", "text",
      eval, "text", n = 13)
      .collect().map(_.getAs[Long]("doc_id")).sorted
    assert(out.toSeq == (0L until 500L).filter(_ % 10 == 0L))
  }

  test("decontaminateNgrams == driver-side reference on a random corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(68)
    val vocab = Vector("a", "b", "c", "d", "e")
    def doc() = Seq.fill(3 + rnd.nextInt(15))(vocab(rnd.nextInt(5))).mkString(" ")
    val evalDocs = (100L until 110L).map(i => (i, doc()))
    val cands = (0L until 120L).map(i => (i, doc()))
    def grams(t: String, n: Int): Set[String] = {
      val ws = t.trim.split("\\s+")
      if (ws.length < n) Set(ws.mkString(" "))
      else ws.sliding(n).map(_.mkString(" ")).toSet
    }
    val n = 5 // tiny vocab -> real chance collisions at 5-grams
    val evalSet = evalDocs.flatMap(d => grams(d._2, n)).toSet
    val expect = cands.filter(d => grams(d._2, n).intersect(evalSet).isEmpty)
      .map(_._1).sorted
    val out = Sampling.decontaminateNgrams(
      cands.toDF("doc_id", "text"), "doc_id", "text",
      evalDocs.toDF("doc_id", "text"), "text", n = n)
      .collect().map(_.getAs[Long]("doc_id")).sorted
    assert(out.toSeq == expect)
    assert(expect.length < cands.length, "fixture vacuous: no collisions")
  }
}
