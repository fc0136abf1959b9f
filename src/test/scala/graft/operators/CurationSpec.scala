package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("packSequences == driver-side concat-and-slice on a randomized corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(59)
    val docs = (0 until 300).map(i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(40))("w").mkString(" ")))
    val df = docs.toDF("doc_id", "text").repartition(7)
    val got = Curation.packSequences(df, "doc_id",
      TextStats.tokenCount(col("text")), window = 64L, nShards = 4)
      .select("doc_id", "shard", "n_tokens", "tok_start", "pack_id", "pack_pos")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .sortBy(_._1)

    val expect = docs.map { case (id, text) =>
      (id, id % 4, text.split("\\s+").length.toLong)
    }.groupBy(_._2).toSeq.flatMap { case (shard, ds) =>
      var off = 0L
      ds.sortBy(_._1).zipWithIndex.map { case ((id, _, n), pos) =>
        val row = (id, shard, n, off, shard * (1L << 40) + off / 64, pos.toLong)
        off += n
        row
      }
    }.sortBy(_._1)
    assert(got.toSeq == expect)
  }

  test("packSequences invariants: dense per-shard positions, monotone offsets") {
    import spark.implicits._
    val df = (0 until 50).map(i => (i.toLong, "a b c")).toDF("doc_id", "text")
    val rows = Curation.packSequences(df, "doc_id",
      TextStats.tokenCount(col("text")), window = 7L, nShards = 3)
      .select("shard", "tok_start", "pack_pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._3)
      assert(sorted.map(_._3).toSeq == sorted.indices.map(_.toLong))
      assert(sorted.map(_._2).toSeq == sorted.indices.map(i => 3L * i))
    }
  }

  test("dupNgramFrac hand cases") {
    import spark.implicits._
    def fracs(text: String): (Double, Double) = {
      val r = Seq(text).toDF("text")
        .select(Curation.dupNgramFrac(col("text"), 1).as("f1"),
          Curation.dupNgramFrac(col("text"), 2).as("f2"))
        .collect()(0)
      (r.getDouble(0), r.getDouble(1))
    }
    // "a a a b": words 4 / distinct 2 -> 0.5; 2-grams [a a, a a, a b] -> 1/3
    val (f1, f2) = fracs("a a a b")
    assert(math.abs(f1 - 0.5) < 1e-12)
    assert(math.abs(f2 - 1.0 / 3) < 1e-12)
    // all-distinct doc -> 0; short doc (fallback shingle) -> 0
    assert(fracs("x y z") == ((0.0, 0.0)))
    assert(fracs("x") == ((0.0, 0.0)))
  }

  test("redactPii replaces and counts emails/phones") {
    import spark.implicits._
    val text = "mail a.b+c@ex-ample.org or x@y.io, call 555-123-4567 now 12-34"
    val cols = Curation.redactPii(col("text"))
    val r = Seq(text).toDF("text")
      .select(cols.map { case (n, c) => c.as(n) }: _*).collect()(0)
    assert(r.getString(0) ==
      "mail <EMAIL> or <EMAIL>, call <PHONE> now 12-34")
    assert(r.getLong(1) == 2L)
    assert(r.getLong(2) == 1L)
  }

  test("redactPii counts stay consistent with the emitted text on adjacency edges") {
    import spark.implicits._
    // the email replacement CREATES the phone's word boundary ('>' vs 'o'):
    // phone counting runs on the email-redacted text, so n_phones == number
    // of <PHONE> tokens in clean_text even here
    val cols = Curation.redactPii(col("text"))
    val r = Seq("a@b.co555-123-4567").toDF("text")
      .select(cols.map { case (n, c) => c.as(n) }: _*).collect()(0)
    assert(r.getString(0) == "<EMAIL><PHONE>")
    assert(r.getLong(1) == 1L)
    assert(r.getLong(2) == 1L)
  }

  test("transcriptShape counts planted role repeats and tool switches") {
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(i: Int) = new java.sql.Timestamp(ts0.getTime + i * 1000L)
    val turns = Seq(
      ("c1", 0, "user", null, t(0)),
      ("c1", 1, "assistant", null, t(1)),
      ("c1", 2, "tool", "search", t(2)),
      ("c1", 3, "tool", "exec", t(3)), // role repeat + tool switch
      ("c1", 4, "assistant", null, t(4)),
      ("c1", 5, "tool", "exec", t(5)), // same tool across the gap: no switch
      ("c1", 6, "tool", "search", t(6)), // role repeat + tool switch
      ("c2", 0, "user", null, t(0))
    ).toDF("conv_id", "turn_idx", "role", "tool", "ts")
    val got = Curation.transcriptShape(turns).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(got("c1") == ((7L, 4L, 2L, 2L, 2L, 6L)))
    assert(got("c2") == ((1L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("packSequences rejects reserved output column collisions") {
    import spark.implicits._
    val df = Seq((1L, "a b", 0L)).toDF("doc_id", "text", "shard")
    intercept[IllegalArgumentException] {
      Curation.packSequences(df, "doc_id",
        TextStats.tokenCount(col("text")), window = 8L, nShards = 2)
    }
  }

  test("removeRepeatedParagraphs strips corpus-wide boilerplate, keeps order") {
    import spark.implicits._
    val boiler = "ACCEPT ALL COOKIES"
    val docs = Seq(
      (1L, s"$boiler\nunique one\nmiddle A"),
      (2L, s"unique two\n$boiler\nend B"),
      (3L, s"start C\n$boiler"),
      (4L, boiler), // fully boilerplate -> survives as empty text
      (5L, "twice\nunique five"),
      (6L, "twice\nunique six") // 'twice' occurs 2x < minCount=3 -> kept
    ).toDF("doc_id", "text")
    val got = Curation.removeRepeatedParagraphs(docs, "doc_id", col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(
      1L -> "unique one\nmiddle A",
      2L -> "unique two\nend B",
      3L -> "start C",
      4L -> "",
      5L -> "twice\nunique five",
      6L -> "twice\nunique six"))
  }

  test("removeRepeatedParagraphs == driver-side reference on a random corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(65)
    val vocab = Seq("aa", "bb", "cc", "dd")
    def para() = Seq.fill(1 + rnd.nextInt(3))(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val docs = (0L until 80L).map(i =>
      (i, Seq.fill(1 + rnd.nextInt(6))(para()).mkString("\n")))
    val counts = docs.flatMap(_._2.split("\n", -1)).groupBy(identity).view.mapValues(_.size)
    val expect = docs.map { case (i, t) =>
      i -> t.split("\n", -1).filter(p => counts(p) < 3).mkString("\n")
    }.toMap
    val got = Curation.removeRepeatedParagraphs(
      docs.toDF("doc_id", "text"), "doc_id", col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == expect)
  }

  test("removeRepeatedParagraphs: NULL text propagates as NULL, not empty") {
    import spark.implicits._
    val docs = Seq((1L, null.asInstanceOf[String]), (2L, "keep"))
      .toDF("doc_id", "text")
    val got = Curation.removeRepeatedParagraphs(docs, "doc_id", col("text"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getString(1)))).toMap
    // null in -> null out (distinguishable from a fully-boilerplate doc's "")
    assert(got == Map(1L -> None, 2L -> Some("keep")))
  }

  test("removeRepeatedParagraphs counts total occurrences, multiplicity included") {
    import spark.implicits._
    // 'x' appears 3 times but in only 2 docs: total-occurrence counting
    // (the C4 semantics) must drop it everywhere
    val docs = Seq((1L, "x\nx\nkeep"), (2L, "x\nother")).toDF("doc_id", "text")
    val got = Curation.removeRepeatedParagraphs(docs, "doc_id", col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "keep", 2L -> "other"))
  }

  test("removeRepeatedParagraphs skew: one paragraph in 50% of docs is " +
    "removed everywhere, uniques untouched") {
    // the adversarial shape behind the explicit broadcast(hot): the
    // hottest paragraph IS the hottest join key, so a non-broadcast
    // anti-join would funnel half the corpus's text through one task
    import spark.implicits._
    val boiler = "SUBSCRIBE TO OUR NEWSLETTER " + ("x" * 200)
    val docs = (0L until 2000L).map { i =>
      if (i % 2 == 0L) (i, s"unique head $i\n$boiler\nunique tail $i")
      else (i, s"unique only $i")
    }.toDF("doc_id", "text").repartition(16)
    val got = Curation.removeRepeatedParagraphs(docs, "doc_id", col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 2000)
    for (i <- 0L until 2000L) {
      val exp = if (i % 2 == 0L) s"unique head $i\nunique tail $i"
                else s"unique only $i"
      assert(got(i) == exp, s"doc $i")
    }
  }

  test("packSequences rejects nShards > 2^23 (shard term would overflow pack_id)") {
    import spark.implicits._
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Curation.packSequences(df, "doc_id",
        TextStats.tokenCount(col("text")), window = 8L, nShards = (1 << 23) + 1)
    }
    assert(e.getMessage.contains("2^23"))
  }
}
