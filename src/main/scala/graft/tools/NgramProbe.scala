package graft.tools

import org.apache.spark.sql.functions._

/** Measurement probe behind the q57 strategy choice and the typed posting
  * kernel (Dedup.shinglePostings). Reports, for a sf dir's planted
  * documents corpus:
  *  - shingle vocabulary statistics (distinct shingles, df distribution) —
  *    the dense-vs-Zipfian regime test that picks count-join vs prefix;
  *  - candidate cardinalities for both strategies (and minhash banding for
  *    comparison);
  *  - the Column-form explode trap: size+explode over a projected shingle
  *    array re-evaluates the shingling chain per exploded row (measured
  *    13× vs explode over materialized arrays — why the typed kernel
  *    exists).
  */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $label: $n rows, ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = graft.SparkEntry.withPlantedTextDups(
      spark.read.parquet(dir + "/documents.parquet")
        .select(col("doc_id"), col("text")))
      .cache()
    println(s"[probe] docs: ${docs.count()}")

    // vocabulary / df statistics — the regime test
    val shc = array_distinct(graft.operators.TextStats.shinglesCol(col("text"), 3))
    val base = docs.select(col("doc_id"), shc.as("sh"))
    val mat = base.localCheckpoint() // materialized arrays, for the trap A/B
    val postings = mat.select(col("doc_id"), explode(col("sh")).as("shingle"))
    val dfreq = postings.groupBy("shingle").agg(count(lit(1)).as("df"))
    println("[probe] df distribution (dense vocab = flat df, nothing rare):")
    dfreq.select(count(lit(1)).as("distinct_shingles"), max(col("df")),
      expr("percentile(df, 0.5)"), expr("percentile(df, 0.99)")).show()

    // strategy cardinalities + wall times
    timed("prefix candidates")(
      graft.operators.Dedup.ngramCandidates(docs, "doc_id", "text", 0.7).count())
    timed("minhash candidates (for comparison)")(
      graft.operators.Dedup.minhashCandidates(docs, "doc_id", "text").count())
    timed("count-join result")(
      graft.operators.Dedup.ngramNearDupsByCount(docs, "doc_id", "text", 0.7).count())
    timed("prefix+verify result")(
      graft.operators.Dedup.ngramNearDups(docs, "doc_id", "text", 0.7).count())

    // the explode trap, isolated
    timed("size+explode over PROJECTED shingle arrays (trap)")(
      base.select(col("doc_id"), size(col("sh")).as("sz"),
        explode(col("sh")).as("shingle")).count())
    timed("size+explode over MATERIALIZED arrays")(
      mat.select(col("doc_id"), size(col("sh")).as("sz"),
        explode(col("sh")).as("shingle")).count())
    spark.stop()
  }
}

/** Quick check of the auto selector's pick per sf dir (dirs as args;
  * SPARK_GRAFT_CPUS like the other probes). */
object NgramStrategyCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    for (dir <- dirs) {
      val docs = graft.SparkEntry.withPlantedTextDups(
        spark.read.parquet(dir + "/documents.parquet").select(col("doc_id"), col("text")))
      println(s"[strategy] $dir -> ${graft.operators.Dedup.ngramStrategyFor(docs, "doc_id", "text")}")
    }
    spark.stop()
  }
}
