package graft.tools

import org.apache.spark.sql.functions._

/** PQ parameter sweep: recall@10 vs brute force across (m, ksub, r) on a
  * given sf dir — the measurement behind q69's shipped parameters. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.Bench.session("32")
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    // the bench's own query-selection rule — measured recall here is the
    // recall the bench will gate
    val queries = graft.SparkEntry.annQueries(e)
    def topIds(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "id").collect().groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val exact = topIds(graft.operators.Similarity.bruteForceTopK(
      e, "vec_id", "embedding", queries, "qid", "qv", 10))
    for (m <- Seq(8, 16); ksub <- Seq(16, 32, 64); r <- Seq(64, 128)) {
      val t0 = System.nanoTime()
      val model = graft.operators.Pq.fit(e, "vec_id", "embedding", m = m, ksub = ksub)
      val got = topIds(graft.operators.Pq.topK(e, "vec_id", "embedding",
        queries, "qid", "qv", 10, model, r = r))
      val per = exact.map { case (q, ids) =>
        got.getOrElse(q, Set.empty[Long]).intersect(ids).size.toDouble / ids.size }
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"m=$m ksub=$ksub r=$r recall=${per.sum / per.size}%.3f " +
        f"bytes/vec=$m wall=$secs%.1fs")
    }
    spark.stop()
  }
}
