package graft.tools
object Q49Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Bench.session("32")
    spark.sparkContext.setLogLevel("ERROR")
    // warm
    graft.SparkEntry.queries("q49_dedup_corpus")(spark, sfDir).collect()
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q49_dedup_corpus")(spark, sfDir).collect()
      println(f"q49 run$i ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    // split timing: pairs vs clusters
    import org.apache.spark.sql.functions._
    val base = spark.read.parquet(s"$sfDir/documents.parquet").select(col("doc_id"), col("text"))
    val t1 = System.nanoTime()
    val exact = graft.operators.Dedup.exactDedup(base, "doc_id", "text")
    val pairs = graft.operators.Dedup.minhashNearDups(exact, "doc_id", "text", threshold = 0.7)
    pairs.localCheckpoint().count()
    println(f"pairs ${(System.nanoTime()-t1)/1e9}%.2f s")
    val pc = pairs.localCheckpoint()
    val t2 = System.nanoTime()
    val (labels, rounds) = graft.operators.Dedup.nearDupClustersWithRounds(pc)
    labels.count()
    println(f"clusters ${(System.nanoTime()-t2)/1e9}%.2f s rounds=$rounds")
    spark.stop()
  }
}
