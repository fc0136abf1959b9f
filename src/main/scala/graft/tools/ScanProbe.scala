package graft.tools

/** Scan-vs-extract scaling decomposition: how much of the pinned-core
  * quotient shortfall is the parquet scan + task scheduling (a fixed
  * per-task cost that weighs more on the faster leg) vs the extraction
  * kernel itself. Run pinned like ScalingRun:
  *
  *   taskset -c 0-1 java ... graft.tools.ScanProbe 2 <corpus>
  *   taskset -c 0-7 java ... graft.tools.ScanProbe 8 <corpus>
  */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args(0)
    val corpus = if (args.length > 1) args(1) else "/tmp/graft_scaling_corpus_r3.parquet"
    val spark = graft.Bench.session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val ds = graft.pipeline.ExtractPipeline.readTranscripts(spark, corpus)
    println(s"cpus=$cpus partitions=${ds.rdd.getNumPartitions}")
    ds.count() // warm (page cache, codegen)
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = ds.count()
      println(f"scan-only run $i: $n rows in ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // text-bytes touch: scan + decode the text column fully, no extraction
    import org.apache.spark.sql.functions._
    val lens = ds.toDF().select(length(col("text")).as("l"))
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      lens.agg(sum(col("l"))).head()
      println(f"scan+decode-text run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
