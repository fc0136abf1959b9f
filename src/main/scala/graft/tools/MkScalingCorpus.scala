package graft.tools

/** Materializes the scaling corpus with full parallelism so the pinned
  * ScalingRun legs measure extraction, not corpus generation. */
object MkScalingCorpus {
  def main(args: Array[String]): Unit = {
    val nConvs = if (args.nonEmpty) args(0).toLong else 300000L
    val out = if (args.length > 1) args(1) else "/tmp/graft_scaling_corpus.parquet"
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    graft.pipeline.ExtractPipeline.writeTranscripts(spark, nConvs, out, 256)
    println(s"[mkscaling] wrote $out")
    spark.stop()
  }
}
