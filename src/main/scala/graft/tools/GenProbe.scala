package graft.tools

/** Splits the flagship extract leg's timed region into its two components:
  * the lazy generator re-executes inside Bench.extractionThroughput's timer
  * (the Dataset is unmaterialized by design — the leg times the fused
  * scan-equivalent + extraction job), so generation cost IS part of the
  * flagship number. Measured r06: generation-only ≈ 0.20–0.26 s of the
  * ≈ 0.32 s leg at sf0.1×12 — the motivation for the bit-identical
  * TranscriptGen micro-optimization (fingerprint-pinned). */
object GenProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val nConvs = graft.SparkEntry.nConvsFor(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")) * 12
    val par = spark.sparkContext.defaultParallelism * 4
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = graft.pipeline.ExtractPipeline.transcripts(spark, nConvs, par).count()
      println(f"[genprobe] gen-only run$i: $n turns ${(System.nanoTime() - t0) / 1e9}%.3f s")
      val (t, secs) = graft.Bench.extractionThroughput(spark, nConvs)
      println(f"[genprobe] gen+extract run$i: $t turns $secs%.3f s = ${t / secs}%.0f t/s")
    }
    spark.stop()
  }
}
