package graft.tools

/** Dump one SparkEntry query's result to parquet (ad-hoc large-SF oracle
  * spot checks beyond the driver's small-SF gate). */
object DumpOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, out) = args.take(3)
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(out)
    spark.stop()
  }
}
