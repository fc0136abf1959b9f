package graft.tools

/** Ad-hoc per-query timing probe: `runMain graft.tools.QueryTimer <sfDir>
  * <rounds> <query...>` — times each named SparkEntry query end-to-end
  * (noop sink) for N rounds, interleaved like Bench, printing every sample.
  * For iterating on a single operator without paying the full bench. */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: QueryTimer <sfDir> <rounds> <query...>")
    val (dir, rounds, names) = (args(0), args(1).toInt, args.drop(2).toSeq)
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    for (r <- 1 to rounds; q <- names) {
      val s = graft.Bench.time(graft.SparkEntry.queries(q)(spark, dir))
      println(f"[timer] $q round $r: $s%.2f s")
    }
    spark.stop()
  }
}
