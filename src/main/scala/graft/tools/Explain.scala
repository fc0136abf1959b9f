package graft.tools

/** Prints the formatted physical plans of the flagship queries. */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.session("8")
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Seq("q20_extract_modules")
    names.foreach { n =>
      println(s"===== $n =====")
      graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .explain("formatted")
    }
    spark.stop()
  }
}
