package graft.tools
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.session("8")
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    println(s"entry rows: $n")
    assert(n > 0, "entry returned no rows")
    spark.stop()
  }
}
