package graft.tools
object MkCorpus {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.session("8")
    spark.sparkContext.setLogLevel("ERROR")
    graft.pipeline.ExtractPipeline.writeTranscripts(spark, 500L, args(0), 16)
    spark.stop()
  }
}
