package graft.tools

import graft.core._
import graft.fixtures.TranscriptGen
import graft.pipeline.ExtractPipeline

/** Compares the chained typed pipeline vs one fused mapPartitions. */
object FuseProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nConvs = if (args.nonEmpty) args(0).toLong else 100000L
    val spark = graft.Bench.session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val ctx = ExtractPipeline.makeContext(TranscriptGen.allEntityIds)
    val bc = spark.sparkContext.broadcast(ctx)
    val chunks = 16
    val par = spark.sparkContext.defaultParallelism * 4

    def t[A](label: String)(f: => A): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
    }

    // fully fused: range -> Long count, zero encoder boundaries for payloads
    def fused(): Long =
      spark.range(0L, nConvs * chunks, 1L, par).as[Long].mapPartitions { it =>
        val c = bc.value
        var modules = 0L
        it.foreach { i =>
          val convIdx = i % nConvs
          val chunk = (i / nConvs).toInt
          val n = TranscriptGen.turnsPerConv(nConvs, convIdx)
          val per = (n + chunks - 1) / chunks
          val lo = chunk * per
          val hi = math.min(n, lo + per)
          var tI = lo
          while (tI < hi) {
            val turn = TranscriptGen.turn(ExtractPipeline.Seed, nConvs, convIdx, tI)
            modules += Extractor.extractTurn(turn, c).modules.size
            tI += 1
          }
        }
        Iterator.single(modules)
      }.reduce(_ + _)

    def chained(): Long = {
      val turns = ExtractPipeline.transcripts(spark, nConvs, par)
      ExtractPipeline.modules(ExtractPipeline.extract(turns, ctx)).count()
    }

    t("fused warm-up")(fused())
    t("fused run    ")(fused())
    t("chained warm-up")(chained())
    t("chained run    ")(chained())
    println(ExtractPipeline.modules(ExtractPipeline.extract(
      ExtractPipeline.transcripts(spark, 100, 4), ctx)).queryExecution.executedPlan.toString.take(2000))
    spark.stop()
  }
}
