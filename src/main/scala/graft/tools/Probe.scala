package graft.tools

import graft.fixtures.TranscriptGen
import graft.pipeline.ExtractPipeline

/** Scratch profiling main: isolates generation vs extraction cost. */
object Probe {
  def main(args: Array[String]): Unit = {
    val nConvs = if (args.nonEmpty) args(0).toLong else 4800L
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum
    }
    def t[A](label: String)(f: => A): A = {
      val g0 = gcMillis()
      val t0 = System.nanoTime()
      val r = f
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"$label: $secs%.3f s (gc ${(gcMillis() - g0) / 1000.0}%.2f s)")
      r
    }

    val par = spark.sparkContext.defaultParallelism * 4
    val turns = ExtractPipeline.transcripts(spark, nConvs, par)
    val n1 = t("gen+count (1st, cold)") { turns.count() }
    val n2 = t("gen+count (2nd, warm)") { turns.count() }
    println(s"turns: $n1 $n2")

    val ctx = ExtractPipeline.makeContext(TranscriptGen.allEntityIds)
    val ex = ExtractPipeline.extract(turns, ctx)
    t("gen+extract+count modules (1st)") {
      println("modules: " + ExtractPipeline.modules(ex).count())
    }
    t("gen+extract+count modules (2nd)") {
      ExtractPipeline.modules(ex).count()
    }
    t("gen+extract+count modules (3rd)") {
      ExtractPipeline.modules(ex).count()
    }
    t("gen only (3rd)") { turns.count() }
    // driver-side single-thread extraction rate for comparison
    t("driver-side extract 2000 turns") {
      val ts = TranscriptGen.corpus(TranscriptGen.DefaultSeed, 300)
      ts.take(2000).foreach(tn => graft.core.Extractor.extractTurn(tn, ctx))
    }
    spark.stop()
  }
}
