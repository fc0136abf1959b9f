package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.fixtures.TranscriptGen
import graft.operators.Dedup
import graft.pipeline.{ExtractPipeline, ParquetManifestIO, ResumableExtract}

/** 100×-shape rehearsal (round-3 verdict #7): the full deploy lifecycle —
  * extract → per-bucket commit → interrupt → resume → ordered sink →
  * corpus dedup — at 1× bench scale and 10× bench scale, with per-stage
  * wall times and heap, written to BENCH/REHEARSAL_r{N}.json.
  *
  * The check is SHAPE, not speed: no stage may grow superlinearly in the
  * corpus (ratio_10x beyond ~10× input growth + noise), and heap must stay
  * bounded (no stage holds a corpus-sized structure on one JVM).
  *
  *   sbt "runMain graft.tools.Rehearsal [round]"
  */
object Rehearsal {

  private def heapMB(): Long = {
    val rt = Runtime.getRuntime
    (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
  }

  final case class Stage(name: String, secs: Double, heapMB: Long, rows: Long)

  private def runAt(nConvs: Long, tag: String): (Long, Seq[Stage]) = {
    val spark = graft.Bench.session("32")
    spark.sparkContext.setLogLevel("ERROR")
    val stages = Seq.newBuilder[Stage]
    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      stages += Stage(name, (System.nanoTime() - t0) / 1e9, heapMB(), rows)
      println(f"[rehearsal:$tag] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s, $rows rows")
    }
    try {
      val base = Files.createTempDirectory(s"graft_rehearsal_$tag").toString
      val corpusDir = s"$base/corpus"
      val outDir = s"$base/out"
      val ctx = ExtractPipeline.makeContext(TranscriptGen.allEntityIds)

      // corpus materialization is the fixture, not a graded stage
      ExtractPipeline.writeTranscripts(spark, nConvs, corpusDir, 256)
      val turns = ExtractPipeline.readTranscripts(spark, corpusDir)
      val nTurns = turns.count()

      timed("extract_commit") {
        ResumableExtract.run(spark, turns, ctx, outDir, buckets = 8)
          .map(_.modules).sum
      }
      timed("resume_noop") {
        ResumableExtract.run(spark, turns, ctx, outDir, buckets = 8).size.toLong
      }
      timed("interrupt_resume") {
        // simulated kill between bucket 3's data write and its commit
        ParquetManifestIO.rollback(outDir, 3)
        val redone = ResumableExtract.run(spark, turns, ctx, outDir, buckets = 8)
        require(redone.map(_.bucket) == Seq(3), s"expected bucket 3, got $redone")
        redone.map(_.modules).sum
      }
      timed("ordered_sink") {
        val mods = ResumableExtract.readModules(spark, outDir).drop("bucket")
        ExtractPipeline.ordered(mods)
          .write.mode("overwrite").parquet(s"$base/ordered")
        spark.read.parquet(s"$base/ordered").count()
      }
      timed("dedup_corpus") {
        // turn-level documents (the training-data shape): near-dup collapse
        // over every non-empty clean text in the corpus
        val docs = ExtractPipeline.cleanTurns(
            ExtractPipeline.extract(turns, ctx)).toDF()
          .filter(length(col("clean_text")) > 0)
          .select(
            (hash(col("conv_id")).cast("long") * 100000L + col("turn_idx")).as("doc_id"),
            col("clean_text").as("text"))
        Dedup.dedupCorpus(docs, "doc_id", "text", threshold = 0.9).count()
      }
      (nTurns, stages.result())
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val round = if (args.nonEmpty) args(0) else "r03"
    val oneX = 30000L // = Bench's sf0.1 corpus (nConvsFor * 12)
    val (t1, s1) = runAt(oneX, "1x")
    val (t10, s10) = runAt(oneX * 10, "10x")

    val growth = t10.toDouble / t1
    val body = s1.zip(s10).map { case (a, b) =>
      val ratio = b.secs / math.max(a.secs, 1e-3)
      f""""${a.name}":{"secs_1x":${a.secs}%.2f,"secs_10x":${b.secs}%.2f,"ratio":$ratio%.2f,"rows_1x":${a.rows},"rows_10x":${b.rows},"heap_mb_10x":${b.heapMB},"superlinear":${ratio > growth * 1.5}}"""
    }.mkString(",")
    val json =
      f"""{"turns_1x":$t1,"turns_10x":$t10,"growth":$growth%.2f,"stages":{$body}}"""
    Files.createDirectories(Paths.get("BENCH"))
    Files.writeString(Paths.get(s"BENCH/REHEARSAL_$round.json"), json)
    println(json)
  }
}
