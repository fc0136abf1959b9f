package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.fixtures.TranscriptGen
import graft.operators.SharedSpark
import graft.pipeline.ExtractPipeline

class StreamingExtractSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private val ctx = ExtractPipeline.makeContext(TranscriptGen.allEntityIds)

  test("streaming extraction equals batch extraction on the same turns") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val turns = TranscriptGen.corpus(TranscriptGen.DefaultSeed, 5)

    val stream = MemoryStream[Turn]
    val q = StreamingExtract.extractStream(stream.toDS(), ctx)
      .writeStream.format("memory").queryName("stream_modules")
      .outputMode(OutputMode.Append).start()
    try {
      stream.addData(turns.take(10))
      q.processAllAvailable()
      stream.addData(turns.drop(10)) // second micro-batch: incremental
      q.processAllAvailable()
      val streamed = spark.table("stream_modules").as[ExtractedModule]
        .collect().toSet
      val batch = turns.flatMap(t => Extractor.extractTurn(t, ctx).modules).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("watermarked windowed metrics aggregate per conversation per window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val turns = TranscriptGen.corpus(TranscriptGen.DefaultSeed, 3)
    val stream = MemoryStream[Turn]
    val q = StreamingExtract.windowedMetrics(stream.toDS(), ctx)
      .writeStream.format("memory").queryName("stream_metrics")
      .outputMode(OutputMode.Complete).start()
    try {
      stream.addData(turns)
      q.processAllAvailable()
      val rows = spark.table("stream_metrics").collect()
      assert(rows.nonEmpty)
      val totalTurns = rows.map(_.getAs[Long]("turns")).sum
      assert(totalTurns == turns.size)
    } finally q.stop()
  }
}
