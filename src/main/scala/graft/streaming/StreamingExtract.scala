package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.core._
import graft.pipeline.ExtractPipeline

/** Structured Streaming face of the extractor.
  *
  * The reference is a resumable batch pipeline with NO streaming (SURVEY
  * §2.9) — this is additive capability, not a port: a transcript turn
  * stream (`readStream` on the same input_hint schema) flows through the
  * identical per-turn extraction core (stateless per turn, so it is
  * trivially streamable), plus a watermarked per-conversation windowed
  * aggregate for the metrics channel. Resume in streaming mode is the
  * engine's checkpointing (`checkpointLocation`), the streaming twin of the
  * batch manifest (ResumableExtract).
  */
object StreamingExtract {

  /** Stateless per-turn extraction over a streaming Dataset[Turn]:
    * same core, same outputs, append-mode safe. */
  def extractStream(turns: Dataset[Turn], ctx: ModuleParser.Context): Dataset[ExtractedModule] = {
    val spark = turns.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(ctx)
    turns
      .select(col("conv_id"), col("turn_idx"), col("text"))
      .as[(String, Int, String)]
      .mapPartitions { it =>
        val c = bc.value
        it.flatMap { case (conv, idx, text) =>
          Extractor.extract(conv, idx, text, c).modules
        }
      }
  }

  /** Dead-letter stream (same error channel as batch). */
  def errorStream(turns: Dataset[Turn], ctx: ModuleParser.Context): Dataset[ExtractionError] = {
    val spark = turns.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(ctx)
    turns
      .select(col("conv_id"), col("turn_idx"), col("text"))
      .as[(String, Int, String)]
      .mapPartitions { it =>
        val c = bc.value
        it.flatMap { case (conv, idx, text) =>
          Extractor.extract(conv, idx, text, c).errors
        }
      }
  }

  /** Watermarked per-conversation tumbling-window metrics: modules extracted
    * per conversation per minute of event time, tolerating `lateness` of
    * out-of-order turns — the streaming form of the metrics table (X1). */
  def windowedMetrics(
      turns: Dataset[Turn], ctx: ModuleParser.Context,
      lateness: String = "2 minutes", window: String = "1 minute"): DataFrame = {
    val spark = turns.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(ctx)
    val perTurn = turns
      .select(col("conv_id"), col("turn_idx"), col("text"), col("ts"))
      .as[(String, Int, String, java.sql.Timestamp)]
      .mapPartitions { it =>
        val c = bc.value
        it.map { case (conv, idx, text, ts) =>
          val ex = Extractor.extract(conv, idx, text, c)
          (conv, ts, ex.modules.size.toLong, ex.errors.size.toLong)
        }
      }
      .toDF("conv_id", "ts", "n_modules", "n_errors")
    perTurn
      .withWatermark("ts", lateness)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("conv_id"))
      .agg(sum("n_modules").as("modules"), sum("n_errors").as("errors"),
        count(lit(1)).as("turns"))
  }
}
