package graft

import org.apache.spark.sql.{SaveMode, SparkSession}

import graft.fixtures.TranscriptGen
import graft.pipeline.{EntityMerge, ExtractPipeline, ResumableExtract}
import graft.sources.CsvSinks

/** The deployable batch job (spark-submit entry point) — the full SURVEY §3
  * lifecycle in one resumable run:
  *
  *   spark-submit --class graft.ExtractJob <jar> <inputParquet> <outDir> [buckets]
  *
  * scan → per-bucket extract (shuffle-free, broadcast dims) → dedup →
  * per-bucket output + checkpoint manifest (kill-safe resume) → entity
  * upsert with conflict table → per-partition metrics table → blessed CSV
  * (fixture format) for the entity register.
  *
  * Locally runnable as `sbt "runMain graft.ExtractJob <in> <out>"` (the
  * session falls back to local[*] when no master is provided).
  */
object ExtractJob {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ExtractJob <inputParquet> <outDir> [buckets]")
    val input = args(0)
    val outDir = args(1)
    val buckets = if (args.length > 2) args(2).toInt else 16

    val builder = SparkSession.builder()
      .appName("graft-extract")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
    val spark =
      (if (sys.props.contains("spark.master") || sys.env.contains("SPARK_MASTER"))
        builder
      else builder.master("local[*]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val turns = ExtractPipeline.readTranscripts(spark, input)
    val ctx = ExtractPipeline.makeContext(TranscriptGen.allEntityIds)

    // 1. resumable bucketed extraction (modules + dead-letter + manifests)
    val results = ResumableExtract.run(spark, turns, ctx, outDir, buckets)
    println(s"[job] buckets processed this run: ${results.size}" +
      s" (skipped ${buckets - results.size} committed)")

    // 2-4 share ONE extraction pass: headers are tiny (one per conversation)
    // so the incoming entity set is collected once and reused; metrics come
    // from the same cached pass.
    val ex = ExtractPipeline.extract(turns, ctx)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // 2. entity upsert against the seeded dimension, conflicts surfaced
      val incoming = ExtractPipeline.dedupEntities(ExtractPipeline.headerEntities(ex))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val merge = EntityMerge.merge(ExtractPipeline.entityDim(spark), incoming)
      merge.conflicts.write.mode(SaveMode.Overwrite).parquet(s"$outDir/entity_conflicts")
      merge.merged.write.mode(SaveMode.Overwrite).parquet(s"$outDir/entities")

      // 3. per-partition lineage metrics table
      ExtractPipeline.partitionMetrics(ex).toDF()
        .write.mode(SaveMode.Overwrite).parquet(s"$outDir/metrics")

      // 4. blessed CSV of the extracted entity registers (fixture format) —
      // the scale-safe sink: per-partition shards, no driver collect; the
      // final assembly is a byte concatenation
      CsvSinks.writeEntityCsvDistributed(incoming, s"$outDir/entities_csv")
      CsvSinks.assembleCsv(s"$outDir/entities_csv", s"$outDir/entities.csv")
      incoming.unpersist()
    } finally ex.unpersist()

    val mods = ResumableExtract.readModules(spark, outDir).count()
    println(s"[job] done: $mods modules committed under $outDir")
    spark.stop()
  }
}
