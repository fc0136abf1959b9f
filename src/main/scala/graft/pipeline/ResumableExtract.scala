package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.core._

/** Resumable batch extraction with per-partition checkpoint manifests — the
  * S8/J4 capability (north rule: a killed run resumes without reprocessing).
  *
  * Mirrors the reference's interrupt-safe save + skip-already-read
  * (/root/reference/diary_ocr.py:95-98,359-363) at cluster scale: the input
  * is bucketed by hash(conv_id); each bucket is one atomic unit of work that
  * writes its output partition directory and then commits one manifest row
  * (bucket id + watermark + counts). On restart, buckets present in the
  * manifest are pruned BEFORE the scan (partition-level pruning, cheaper
  * than the row-level anti-join, which remains available as
  * ExtractPipeline.pruneDone for fine-grained resume).
  *
  * The manifest is a directory of one tiny JSON file per bucket — written
  * AFTER the bucket's data lands, so a crash between data and manifest
  * re-does at most one bucket (output write is idempotent overwrite of that
  * bucket's directory). This is the file-based stand-in for an Iceberg
  * snapshot + watermark table (Iceberg jars are not in this sandbox).
  */
object ResumableExtract {

  final case class BucketResult(bucket: Int, turns: Long, modules: Long, errors: Long)

  def bucketOf(convCol: org.apache.spark.sql.Column, buckets: Int) =
    pmod(hash(convCol), lit(buckets))

  private def manifestPath(outDir: String, bucket: Int) =
    Paths.get(outDir, "_manifest", f"bucket-$bucket%05d.json")

  /** Buckets already committed by a previous run. */
  def committedBuckets(outDir: String, buckets: Int): Set[Int] =
    (0 until buckets).filter(b => Files.exists(manifestPath(outDir, b))).toSet

  /** ALL committed buckets, discovered by listing the manifest directory —
    * never by probing a caller-supplied bucket count, which would silently
    * truncate the read when it is smaller than the writing run's count. */
  def committedBucketList(outDir: String): Seq[Int] = {
    val dir = Paths.get(outDir, "_manifest")
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      val stream = Files.list(dir)
      try {
        import scala.jdk.CollectionConverters._
        stream.iterator().asScala
          .map(_.getFileName.toString)
          .flatMap { n =>
            // digits-only between the markers: a stray foreign file in the
            // manifest dir (operator backup, editor temp) must be ignored,
            // not crash the read with NumberFormatException
            val mid = n.stripPrefix("bucket-").stripSuffix(".json")
            if (n.startsWith("bucket-") && n.endsWith(".json") &&
              mid.nonEmpty && mid.forall(_.isDigit)) Some(mid.toInt)
            else None
          }
          .toSeq.sorted
      } finally stream.close()
    }
  }

  /** Run (or resume) the extraction over `turns`, writing per-bucket module
    * output + manifest rows under `outDir`. Returns per-bucket results of
    * the buckets processed in THIS run (committed buckets are skipped). */
  def run(
      spark: SparkSession,
      turns: Dataset[Turn],
      ctx: ModuleParser.Context,
      outDir: String,
      buckets: Int = 8): Seq[BucketResult] = {
    import spark.implicits._
    Files.createDirectories(Paths.get(outDir, "_manifest"))
    val done = committedBuckets(outDir, buckets)
    val todo = (0 until buckets).filterNot(done)

    todo.map { b =>
      // Partition-level resume prune: only this bucket's conversations pass.
      // At deployment the input is an Iceberg table bucket-partitioned on
      // hash(conv_id), so this filter prunes at the FILE level; on plain
      // parquet it degrades to a full scan per bucket (trade-off accepted
      // for bucket-granular resume — lower `buckets` to amortize).
      val bucketTurns = turns.filter(bucketOf(col("conv_id"), buckets) === b)
      // one extraction pass per bucket: cache the extraction, derive
      // modules + errors + turn count from it
      val ex = ExtractPipeline.extract(bucketTurns, ctx)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val turnCount = ex.count()
        val modules = ExtractPipeline.dedupModules(ExtractPipeline.modules(ex))
        val errors = ExtractPipeline.errors(ex)

        val modCount = writeBucket(modules, s"$outDir/modules", b)
        val errCount = writeBucket(errors.toDF(), s"$outDir/errors", b)

        // commit: the manifest row lands only after the bucket's data, and
        // lands ATOMICALLY (write-temp + rename) — a crash mid-write must
        // not leave a half-manifest that readModules/committedBuckets would
        // take as a commit. This is the file-level analog of an Iceberg
        // snapshot commit.
        val json =
          s"""{"bucket":$b,"turns":$turnCount,"modules":$modCount,"errors":$errCount,"watermark":"complete"}"""
        val target = manifestPath(outDir, b)
        val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
        Files.writeString(tmp, json)
        Files.move(tmp, target,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        BucketResult(b, turnCount, modCount, errCount)
      } finally ex.unpersist()
    }
  }

  private def writeBucket(df: DataFrame, dir: String, bucket: Int): Long = {
    df.write.mode(SaveMode.Overwrite).parquet(f"$dir/bucket=$bucket%05d")
    // count what actually landed (the committed truth, not the plan)
    df.sparkSession.read.parquet(f"$dir/bucket=$bucket%05d").count()
  }

  /** Read back the combined COMMITTED output: only bucket directories whose
    * manifest row landed are scanned, so a crash between a bucket's data
    * write and its manifest commit never leaks uncommitted rows into the
    * read (the resume run overwrites that bucket's directory). The committed
    * set comes from the manifest listing itself — no bucket-count parameter
    * to get wrong. */
  def readModules(spark: SparkSession, outDir: String): DataFrame = {
    val committed = committedBucketList(outDir)
    require(committed.nonEmpty, s"no committed buckets under $outDir")
    val dirs = committed.map(b => f"$outDir/modules/bucket=$b%05d")
    spark.read.option("basePath", s"$outDir/modules").parquet(dirs: _*)
  }
}
