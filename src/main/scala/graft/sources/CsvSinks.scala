package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Dataset

import graft.core.EntityRegister

/** Fixture-equality CSV sinks — byte-compatible with the reference's output
  * format (/root/reference/src/annuary/annuary_data.py:117-128,
  * /root/reference/src/diary/diary_data.py:69-83): Python csv.DictWriter
  * with delimiter ',', quotechar "'", QUOTE_NONNUMERIC (strings quoted,
  * numbers bare, embedded quotechar doubled), CRLF line endings, rows
  * sorted by key.
  *
  * These are driver-side single-file sinks for small blessed outputs (the
  * reference corpus is thousands of rows); the scale path writes parquet
  * partitions + manifest (ResumableExtract).
  */
object CsvSinks {

  private def q(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Entity (annuary-analog) CSV: header + rows sorted by num_id. */
  def entityCsv(rows: Seq[EntityRegister]): String = {
    val sb = new StringBuilder
    sb ++= Seq("num_id", "text_id", "name", "type", "info").map(q).mkString(",")
    sb ++= "\r\n"
    rows.sortBy(_.num_id).foreach { r =>
      sb ++= s"${r.num_id},${q(r.text_id)},${q(r.name)},${q(r.kind)},${q(r.info)}\r\n"
    }
    sb.toString
  }

  /** Module (diary-analog) CSV: (annuary_id, pipe-joined module) sorted by
    * id, preserving per-id insertion order — diary_data.py:76-82. */
  def moduleCsv(rows: Seq[(Int, String)]): String = {
    val sb = new StringBuilder
    sb ++= Seq("annuary_id", "module").map(q).mkString(",")
    sb ++= "\r\n"
    rows.sortBy(_._1).foreach { case (id, module) =>
      sb ++= s"$id,${q(module)}\r\n"
    }
    sb.toString
  }

  // NOTE: there is deliberately NO collect-to-driver Dataset sink here — the
  // deploy path writes via writeEntityCsvDistributed + assembleCsv; fixture
  // tests format driver-local Seqs with entityCsv directly.

  /** Scale-safe entity sink: NO driver collect. Rows are
    * range-partitioned on the sort key and formatted per partition, so each
    * task writes one shard and the shards concatenate (in part-file order)
    * to exactly `entityCsv` of the whole dataset. Header rides in a `_header`
    * file; `assembleCsv` concatenates header + sorted shards when a single
    * blessed file is wanted (the tiny final cat is I/O-bound, not a driver
    * materialization of the dataset). */
  def writeEntityCsvDistributed(ds: Dataset[EntityRegister], dir: String,
      partitions: Int = 0): Unit = {
    val spark = ds.sparkSession
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val p = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    Files.createDirectories(Paths.get(dir))
    ds.repartitionByRange(p, col("num_id"))
      .sortWithinPartitions("num_id")
      // one record per row with a trailing '\r': the text() writer appends
      // '\n' per record, restoring the exact CRLF bytes with O(row) task
      // memory (never a whole-shard buffer)
      .map(r => s"${r.num_id},${q(r.text_id)},${q(r.name)},${q(r.kind)},${q(r.info)}\r")
      .write.mode("overwrite").text(s"$dir/shards")
    Files.write(Paths.get(dir, "_header"),
      (Seq("num_id", "text_id", "name", "type", "info").map(q).mkString(",") + "\r\n")
        .getBytes(StandardCharsets.UTF_8))
  }

  /** Concatenate a writeEntityCsvDistributed directory to one file. */
  def assembleCsv(dir: String, outFile: String): Unit = {
    import scala.jdk.CollectionConverters._
    val out = Paths.get(outFile)
    if (out.getParent != null) Files.createDirectories(out.getParent)
    val listing = Files.list(Paths.get(dir, "shards"))
    val shards =
      try listing.iterator().asScala
        .filter(_.getFileName.toString.startsWith("part-"))
        .toSeq.sortBy(_.getFileName.toString)
      finally listing.close()
    // stream each shard (Files.copy) — peak memory is a copy buffer, never
    // the largest shard
    val os = Files.newOutputStream(out)
    try {
      Files.copy(Paths.get(dir, "_header"), os)
      shards.foreach(s => Files.copy(s, os))
    } finally os.close()
  }
}
