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

  def writeEntityCsv(ds: Dataset[EntityRegister], path: String): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.write(p, entityCsv(ds.collect().toSeq).getBytes(StandardCharsets.UTF_8))
  }
}
