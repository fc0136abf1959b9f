package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.EntityRegister

/** Reference-format CSV sources (S2/S3):
  * single-quote-quoted CSV with header, num_id coerced to int, and
  * FIRST-wins dedup on load (the reference keeps the first occurrence of a
  * num_id when re-reading its own output —
  * /root/reference/src/annuary/annuary_data.py:21-34 via add_register
  * :91-96). First-wins under parallel read is keyed on file position, never
  * arrival order. */
object CsvSources {

  def readEntityCsv(spark: SparkSession, path: String): Dataset[EntityRegister] = {
    import spark.implicits._
    val raw = spark.read
      .option("header", "true")
      .option("quote", "'")
      .option("escape", "'") // doubled quotechar, python-csv style
      .csv(path)
      .select(
        col("num_id").cast("int").as("num_id"),
        col("text_id"), col("name"),
        col("type").as("kind"), col("info"))
      .na.fill("", Seq("text_id", "name", "kind", "info"))
      .withColumn("_pos", monotonically_increasing_id())
    // first-wins by file position
    val payload = struct(col("num_id"), col("text_id"), col("name"),
      col("kind"), col("info"))
    raw.groupBy(col("num_id"))
      .agg(min_by(payload, col("_pos")).as("r"))
      .select(col("r.*"))
      .as[EntityRegister]
  }

  /** Module CSV source (S3 — /root/reference/src/diary/diary_data.py:19-31):
    * one row per (annuary_id, pipe-joined module); dedup on load mirrors
    * add_module's unseen-only append (diary_data.py:33-49). */
  def readModuleCsv(spark: SparkSession, path: String): org.apache.spark.sql.DataFrame =
    spark.read
      .option("header", "true")
      .option("quote", "'")
      .option("escape", "'")
      .csv(path)
      .select(col("annuary_id").cast("int").as("annuary_id"), col("module"))
      .dropDuplicates("annuary_id", "module")
}
