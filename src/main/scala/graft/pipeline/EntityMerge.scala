package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.core.EntityRegister

/** Entity upsert with a conflict channel — the J3 capability.
  *
  * The reference reconciles each parsed diary header against the annuary:
  * insert if absent; if present with differing fields, a human chooses
  * interactively (/root/reference/diary_ocr.py:119-172, field comparison
  * `are_registers_equals` :144-148 over text_id/info/type/name;
  * update_register /root/reference/src/annuary/annuary_data.py:98-104).
  *
  * Batch cannot prompt: the deterministic policy is **existing wins**
  * (the already-digitized table is the trusted source), and every
  * disagreement is emitted to a conflict table for offline repair + rerun —
  * the same fix-offline-then-resume loop as the dead-letter channel.
  */
object EntityMerge {

  final case class MergeResult(
      merged: Dataset[EntityRegister],
      inserted: DataFrame, // rows that were absent and got inserted
      conflicts: DataFrame // (num_id, existing struct, incoming struct)
  )

  def merge(
      existing: Dataset[EntityRegister],
      incoming: Dataset[EntityRegister]): MergeResult = {
    val spark = existing.sparkSession
    import spark.implicits._

    // first-wins-deduped incoming (one candidate per num_id)
    val in1 = ExtractPipeline.dedupEntities(incoming)

    val e = existing.toDF().alias("e")
    val i = in1.toDF().alias("i")
    val joined = e.join(i, col("e.num_id") === col("i.num_id"), "full_outer")

    val inserted = joined
      .filter(col("e.num_id").isNull)
      .select(col("i.*"))

    // field-level disagreement = conflict (are_registers_equals analog)
    val conflicts = joined
      .filter(col("e.num_id").isNotNull && col("i.num_id").isNotNull &&
        (col("e.text_id") =!= col("i.text_id") ||
          col("e.name") =!= col("i.name") ||
          col("e.kind") =!= col("i.kind") ||
          col("e.info") =!= col("i.info")))
      .select(col("e.num_id").as("num_id"),
        struct(col("e.text_id"), col("e.name"), col("e.kind"), col("e.info")).as("existing"),
        struct(col("i.text_id"), col("i.name"), col("i.kind"), col("i.info")).as("incoming"))

    // merged view: existing wins on collision; absent -> insert
    val merged = joined.select(
      coalesce(col("e.num_id"), col("i.num_id")).as("num_id"),
      coalesce(col("e.text_id"), col("i.text_id")).as("text_id"),
      coalesce(col("e.name"), col("i.name")).as("name"),
      coalesce(col("e.kind"), col("i.kind")).as("kind"),
      coalesce(col("e.info"), col("i.info")).as("info"))
      .as[EntityRegister]

    MergeResult(merged, inserted, conflicts)
  }
}
