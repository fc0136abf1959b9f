package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a pretraining data pipeline needs beyond
  * dedup/sampling: sequence packing, repetition quality stats, PII
  * redaction. All pure Column/window formulations — no UDFs, no typed
  * kernels needed (nothing here explodes a projected array, the trap
  * documented at Dedup.shinglePostings).
  */
object Curation {

  // ---- sequence packing ---------------------------------------------------

  /** Concat-and-slice sequence packing: the GPT-style batching layout where
    * each shard's documents are conceptually concatenated in a stable order
    * and the token stream is sliced into fixed `window`-token samples. A
    * document's pack is the window containing its FIRST token — the
    * deterministic, windowless-join formulation of sample packing (true
    * close-when-full greedy packing is a sequential recurrence that no
    * window function expresses; concat-and-slice is what production packers
    * do anyway, splitting long documents across window boundaries at the
    * token level downstream).
    *
    * Returns the input plus (shard, tok_start, pack_id, pack_pos):
    * `tok_start` = the doc's offset in its shard's token stream, `pack_id`
    * = floor(tok_start / window) (globally unique via shard * 2^40 packing),
    * `pack_pos` = ordinal within the shard.
    *
    * Scale: ONE hash shuffle into `nShards` + a per-shard window (cumsum +
    * row_number over the same partitioning — one sort). Shard count scales
    * with the corpus so the per-shard sort stays bounded; there is never a
    * global window. Packing is reproducible from (idCol, nShards, window)
    * alone — any engine can recompute it, which is what the DuckDB oracle
    * does. */
  def packSequences(
      docs: DataFrame, idCol: String, tokensCol: Column,
      window: Long, nShards: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    // pack_id = shard * 2^40 + packInShard: the raise_error below guards the
    // packInShard term, but shard * 2^40 itself overflows Long silently once
    // nShards > 2^23 — reject that at the API boundary
    require(nShards <= (1 << 23),
      s"nShards must be <= 2^23 so shard * 2^40 fits in pack_id, got $nShards")
    val reserved = Seq("shard", "n_tokens", "tok_start", "pack_id", "pack_pos")
    val clash = docs.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"packSequences appends columns ${reserved.mkString(", ")}; " +
        s"input already carries ${clash.mkString(", ")}")
    val shard = pmod(col(idCol), lit(nShards.toLong)).cast("long")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
    // exact integer floor division (RangeJoin.idiv): `/` on longs is DOUBLE
    // division — beyond 2^53 tokens it mis-rounds the pack index while the
    // SQL oracle's integer `//` stays exact
    val packInShard = RangeJoin.idiv(col("tok_start"), window)
    docs
      .withColumn("shard", shard)
      .withColumn("n_tokens", tokensCol.cast("long"))
      .withColumn("tok_start",
        coalesce(sum(col("n_tokens"))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("pack_id",
        // the 2^40 shard-packing contract is ENFORCED, not assumed: a shard
        // stream long enough to overflow its id space fails loudly per row
        // instead of silently colliding with the next shard's packs
        col("shard") * lit(1L << 40) +
          when(packInShard >= lit(1L << 40),
            raise_error(concat(lit("packSequences: shard token stream " +
              "exceeds window * 2^40 tokens at tok_start="), col("tok_start")))
              .cast("long"))
          .otherwise(packInShard))
      .withColumn("pack_pos", (row_number().over(w) - 1).cast("long"))
  }

  // ---- transcript-shape analytics ----------------------------------------

  /** Per-conversation transcript-shape profile over the full
    * (conv_id, turn_idx, role, tool, ts) schema: turn/tool counts,
    * role-alternation violations (turn repeating its predecessor's role),
    * tool switches (tool turn using a different tool than the previous
    * tool turn — `last(ignoreNulls)` reaches across interleaved non-tool
    * turns), and wall-clock span. Both windows and the final groupBy share
    * the conv_id hash partitioning: ONE exchange (PlanSpec-gated via q62).
    * Factored out of the query so the repeat/switch logic is unit-testable
    * on planted violations — the generated corpus's strict role cycle
    * never repeats a role, which would leave the oracle check vacuous. */
  def transcriptShape(turns: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    val prevTool = last(col("tool"), ignoreNulls = true)
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    turns
      .withColumn("prev_role", lag(col("role"), 1).over(w))
      .withColumn("prev_tool", prevTool)
      .groupBy(col("conv_id"))
      .agg(
        count(lit(1)).as("n_turns"),
        sum(when(col("role") === "tool", 1L).otherwise(0L)).as("n_tool_turns"),
        countDistinct(col("tool")).as("n_distinct_tools"),
        sum(when(col("role") === col("prev_role"), 1L).otherwise(0L))
          .as("n_role_repeats"),
        sum(when(col("role") === "tool" && col("prev_tool").isNotNull &&
          col("tool") =!= col("prev_tool"), 1L).otherwise(0L))
          .as("n_tool_switches"),
        ((unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
          / lit(1000000L)).cast("long").as("span_secs"))
  }

  // ---- repetition stats (Gopher-style quality filters) --------------------

  /** Duplicate-n-gram fraction: 1 - |distinct n-grams| / |n-grams| — the
    * repetition family of the Gopher quality filters (Rae et al., "Scaling
    * Language Models: ... Gopher", 2021, Table A1: repeated top-n-gram and
    * duplicate-n-gram filters). n=1 degenerates to duplicate-word fraction.
    * Pure Column (no explode — safe from the projected-array Generate
    * trap); short docs (< n words) have one fallback shingle → fraction 0. */
  def dupNgramFrac(text: Column, n: Int): Column = {
    val arr = if (n == 1) TextStats.tokensCol(text) else TextStats.shinglesCol(text, n)
    val total = size(arr)
    when(total > 0,
      lit(1.0) - size(array_distinct(arr)).cast("double") / total)
      .otherwise(0.0)
  }

  // ---- PII redaction ------------------------------------------------------

  /** Conservative-by-construction patterns chosen for identical semantics
    * in Java regex (Spark) and RE2 (DuckDB): character classes, bounded
    * quantifiers, and \b word boundaries only — no lookaround, no
    * backreferences (RE2 has neither). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\b\\d{3}[-.]\\d{3,4}[-.]\\d{4}\\b"

  /** Redact emails/phone-shaped tokens, reporting match counts: returns
    * (redacted text, n_emails, n_phones) columns. Redaction is sequential
    * (emails first, then phones over the email-redacted text), and each
    * count is taken on the text that pattern actually ran against — so
    * n_emails = emails in the input and n_phones = <PHONE> tokens in the
    * OUTPUT, even in pathological adjacency cases where the email
    * replacement creates or destroys a phone word boundary. */
  def redactPii(text: Column): Seq[(String, Column)] = {
    val emails = size(regexp_extract_all(text, lit(EmailPattern), lit(0)))
    val afterEmail = regexp_replace(text, EmailPattern, "<EMAIL>")
    val phones = size(regexp_extract_all(afterEmail, lit(PhonePattern), lit(0)))
    val redacted = regexp_replace(afterEmail, PhonePattern, "<PHONE>")
    Seq(
      "clean_text" -> redacted,
      "n_emails" -> emails.cast("long"),
      "n_phones" -> phones.cast("long"))
  }

  /** Corpus-level repeated-paragraph removal — the C4 preprocessing step
    * (Raffel et al., "Exploring the Limits of Transfer Learning with a
    * Unified Text-to-Text Transformer", JMLR 2020, §2.2: lines occurring
    * three or more times in the dataset are deleted from every document;
    * public method). Boilerplate (cookie banners, nav bars, license
    * headers) is exactly the text that repeats corpus-wide.
    *
    * A paragraph is a `sep`-delimited segment; one occurring `minCount`+
    * times ACROSS THE CORPUS (total occurrences, multiplicity included) is
    * dropped from every document; documents are rebuilt in original
    * paragraph order. Every input row survives (a fully-boilerplate doc
    * comes back with empty text — filtering is the caller's policy call).
    * Precondition: `idCol` unique per row.
    *
    * Scale shape: explode → hash-groupBy paragraph counts (map-side
    * partial agg crushes the hot boilerplate keys — deliberately NOT a
    * window over partitionBy(paragraph), which would funnel every copy of
    * the hottest paragraph through one task) → anti-join against the
    * small over-threshold set (broadcastable; AQE picks it) → per-doc
    * rebuild bounded by document size. No all-pairs, no per-corpus state
    * on any single task. */
  def removeRepeatedParagraphs(docs: DataFrame, idCol: String, textCol: Column,
      sep: String = "\n", minCount: Long = 3): DataFrame = {
    require(minCount >= 2, s"minCount must be >= 2, got $minCount")
    require(sep.nonEmpty, "sep must be non-empty")
    // materialized ONCE: `textCol` is caller-supplied and may be an
    // arbitrarily expensive expression (q65 synthesizes its paragraph
    // structure in it), and this operator evaluates it through THREE
    // consumers — the hot-paragraph count, the anti-join's kept stream,
    // and the null-flag frame. Measured at bench scale the projection
    // alone was 0.33 s × 3 of a 1.86 s leg; the checkpoint pays one
    // local write instead (the dedupCorpus lifecycle-stage precedent —
    // a production corpus rewrite materializes its input view once).
    val base = docs.select(col(idCol).as("_id"), textCol.as("_t"))
      .localCheckpoint()
    val paras = base.select(col("_id"),
      posexplode(split(col("_t"), java.util.regex.Pattern.quote(sep)))
        .as(Seq("_pos", "_p")))
    val hot = paras.groupBy(col("_p")).agg(count(lit(1)).as("_c"))
      .filter(col("_c") >= minCount)
      .select(col("_p"))
    // NO forced broadcast on the hot set (the q68 rule): its size is
    // data-shaped — bounded by totalParas/minCount, which a mirrored or
    // template-heavy corpus makes row-scaled, where a broadcast hint is a
    // driver OOM instead of a graceful shuffle. In the design case (a
    // handful of boilerplate strings) AQE broadcasts it at runtime once
    // the aggregate stage materializes — keeping the row-scaled side
    // shuffle-free here (the rebuild's groupBy(_id) is the one shuffle) —
    // and PlanSpec asserts that runtime choice on the bench fixture. In
    // the degenerate regime the anti-join's paragraph-keyed shuffle is
    // skewed on the hottest paragraph, which AQE's skew-join splitting
    // handles; the broadcast cliff would not have completed at all.
    val kept = paras.join(hot, Seq("_p"), "left_anti")
    val rebuilt = kept.groupBy(col("_id")).agg(
      array_join(
        transform(array_sort(collect_list(struct(col("_pos"), col("_p")))),
          x => x.getField("_p")),
        sep).as("_clean"))
    // NULL text propagates as NULL (SQL semantics, and what the q65 DuckDB
    // oracle's string functions do) — only a doc whose every paragraph was
    // removed comes back as the empty string
    base.select(col("_id"), col("_t").isNull.as("_was_null"))
      .join(rebuilt, Seq("_id"), "left")
      .select(col("_id").as(idCol),
        when(col("_was_null"), lit(null).cast("string"))
          .otherwise(coalesce(col("_clean"), lit(""))).as("text"))
  }
}
