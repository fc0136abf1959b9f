package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus-curation sampling + decontamination — the
  * data-selection operators a training-data pipeline runs right after
  * dedup, built to be exactly reproducible across engines and runs.
  *
  * The sampling coin is `md5(seed "|" id)` compared as a HEX-PREFIX string
  * against a threshold: portable (md5 is md5 everywhere, so a DuckDB/Trino
  * audit recomputes the identical keep set — unlike xxhash64/rand(seed),
  * which are engine-specific), seedable (different seeds = independent
  * coins), and partition-independent. A 4-hex-digit prefix gives rate
  * granularity 1/65536: threshold "8000" ≈ 50%, "1999" ≈ 10%.
  */
object Sampling {

  /** The [0,1)-uniform coin for an id under a seed, as a 4-hex-char string. */
  def coin(idCol: Column, seed: String): Column =
    substring(md5(concat(lit(seed + "|"), idCol.cast("string"))), 1, 4)

  /** Keep predicate: coin < thresholdHex (4 lowercase hex chars). */
  def keep(idCol: Column, seed: String, thresholdHex: String): Column =
    coin(idCol, seed) < lit(thresholdHex)

  /** Uniform deterministic sample. */
  def sample(df: DataFrame, idCol: String, seed: String,
      thresholdHex: String): DataFrame =
    df.filter(keep(col(idCol), seed, thresholdHex))

  /** Stratified deterministic sample: per-stratum hex thresholds (e.g.
    * lang -> rate for language rebalancing), `defaultHex` for unlisted
    * strata. Scales as a pure filter — no shuffle, pushes nothing to the
    * driver, and the same row set falls out at any parallelism. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      thresholds: Map[String, String], defaultHex: String,
      seed: String): DataFrame = {
    val thr = thresholds.foldLeft(lit(defaultHex)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(coin(col(idCol), seed) < thr)
  }

  /** Benchmark decontamination: drop every candidate row whose fingerprint
    * collides with the eval set's fingerprints. The eval fingerprint set is
    * tiny by construction → broadcast anti-join (PlanSpec-gated), so the
    * candidate side streams with no shuffle. `fpCol` must already be on
    * both frames (e.g. TextStats.fingerprintCol). */
  def decontaminate(candidates: DataFrame, evalDocs: DataFrame,
      fpCol: String): DataFrame =
    candidates.join(
      broadcast(evalDocs.select(col(fpCol)).distinct()), Seq(fpCol), "left_anti")

  /** N-gram-overlap decontamination — the GPT-3 appendix-C / public-recipe
    * form: a candidate document is dropped if it shares ANY word n-gram
    * with the eval set (documents shorter than n words contribute their
    * whole text as the single "gram" — exact-match semantics for short
    * docs, same as the fingerprint shingles). Stricter than the
    * fingerprint collision of [[decontaminate]]: partial contamination
    * (one leaked paragraph) kills the doc even when the fingerprint — a
    * min-hash of the WHOLE doc — differs.
    *
    * Scale shape: distinct eval n-grams are the blocklist — tiny relative
    * to the corpus (the eval set is, by definition, small) — broadcast
    * into a semi-join against the candidate gram stream (typed one-pass
    * kernel, the HashCore shingle discipline: no projected-array explode
    * re-evaluation); candidates with a hit collapse by id via partial-agg
    * distinct, then a broadcast anti-join removes them. The candidate side
    * never shuffles its text. Returns the surviving candidate rows
    * unchanged. `idCol` must be integral and unique. */
  def decontaminateNgrams(candidates: DataFrame, idCol: String,
      textCol: String, evalDocs: DataFrame, evalTextCol: String,
      n: Int = 13): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val spark = candidates.sparkSession
    import spark.implicits._
    val evalGrams = evalDocs
      .select(col(evalTextCol).cast("string").as("t")).as[String]
      .flatMap(t => HashCore.shingleStrings(if (t == null) "" else t, n))
      .distinct()
      .toDF("gram")
    val candGrams = candidates
      .select(col(idCol).cast("long").as("_id"),
        col(textCol).cast("string").as("t"))
      .as[(Long, String)]
      .flatMap { case (id, t) =>
        HashCore.shingleStrings(if (t == null) "" else t, n).map(g => (id, g))
      }
      .toDF("_id", "gram")
    val contaminated = candGrams
      .join(broadcast(evalGrams), Seq("gram"), "left_semi")
      .select(col("_id")).distinct()
    // NO broadcast hint on the contaminated-id set: its size is
    // data-shaped (a heavily contaminated corpus makes it row-scaled, and
    // a forced broadcast would be a driver OOM instead of a graceful
    // shuffle anti-join). Rare contamination — the design case — is a
    // few-KB relation AQE broadcasts at runtime anyway; the hint bought
    // nothing but the cliff.
    candidates.join(contaminated,
      col(idCol) === contaminated("_id"), "left_anti")
  }
}
