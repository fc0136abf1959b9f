package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline, over a documents
  * table (doc_id, text, …). All pure `Column` expressions — whole-stage
  * codegen'd, no UDFs, filters/projections push down to the scan.
  *
  * These generalize the reference's validation-as-parsing stance
  * (/root/reference/src/annuary/annuary_register_parser.py:16-26): quality is
  * a scored feature vector instead of a pass/fail regex.
  */
object TextStats {

  /** Whitespace tokens. */
  def tokensCol(text: Column): Column = split(trim(text), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokensCol(text))

  /** BPE-ish subword count: alpha runs + digit runs + isolated symbols —
    * a cheap upper bound on byte-pair-encoded token count. */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Quality feature columns: n_chars, n_tokens, alpha_ratio, digit_ratio,
    * punct_ratio, avg_token_len, plus a composite quality score in [0,1]. */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val n = length(text)
    val alpha = length(regexp_replace(text, "[^A-Za-z]", ""))
    val digit = length(regexp_replace(text, "[^0-9]", ""))
    val punct = length(regexp_replace(text, "[A-Za-z0-9\\s]", ""))
    val toks = tokenCount(text)
    val safeN = when(n > 0, n).otherwise(1)
    val alphaRatio = alpha.cast("double") / safeN
    val digitRatio = digit.cast("double") / safeN
    val punctRatio = punct.cast("double") / safeN
    val nonSpace = length(regexp_replace(text, "\\s", ""))
    val avgTok = when(toks > 0, nonSpace.cast("double") / toks).otherwise(0.0)
    // score: reward alpha-heavy medium-length docs, punish symbol soup
    val score =
      least(lit(1.0), alphaRatio * 0.6
        + when(toks.between(10, 2000), 0.3).otherwise(0.0)
        + when(punctRatio < 0.1, 0.1).otherwise(0.0))
    Seq(
      "n_chars" -> n.cast("long"),
      "n_tokens" -> toks.cast("long"),
      "alpha_ratio" -> alphaRatio,
      "digit_ratio" -> digitRatio,
      "punct_ratio" -> punctRatio,
      "avg_token_len" -> avgTok,
      "quality_score" -> score)
  }

  /** Per-language stopword sets for the n-gram/stopword language-ID
    * heuristic. Deterministic argmax with fixed tiebreak order. */
  val StopwordSets: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "se"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "est"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不")
  )

  /** Per-language hit-count columns (lang_<code>). */
  def langHitColumns(text: Column): Seq[(String, Column)] = {
    val toks = tokensCol(lower(text))
    StopwordSets.map { case (lang, words) =>
      val set = array(words.map(lit): _*)
      s"hits_$lang" -> size(filter(toks, t => array_contains(set, t))).cast("long")
    }
  }

  /** Predicted language: argmax of stopword hits, tiebreak by StopwordSets
    * order, 'und' (undetermined) when all zero. */
  def langIdCol(text: Column): Column = {
    val hits = langHitColumns(text)
    val best = greatest(hits.map(_._2): _*)
    // first-match-wins order is StopwordSets order; fall back to 'und'
    coalesce(
      StopwordSets.map(_._1).zip(hits.map(_._2)).foldLeft(Option.empty[Column]) {
        case (None, (lang, h)) => Some(when(best > 0 && h === best, lang))
        case (Some(c), (lang, h)) => Some(c.when(best > 0 && h === best, lang))
      }.get,
      lit("und"))
  }

  /** Word-k-gram shingles of a document. */
  def shinglesCol(text: Column, k: Int): Column = {
    val words = tokensCol(text)
    val n = size(words)
    when(n >= k,
      transform(sequence(lit(1), n - (k - 1)),
        i => concat_ws(" ", slice(words, i, lit(k)))))
      .otherwise(array(concat_ws(" ", words)))
  }

  /** Document fingerprint: min-hash over word-3-gram shingles (md5 for
    * DuckDB-parity; the scale path uses xxhash64 — see Dedup.minhash). */
  def fingerprintCol(text: Column): Column =
    array_min(transform(shinglesCol(text, 3), s => md5(s)))
}
