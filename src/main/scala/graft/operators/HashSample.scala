package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic bounded sampling by hash range — the shared sampler behind
  * Ivf.fit and Dedup.ngramStrategyFor (it was copy-pasted between them
  * until round 3's review).
  *
  * Shape: keep rows whose pmod(hash(id), 997) falls under a threshold
  * sized to ~4× the needed fraction, then orderBy(mod, id) + limit — the
  * oversample bounds the TakeOrdered input for free, the (mod, id) order
  * makes the chosen sample identical on every run, and when the corpus is
  * no bigger than the sample the filter keeps everything.
  *
  * The hash range can undershoot the target (vanishingly rare at 4×
  * oversample); callers detect that from whatever cardinality they already
  * have in hand (collected array length, an aggregated distinct count) and
  * switch to `fallback` — full orderBy + limit with no range filter — so
  * the common path never pays a second scan just to check. */
private[operators] object HashSample {

  final case class Plan(sampled: DataFrame, fallback: DataFrame,
      threshold: Long) {
    /** True when `got` rows is fewer than the sample should hold — only
      * possible on the subsampling branch (threshold < 997). */
    def undershot(got: Long, sampleSize: Int, total: Long): Boolean =
      threshold < 997L && got < math.min(sampleSize.toLong, total)
  }

  def plan(base: DataFrame, idCol: String, sampleSize: Int,
      total: Long): Plan = {
    val modCol = pmod(hash(col(idCol)), lit(997))
    val threshold =
      if (total <= sampleSize) 997L
      else math.min(997L, (997.0 * 4 * sampleSize / total).ceil.toLong.max(1L))
    Plan(
      sampled = base.filter(modCol < threshold)
        .orderBy(modCol, col(idCol)).limit(sampleSize),
      fallback = base.orderBy(modCol, col(idCol)).limit(sampleSize),
      threshold = threshold)
  }
}
