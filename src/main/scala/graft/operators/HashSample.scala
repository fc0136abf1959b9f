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

  /** The full plan → count → undershoot-fallback → collect sequence every
    * driver-side trainer runs (Ivf.fit, Pq.fit; Bpe.train aggregates
    * first so it plans its own) — one definition so the undershoot rule
    * cannot drift between operators. Returns the collected sample rows. */
  def collectRows(base: DataFrame, idCol: String, sampleSize: Int)
      : Array[org.apache.spark.sql.Row] = {
    val total = base.count() // parquet sources: metadata-only count
    val p = plan(base, idCol, sampleSize, total)
    val picked = p.sampled.collect()
    if (p.undershot(picked.length, sampleSize, total)) p.fallback.collect()
    else picked
  }
}

/** Deterministic driver-side Lloyd k-means shared by the ANN trainers
  * (Ivf.fit over whole vectors with cosine assignment; Pq.fit per subspace
  * with L2 assignment). One definition of the conventions that MUST agree
  * for refit-determinism: evenly spaced sample init, caller-supplied
  * nearest-centroid rule (ties break to the lowest index), empty cell
  * keeps its previous centroid. */
private[operators] object KMeansCore {
  def lloyd(sample: Array[Array[Double]], k: Int, iters: Int)
      (nearest: (Array[Double], Array[Array[Double]]) => Int)
      : Array[Array[Double]] = {
    require(sample.length >= k, s"sample ${sample.length} < k=$k")
    var centroids = Array.tabulate(k)(i => sample(i * (sample.length / k)).clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](centroids(0).length))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        val c = nearest(v, centroids)
        counts(c) += 1
        var d = 0
        while (d < v.length) { sums(c)(d) += v(d); d += 1 }
      }
      centroids = Array.tabulate(k) { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c))
      }
    }
    centroids
  }
}
