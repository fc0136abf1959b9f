package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the coarse-quantizer
  * scale path complementing Similarity.lshTopK.
  *
  * Train: a deterministic sample of the corpus is k-means-clustered on the
  * DRIVER (the sample is tiny; the model is just k × dim doubles). Index:
  * every corpus vector is assigned to its nearest centroid — one broadcast
  * pass, no shuffle beyond the final top-k. Search: each query probes only
  * its `probes` nearest cells and re-ranks exactly inside them, so the scan
  * cost per query drops from |corpus| to ~probes/k of it. All distances are
  * cosine via the native fused expression (graft.functions.CosineSimilarity).
  */
object Ivf {

  final case class Model(centroids: Array[Array[Double]]) {
    def k: Int = centroids.length
  }

  private def cosineArr(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    val den = math.sqrt(na) * math.sqrt(nb)
    if (den > 0) dot / den else 0.0
  }

  /** Deterministic driver-side k-means on a hash-sampled subset.
    *
    * The deterministic pick is orderBy(hash-mod, id).limit — but a bare
    * TakeOrdered over the whole corpus scans everything just to grab a
    * sample. A hash-RANGE pre-filter (pmod(hash(id), 997) < T, with T sized
    * ~4× the needed fraction) bounds the TakeOrdered input for free; when
    * the corpus is no bigger than the sample the filter keeps everything,
    * so the chosen sample — and therefore the model — is unchanged on
    * small fixtures. */
  def fit(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, sampleSize: Int = 2048, iters: Int = 5): Model = {
    val base = corpus
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v"))
    val sample = HashSample.collectRows(base, "id", sampleSize)
      .map(_.getSeq[Double](1).toArray)
    // shared Lloyd core; assignment by cosine, ties to the lowest index
    val centroids = KMeansCore.lloyd(sample, k, iters) { (v, cents) =>
      var best = 0; var bestCos = Double.MinValue
      var c = 0
      while (c < cents.length) {
        val cs = cosineArr(v, cents(c))
        if (cs > bestCos) { bestCos = cs; best = c }
        c += 1
      }
      best
    }
    Model(centroids)
  }

  /** Column: index of the nearest centroid for a vector column. */
  def cellOf(v: Column, model: Model): Column = {
    val cosines = model.centroids.map { c =>
      graft.functions.CosineSimilarity(
        v.cast("array<double>"),
        typedLit(c.toSeq))
    }
    val arr = array(cosines.toIndexedSeq: _*)
    (array_position(arr, array_max(arr)) - 1).cast("int")
  }

  /** IVF candidate set, UNRANKED: assign corpus to cells once; each query
    * probes its `probes` nearest cells. Returns (query_id, id, v, qv). */
  def candidates(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      model: Model, probes: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._

    val assigned = corpus.select(
      col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"),
      cellOf(col(vecCol), model).as("cell"))

    // queries are small: compute their probe cells driver-side
    val qRows = queries.select(col(qidCol).cast("long").as("query_id"),
      col(qvecCol).cast("array<double>").as("qv")).collect()
    val probePairs = qRows.flatMap { r =>
      val qv = r.getSeq[Double](1).toArray
      val ranked = model.centroids.zipWithIndex
        .map { case (c, i) => (i, cosineArr(qv, c)) }
        .sortBy { case (i, cs) => (-cs, i) }
        .take(probes)
      ranked.map { case (cell, _) => (r.getLong(0), cell) }
    }.toSeq.toDF("query_id", "cell")
    val qDf = qRows.map(r => (r.getLong(0), r.getSeq[Double](1)))
      .toSeq.toDF("query_id", "qv")

    assigned
      .join(broadcast(probePairs), Seq("cell"))
      .join(broadcast(qDf), Seq("query_id"))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id"), col("v"), col("qv"))
  }

  /** ANN top-k: probe-limited candidates + exact cosine re-rank. */
  def topK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, model: Model, probes: Int = 4): DataFrame =
    Similarity.rerankTopK(
      candidates(corpus, idCol, vecCol, queries, qidCol, qvecCol, model, probes), k)
}
