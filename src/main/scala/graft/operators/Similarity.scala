package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — a broadcast of the (small) query set
  * against the corpus, one pass, no corpus shuffle except the final per-query
  * top-k aggregation.
  *
  * Scale path: random-hyperplane LSH bucketing — corpus bucketed once by sign
  * signature (narrow), queries probe their own bucket plus single-bit flips
  * (multi-probe) to recover near-boundary neighbors, exact re-rank inside
  * candidates only. Bucket count 2^nBits bounds the per-task candidate set.
  */
object Similarity {

  /** Deterministic pseudo-random hyperplanes (nBits × dim), values in
    * [-1, 1], splitmix-scrambled — no RNG state, same planes everywhere. */
  def hyperplanes(dim: Int, nBits: Int): Array[Array[Double]] =
    Array.tabulate(nBits) { p =>
      Array.tabulate(dim) { d =>
        var z = 0x9e3779b97f4a7c15L * (p * 1024 + d + 1)
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        ((z >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
      }
    }

  /** Dot product of a vector column with a constant plane. */
  private def dotConst(v: Column, plane: Array[Double]): Column =
    aggregate(
      zip_with(v, array(plane.map(lit).toIndexedSeq: _*), (x, c) => x * c),
      lit(0.0d), (acc, x) => acc + x)

  /** LSH sign signature: bit p set iff dot(v, plane_p) > 0. One long. */
  def signSignature(v: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.foldLeft(lit(0L)) { case (acc, (plane, p)) =>
      acc.bitwiseOR(when(dotConst(v, plane) > 0, shiftleft(lit(1L), p)).otherwise(0L))
    }

  /** Brute-force cosine top-k: every query (small set, broadcast) against the
    * whole corpus; exact. Returns (query_id, id, cos, rank).
    *
    * The top-k itself is a PARTIAL-AGGREGATING bounded heap (TopK), not a
    * `row_number` window: a window would funnel |corpus| rows per query
    * through |queries| tasks, so even this definitional baseline would die
    * at a 100× corpus. With the heap aggregate, each scan task keeps ≤ k
    * candidates per query and the shuffle carries tasks × |queries| × k
    * structs — the brute-force cost stays the corpus SCAN, as it should. */
  def bruteForceTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int): DataFrame = {
    val joined = corpus
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .crossJoin(broadcast(queries.select(col(qidCol).as("query_id"), col(qvecCol).as("qv"))))
      .filter(col("id") =!= col("query_id"))
      .withColumn("cos", Dedup.cosine(col("v"), col("qv")))
    TopK.topKPerGroup(joined.select(col("query_id"), col("id"), col("cos")),
      "query_id", "id", "cos", k)
  }

  /** LSH-bucketed ANN candidate set, UNRANKED: corpus vectors whose
    * signature is the query's signature or one bit away (multi-probe
    * radius 1). Returns (query_id, id, v, qv) — the vectors ride along so
    * the re-rank stays a single corpus scan. */
  def lshCandidates(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      dim: Int, nBits: Int = 12): DataFrame = {
    val planes = hyperplanes(dim, nBits)
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
      signSignature(col(vecCol), planes).as("sig"))
    // each query probes its own bucket + all single-bit flips
    val probeSigs = array(col("qsig") +:
      (0 until nBits).map(b => col("qsig").bitwiseXOR(lit(1L << b))): _*)
    val q = queries.select(col(qidCol).as("query_id"), col(qvecCol).as("qv"),
      signSignature(col(qvecCol), planes).as("qsig"))
      .withColumn("sig", explode(probeSigs))
    c.join(broadcast(q), Seq("sig"))
      .filter(col("id") =!= col("query_id"))
      .dropDuplicates("query_id", "id")
      .select(col("query_id"), col("id"), col("v"), col("qv"))
  }

  /** Exact cosine top-k re-rank of a (query_id, id, v, qv) candidate set.
    * Candidates are already LSH/IVF-bounded, but the re-rank reuses the same
    * partial-aggregating heap as the brute-force path — no window anywhere
    * in the ANN family. */
  def rerankTopK(cands: DataFrame, k: Int): DataFrame =
    TopK.topKPerGroup(
      cands.withColumn("cos", Dedup.cosine(col("v"), col("qv")))
        .select(col("query_id"), col("id"), col("cos")),
      "query_id", "id", "cos", k)

  /** LSH-bucketed ANN top-k = multi-probe candidates + exact re-rank.
    * Recall < 1 by construction; at scale the bucket join replaces the
    * O(|corpus|·|queries|) scan. */
  def lshTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, dim: Int, nBits: Int = 12): DataFrame =
    rerankTopK(
      lshCandidates(corpus, idCol, vecCol, queries, qidCol, qvecCol, dim, nBits), k)
}
