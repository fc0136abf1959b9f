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
    * [-1, 1], splitmix-scrambled — no RNG state, same planes everywhere.
    * `planeOffset` selects an independent plane block (hash table t uses
    * offset t*nBits). */
  def hyperplanes(dim: Int, nBits: Int, planeOffset: Int = 0): Array[Array[Double]] =
    Array.tabulate(nBits) { p0 =>
      val p = p0 + planeOffset
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

  /** LSH-bucketed ANN candidate set, UNRANKED: corpus vectors that share a
    * bucket with the query in ANY of `nTables` independent hash tables,
    * probing the query's own bucket + all single-bit flips (multi-probe
    * radius 1) per table. Returns (query_id, id, v, qv) — the vectors ride
    * along so the re-rank stays a single corpus scan.
    *
    * SIZING RULE (documented for the q45 call site): if a true neighbor
    * disagrees with the query on each plane with probability p (p = θ/π for
    * angle θ), one table at radius 1 recalls r₁ = (1-p)^n + n·p·(1-p)^(n-1);
    * L independent tables recall 1-(1-r₁)^L. Pick nBits from the corpus
    * size (buckets ≈ |corpus| / desired bucket occupancy) and then L to hit
    * the recall target. Clustered production embeddings (p ≈ 0.15–0.25)
    * need L = 2–4 even at nBits 16+; the bench corpus is near-isotropic
    * (top-10 neighbors at cos ≈ 0.3 → p ≈ 0.40), the adversarial case,
    * needing L ≈ 10 at nBits = 6. Index cost scales linearly with L — the
    * classic multi-table trade (Indyk & Motwani 1998; MMDS ch.3). */
  def lshCandidates(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      dim: Int, nBits: Int = 12, nTables: Int = 1): DataFrame = {
    val tables = (0 until nTables).map(t => hyperplanes(dim, nBits, t * nBits))
    // corpus side: one (table, sig) row per table — the L-table index
    val sigs = array(tables.map(p => signSignature(col(vecCol), p)): _*)
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
        posexplode(sigs).as(Seq("table", "sig")))
    // query side: per table, own bucket + all single-bit flips
    val q = queries.select(col(qidCol).as("query_id"), col(qvecCol).as("qv"),
        posexplode(array(tables.map(p => signSignature(col(qvecCol), p)): _*))
          .as(Seq("table", "qsig")))
      .withColumn("sig", explode(array(col("qsig") +:
        (0 until nBits).map(b => col("qsig").bitwiseXOR(lit(1L << b))): _*)))
    c.join(broadcast(q), Seq("table", "sig"))
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
      k: Int, dim: Int, nBits: Int = 12, nTables: Int = 1): DataFrame =
    rerankTopK(
      lshCandidates(corpus, idCol, vecCol, queries, qidCol, qvecCol,
        dim, nBits, nTables), k)
}
