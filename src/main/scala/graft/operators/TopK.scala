package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Partial-aggregating exact top-k — the scale-safe replacement for
  * `row_number().over(partitionBy(group))` when the per-group input is
  * row-scaled (the q44 class of plans).
  *
  * A window funnels EVERY candidate row of a group through the single task
  * that owns the group: for brute-force ANN that is |corpus| rows per query
  * into |queries| tasks — correct, but the one shape that cannot survive a
  * 100× corpus. This aggregator keeps a k-bounded binary heap per group
  * INSIDE each map task (ObjectHashAggregate partial mode), so the shuffle
  * carries at most tasks × groups × k tiny structs and the final merge is
  * O(k log k) per group. Exactness is unchanged: a global top-k is the merge
  * of per-partition top-ks.
  *
  * Ordering is (score DESC, id ASC) — ties broken by id exactly like the
  * `row_number` form and the DuckDB oracle, so results are bit-identical.
  */
object TopK {

  /** Bounded top-k heap state: a binary min-heap of size ≤ k whose root is
    * the WORST retained element under (score desc, id asc) — eviction
    * compares candidates against the root only. Mutable and reused across
    * rows of a group (ObjectHashAggregate keeps it on-heap; kryo handles the
    * partial-shuffle / spill serialization). */
  final class State(val k: Int) extends Serializable {
    var size: Int = 0
    var score: Array[Double] = new Array[Double](k)
    var id: Array[Long] = new Array[Long](k)

    // a is WORSE than b (evicted earlier): lower score, then HIGHER id
    @inline private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean =
      sa < sb || (sa == sb && ia > ib)

    private def siftDown(i0: Int): Unit = {
      var i = i0
      while (true) {
        val l = 2 * i + 1
        val r = l + 1
        var w = i
        if (l < size && worse(score(l), id(l), score(w), id(w))) w = l
        if (r < size && worse(score(r), id(r), score(w), id(w))) w = r
        if (w == i) return
        val ts = score(i); score(i) = score(w); score(w) = ts
        val ti = id(i); id(i) = id(w); id(w) = ti
        i = w
      }
    }

    private def siftUp(i0: Int): Unit = {
      var i = i0
      while (i > 0) {
        val p = (i - 1) / 2
        if (!worse(score(i), id(i), score(p), id(p))) return
        val ts = score(i); score(i) = score(p); score(p) = ts
        val ti = id(i); id(i) = id(p); id(p) = ti
        i = p
      }
    }

    def insert(s: Double, i: Long): Unit =
      // NaN never orders under worse(): admitted while size<k it could sit at
      // the root and veto every later insertion. Skip it — a NaN score is
      // "no score", never a top-k member.
      if (s != s) ()
      else if (size < k) {
        score(size) = s; id(size) = i; size += 1
        siftUp(size - 1)
      } else if (size > 0 && worse(score(0), id(0), s, i)) {
        score(0) = s; id(0) = i
        siftDown(0)
      }

    def mergeFrom(o: State): State = {
      var j = 0
      while (j < o.size) { insert(o.score(j), o.id(j)); j += 1 }
      this
    }

    /** Elements ordered best-first: (id, score) with rank = index + 1. */
    def sorted: Seq[Hit] = {
      val idx = (0 until size).sortBy(j => (-score(j), id(j)))
      idx.map(j => Hit(id(j), score(j)))
    }
  }

  final case class Hit(id: Long, score: Double)

  final case class In(score: Double, id: Long)

  /** The Aggregator: IN = (score, id), BUF = bounded heap, OUT = best-first
    * hits. Registered through `functions.udaf`, which lowers it to a
    * TypedImperativeAggregate — partial per-partition heaps, merged after a
    * k-bounded shuffle. */
  final class TopKAgg(k: Int) extends Aggregator[In, State, Seq[Hit]] {
    def zero: State = new State(k)
    def reduce(b: State, a: In): State = { b.insert(a.score, a.id); b }
    def merge(b1: State, b2: State): State = b1.mergeFrom(b2)
    def finish(r: State): Seq[Hit] = r.sorted
    def bufferEncoder: Encoder[State] = Encoders.kryo[State]
    def outputEncoder: Encoder[Seq[Hit]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Hit]]()
  }

  /** Exact top-k per group over (groupCol, idCol, scoreCol) rows. Output:
    * (group, id, score, rank) with rank 1..k by (score desc, id asc). */
  def topKPerGroup(df: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, k: Int): DataFrame = {
    val agg = udaf(new TopKAgg(k))
    df.groupBy(col(groupCol))
      .agg(agg(col(scoreCol), col(idCol)).as("hits"))
      .select(col(groupCol), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col(groupCol), col("hit.id").as(idCol),
        col("hit.score").as(scoreCol),
        (col("pos") + 1).cast("long").as("rank"))
  }
}
