package graft.operators

/** Partition-local hash kernels for the near-dup detectors.
  *
  * These run inside typed mapPartitions: one pass per document, primitive
  * arrays, no per-permutation re-evaluation — the Column-expression form of
  * MinHash re-evaluates the shingle/hash chain once per permutation because
  * Catalyst inlines collapsed projections (measured 70× slower at sf0.01).
  * The signature math itself is tiny; the win is computing the shingle
  * hashes exactly once.
  */
object HashCore {

  /** Stable 64-bit string hash (splitmix-scrambled FNV-1a) — deterministic
    * across JVMs and partitions. */
  def hash64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i)
      h *= 0x100000001b3L
      i += 1
    }
    h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
    h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  val P: Long = 2147483647L // 2^31 - 1

  /** Deterministic affine permutation coefficients (same family as
    * Dedup.perm). */
  def perm(i: Int): (Long, Long) = {
    var z = 0x9e3779b97f4a7c15L * (i + 1)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    val a = math.abs(z % (P - 1)) + 1
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    val b = math.abs(z % P)
    (a, b)
  }

  /** Distinct word-k-gram shingle hashes of a text (31-bit domain). */
  def shingleHashes(text: String, k: Int): Array[Long] = {
    val words = text.trim.split("\\s+")
    val set = new java.util.HashSet[Long]()
    if (words.length < k) {
      val h = hash64(words.mkString(" "))
      set.add(((h % P) + P) % P)
    } else {
      var i = 0
      val sb = new java.lang.StringBuilder
      while (i + k <= words.length) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j)); j += 1
        }
        val h = hash64(sb.toString)
        set.add(((h % P) + P) % P)
        i += 1
      }
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var n = 0
    while (it.hasNext) { out(n) = it.next(); n += 1 }
    out
  }

  /** Distinct word-k-gram shingles as STRINGS (first-occurrence order) —
    * the typed twin of array_distinct(TextStats.shinglesCol(text, k)),
    * differential-locked in HashCoreSpec. Exists because the Column form
    * re-evaluates the whole shingling chain per EXPLODED row once
    * projection collapse inlines it under a Generate (measured 13× slower
    * building shingle postings at bench scale). */
  def shingleStrings(text: String, k: Int): Array[String] = {
    val words = text.trim.split("\\s+")
    val set = new java.util.LinkedHashSet[String]()
    if (words.length < k) set.add(words.mkString(" "))
    else {
      var i = 0
      val sb = new java.lang.StringBuilder
      while (i + k <= words.length) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j)); j += 1
        }
        set.add(sb.toString)
        i += 1
      }
    }
    set.toArray(new Array[String](set.size))
  }

  /** x mod P for P = 2^31 - 1 (Mersenne): two shift-add folds + one
    * conditional subtract instead of a 64-bit division. Identical to x % P
    * for any x in [0, 2^62) — property-locked against `%` in HashCoreSpec.
    * The signature kernel runs docs × shingles × k of these; the division
    * was the kernel's hottest instruction. */
  @inline def modP(x: Long): Long = {
    var v = (x & P) + (x >>> 31) // < 2^32
    v = (v & P) + (v >>> 31) // < P + 2
    if (v >= P) v - P else v
  }

  /** k-permutation MinHash signature — one pass over the shingle hashes. */
  def minhashSignature(hashes: Array[Long], k: Int): Array[Long] = {
    val as = new Array[Long](k)
    val bs = new Array[Long](k)
    var i = 0
    while (i < k) { val (a, b) = perm(i); as(i) = a; bs(i) = b; i += 1 }
    val sig = Array.fill(k)(Long.MaxValue)
    var s = 0
    while (s < hashes.length) {
      val h = hashes(s)
      var p = 0
      while (p < k) {
        // a < P, h < P ⇒ a*h < 2^62 and a*h + b < 2^62: modP applies
        val v = modP(as(p) * h + bs(p))
        if (v < sig(p)) sig(p) = v
        p += 1
      }
      s += 1
    }
    sig
  }

  /** Band keys: hash of each band's slice of the signature. */
  def bandKeys(sig: Array[Long], bands: Int): Array[Long] = {
    val rows = sig.length / bands
    Array.tabulate(bands) { b =>
      var h = 0xcbf29ce484222325L ^ b
      var r = 0
      while (r < rows) {
        h ^= sig(b * rows + r)
        h *= 0x100000001b3L
        r += 1
      }
      h
    }
  }

  /** 64-bit SimHash over whitespace tokens — one pass. */
  def simhash(text: String): Long = {
    val counts = new Array[Int](64)
    val words = text.trim.split("\\s+")
    var i = 0
    while (i < words.length) {
      val h = hash64(words(i))
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  /** Exact Jaccard of two distinct-hash arrays. */
  def jaccard(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty && b.isEmpty) return 0.0
    val sa = new java.util.HashSet[Long]()
    a.foreach(sa.add)
    var inter = 0
    val sb = new java.util.HashSet[Long]()
    b.foreach { x => if (sb.add(x) && sa.contains(x)) inter += 1 }
    val union = sa.size + sb.size - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }
}
