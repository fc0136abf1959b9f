package graft.tools

/** Prints the FNV-1a fingerprint of the full generated corpus for pinned
  * nConvs values — used to pin TranscriptGen's byte-identity across
  * refactors (the r06 generator micro-optimization). */
object GenFingerprint {
  def fnv(s: String, h0: Long): Long = {
    var h = h0
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    h
  }
  def fingerprint(nConvs: Int): Long = {
    var h = 0xcbf29ce484222325L
    graft.fixtures.TranscriptGen.corpus(42L, nConvs).foreach { t =>
      h = fnv(t.conv_id, h)
      h = fnv(t.turn_idx.toString, h)
      h = fnv(t.role, h)
      h = fnv(if (t.tool == null) " " else t.tool, h)
      h = fnv(t.ts.toString, h)
      h = fnv(t.text, h)
      h *= 0x9e3779b97f4a7c15L
    }
    h
  }
  def main(args: Array[String]): Unit = {
    Seq(5, 60, 150).foreach { n =>
      println(s"[genfp] nConvs=$n fp=${fingerprint(n)}L")
    }
  }
}
