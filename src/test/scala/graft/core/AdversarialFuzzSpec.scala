package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.fixtures.TranscriptGen

/** Adversarial-input fuzz: a 100 TB transcript corpus WILL contain garbage \u2014
  * binary spill, lone surrogates, control characters, pathological line
  * shapes. The extractor must never throw, must stay deterministic, and its
  * span invariants must hold against the CANONICAL text (spans are
  * coordinates in Normalizer.canonicalize's output). */
class AdversarialFuzzSpec extends AnyFunSuite {

  private val ctx = ModuleParser.defaultContext(TranscriptGen.allEntityIds)

  private def invariants(raw: String): Unit = {
    val ex = Extractor.extract("fuzz", 0, raw, ctx)
    val canon = Normalizer.canonicalize(raw)
    assert(ex == Extractor.extract("fuzz", 0, raw, ctx)) // deterministic
    ex.modules.foreach { m =>
      assert(m.module_str.length <= Tokenizer.ModuleWidth)
      if (m.span_start >= 0) {
        assert(m.span_start < m.span_end && m.span_end <= canon.length)
        val slice = canon.substring(m.span_start, m.span_end)
        assert(slice.replace(" ", "").replace("_", "") ==
          m.module_str.replace("_", ""))
      }
    }
    val c = ex.clean
    if (c.clean_text.nonEmpty) {
      val fromSpans = c.spans.map(s => canon.substring(s.start, s.end))
        .mkString("\n\n")
      assert(fromSpans == c.clean_text)
    }
    assert(ex.blocksKept <= ex.blocksTotal)
  }

  test("hand-built pathological inputs extract without throwing") {
    val nasty = Seq(
      "",
      " ",
      "\n\n\n\n",
      "\r\n\r\n\r",
      "\u0000\u0001\u0002\u0003",
      "\ud800", // lone high surrogate
      "\udc00", // lone low surrogate
      "a\ud800b\udc00c", // interior lone surrogates
      "=" * 10000, // giant separator
      "# ", // bare header marker
      "# \n# \n# ", // header markers only
      "#  A  1  ", // header with trailing spaces
      "A" * 100000, // one huge line
      ("AB " * 40000).trim, // huge tokenizable line (many modules -> cap)
      "===\n" * 5000, // separator flood
      ("# X\n===\n" * 2000), // alternating header/separator flood
      "<a href=http://x>" * 3000, // link flood
      "\t\u00a0\t\u00a0", // canonicalization-only chars
      "\u0080\u0098\u0099", // stripped bytes only
      "D8" + "\u0000" * 8, // module-ish prefix + NULs
      "\ud83d\ude00" * 1000, // astral plane
      (0 until 256).map(_.toChar).mkString, // every latin-1 code unit
      "line1\u000bline2\fline3" // exotic \s members that are NOT \n
    )
    nasty.foreach(invariants)
  }

  test("random garbage: 2000 strings over a hostile alphabet") {
    val rnd = new scala.util.Random(1234)
    val alphabet =
      "AB D01=_ \n\r\t#=-<>http://\u0000\u0080\ud800\udc00\ud83d\ude00\u0430\u0431\u0432\u00e9" // mixed hostile
    for (_ <- 1 to 2000) {
      val len = rnd.nextInt(400)
      val sb = new StringBuilder
      for (_ <- 0 until len) sb += alphabet(rnd.nextInt(alphabet.length))
      invariants(sb.toString)
    }
  }

  test("random structured garbage: corrupted generator turns") {
    val rnd = new scala.util.Random(99)
    for (seed <- 1L to 20L) {
      TranscriptGen.corpus(seed, 2).foreach { t =>
        // random corruption: splice, duplicate, byte-flip regions
        val s = t.text.toCharArray
        for (_ <- 0 until math.max(1, s.length / 50)) {
          val i = rnd.nextInt(s.length)
          s(i) = (s(i) ^ (1 << rnd.nextInt(8))).toChar
        }
        val spliced = new String(s) + "\n" + new String(s).reverse.take(100)
        invariants(spliced)
      }
    }
  }
}
