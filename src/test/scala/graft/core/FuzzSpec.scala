package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.fixtures.TranscriptGen

/** Multi-seed fuzzing of the extraction core: for many generator seeds, the
  * invariants that must hold for EVERY input, not just the golden corpus. */
class FuzzSpec extends AnyFunSuite {

  private val ctx = ModuleParser.defaultContext(TranscriptGen.allEntityIds)

  test("invariants hold across 40 generator seeds") {
    for (seed <- 1L to 40L) {
      val turns = TranscriptGen.corpus(seed, 3)
      turns.foreach { t =>
        val ex = Extractor.extractTurn(t, ctx)
        // determinism
        assert(ex == Extractor.extractTurn(t, ctx))
        // spans are within the turn text and half-open
        ex.modules.foreach { m =>
          if (m.span_start >= 0) {
            assert(m.span_start < m.span_end)
            assert(m.span_end <= t.text.length)
            // span content reproduces the module payload modulo gaps/pads
            val slice = t.text.substring(m.span_start, m.span_end)
            assert(slice.replace(" ", "").replace("_", "") ==
              m.module_str.replace("_", ""))
          }
          // module strings are exactly the slicer width or shorter (tail)
          assert(m.module_str.length <= Tokenizer.ModuleWidth)
          // zones count matches the grammar
          assert(m.zones.size == Grammar.moduleZones(m.module_type).size)
        }
        // clean-text spans reconstruct clean_text exactly
        val c = ex.clean
        if (c.clean_text.nonEmpty) {
          val fromSpans = c.spans.map(s => t.text.substring(s.start, s.end))
            .mkString("\n\n")
          assert(fromSpans == c.clean_text)
        }
        // blocks accounting
        assert(ex.blocksKept <= ex.blocksTotal)
        // errors carry valid ordinals
        ex.errors.foreach { e =>
          assert(e.block_ordinal >= -1 && e.row_ordinal >= -1)
        }
      }
    }
  }

  test("module slicing round-trip: zones re-concatenate into the module") {
    // For modules whose zones are all passthrough-or-hit (no confusion fix
    // applied), type + zones joined must equal the module string.
    for (seed <- 1L to 10L) {
      val turns = TranscriptGen.corpus(seed, 2)
      turns.flatMap(t => Extractor.extractTurn(t, ctx).modules).foreach { m =>
        val rejoined = m.module_type + m.zones.mkString("")
        // confusion fixes may rewrite chars, but length structure must agree
        assert(rejoined.length == m.module_str.length ||
          m.module_str.length < 10, // short tail module
          s"${m.module_str} vs $rejoined")
      }
    }
  }
}
