package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.Golden

/** The north-rule invariant: per-turn extracted text + spans byte-identical
  * against the committed golden fixture, under stable (conv_id, turn_idx)
  * ordering (BASELINE.json → input_hint). Regenerate deliberately with
  * `sbt "runMain graft.tools.GenGolden"` when semantics change on purpose. */
class GoldenSpec extends AnyFunSuite {

  test("extraction output is byte-identical to the committed golden fixture") {
    val expected = scala.io.Source.fromResource("golden_extract.txt").mkString
    val actual = Golden.serialize(Golden.goldenCorpus())
    if (actual != expected) {
      val exp = expected.linesIterator.toVector
      val act = actual.linesIterator.toVector
      val firstDiff = exp.zip(act).indexWhere { case (a, b) => a != b }
      fail(s"golden mismatch: ${exp.length} vs ${act.length} lines; " +
        s"first differing line #$firstDiff:\n  expected: ${exp.lift(firstDiff)}\n" +
        s"  actual:   ${act.lift(firstDiff)}")
    }
  }

  test("golden serialization is itself deterministic") {
    assert(Golden.serialize(Golden.goldenCorpus()) ==
      Golden.serialize(Golden.goldenCorpus()))
  }
}
