package graft.core

import org.scalatest.funsuite.AnyFunSuite

class TokenizerSpec extends AnyFunSuite {

  private def rs(line: String): String = Tokenizer.rowString(line, 0).chars

  test("pad quirk: rows shorter than 33 get 11-(len%11) underscores") {
    // len 10 -> +1 (diary_ocr.py:249-253)
    assert(rs("ABCDEFGHIJ") == "ABCDEFGHIJ_")
    // len 21 -> +1
    assert(rs("ABCDEFGHIJ" + "   " + "KLMNOPQRST").length == 22)
  }

  test("pad quirk: len ≡ 0 mod 11 below 33 adds a FULL 11 underscores") {
    // the reference quirk: 11 - (22 % 11) = 11, not 0
    val line = "ABCDEFGHIJK" + "LMNOPQRSTUV" // 22 payload chars, no gaps
    val out = rs(line)
    assert(out.length == 33)
    assert(out.endsWith("_" * 11))
  }

  test("no padding at or above 33") {
    val line = "A" * 33
    assert(rs(line) == "A" * 33)
    assert(rs("A" * 34) == "A" * 34)
  }

  test("gap placeholders use integer division of gap/GapUnit") {
    // gap of 3 spaces -> 3/2 = 1 underscore; 4 -> 2; 5 -> 2; 2 -> none (fuse)
    assert(rs("AB   CD" + "X" * 30).startsWith("AB_CD"))
    assert(rs("AB    CD" + "X" * 30).startsWith("AB__CD"))
    assert(rs("AB     CD" + "X" * 30).startsWith("AB__CD"))
    assert(rs("AB  CD" + "X" * 30).startsWith("ABCD"))
    assert(rs("AB CD" + "X" * 30).startsWith("ABCD"))
  }

  test("slicing: stride 11, keep 10, ceil(len/11) modules") {
    val row = Tokenizer.rowString("ABCDEFGHIJ" + "   " + "KLMNOPQRST" + "   " + "UVWXY=0123", 0)
    assert(row.chars.length == 32 + 1) // 3 modules + 2 separators + 1 pad
    val slices = Tokenizer.sliceRow(row)
    assert(slices.map(_.str) == Vector("ABCDEFGHIJ", "KLMNOPQRST", "UVWXY=0123"))
    // spans point at source offsets of the contributing chars
    assert(slices(0).span == Span(0, 10))
    assert(slices(1).span == Span(13, 23))
    assert(slices(2).span == Span(26, 36))
  }

  test("placeholder-only module has span (-1,-1)") {
    val row = Tokenizer.rowString("ABCDEFGHIJK" + "LMNOPQRSTUV", 0) // pads 11 '_'
    val slices = Tokenizer.sliceRow(row)
    assert(slices.length == 3)
    assert(slices(2).span == Span(-1, -1))
  }

  test("line offsets propagate into spans") {
    val row = Tokenizer.rowString("ABCDEFGHIJ", 100)
    assert(Tokenizer.sliceRow(row).head.span == Span(100, 110))
  }

  test("slicing totality: every length yields ceil(len/11) modules (property)") {
    for (n <- 0 to 200) {
      val line = "A" * n
      val row = Tokenizer.rowString(line, 0)
      val expectLen =
        if (n < Tokenizer.PadBelow) n + (Tokenizer.Stride - n % Tokenizer.Stride)
        else n
      assert(row.chars.length == expectLen)
      val slices = Tokenizer.sliceRow(row)
      assert(slices.length == (expectLen + 10) / 11)
      // slices drop exactly the separator positions (index ≡ 10 mod 11)
      assert(slices.map(_.str.length).sum == expectLen - expectLen / 11)
    }
  }

  test("token groups: runs, fused short gaps, placeholder groups") {
    val gs = Tokenizer.tokenGroups("AB   CD  EF", 0)
    assert(gs == Vector(
      TokenGroup(2, Some(Span(0, 2))),
      TokenGroup(1, None),
      TokenGroup(2, Some(Span(5, 7))),
      TokenGroup(2, Some(Span(9, 11)))))
  }
}
