package graft.core

import org.scalatest.funsuite.AnyFunSuite

class NormalizerSpec extends AnyFunSuite {

  test("already-canonical text is returned as the same object (fast path)") {
    val s = "plain text\nwith lines"
    assert(Normalizer.canonicalize(s) eq s)
  }

  test("CRLF and bare CR fold to LF") {
    assert(Normalizer.canonicalize("a\r\nb\rc") == "a\nb\nc")
  }

  test("tabs and NBSP become spaces; stray high bytes drop") {
    assert(Normalizer.canonicalize("a\tb\u00A0c") == "a b c")
    assert(Normalizer.canonicalize("a\u0080b\u0098c\u0099d") == "abcd")
  }

  test("idempotent") {
    val messy = "x\r\ny\tz\u0080"
    val once = Normalizer.canonicalize(messy)
    assert(Normalizer.canonicalize(once) == once)
  }
}
