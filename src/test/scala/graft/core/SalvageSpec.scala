package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** M10 salvage wiring (reference: /root/reference/diary_ocr.py:174-189 —
  * a garbled header falls back to parse_num_id_only and resolves against
  * the existing annuary) + the overflow error-code agreement between
  * parse and parseNumIdOnly. */
class SalvageSpec extends AnyFunSuite {

  private def ctxWith(ids: Set[Int]) = ModuleParser.defaultContext(ids)

  test("post-regex Int overflow is ID_OUT_OF_RANGE in both parse paths") {
    // the reference's unbounded Python int passes the ^[0-9]*$ regex and
    // fails the >MAX_NUM_ID check (annuary_register_parser.py:89-97)
    val big = "99999999999999999999"
    assert(EntityParser.parse(s"AM $big NAME").swap.toOption.get.code
      == ErrorCode.IdOutOfRange)
    assert(EntityParser.parseNumIdOnly(s"AM $big NAME").swap.toOption.get.code
      == ErrorCode.IdOutOfRange)
  }

  test("garbled header with a known numeric id salvages a minimal register") {
    // 'X*' fails the letters-id pattern -> BAD_LETTER_ID; id 123 is known
    val text = "===\n# X* 123 ACOSTA. MIGUEL\n==="
    val ex = Extractor.extract("c0", 0, text, ctxWith(Set(123)))
    assert(ex.errors.exists(_.code == ErrorCode.BadLetterId)) // dead-letter kept
    assert(ex.entities == Vector(EntityRegister(123, "", "", "person", "")))
  }

  test("salvaged community id gets the community kind") {
    val text = "===\n# X* 9100 *SOMEWHERE\n==="
    val ex = Extractor.extract("c0", 0, text, ctxWith(Set(9100)))
    assert(ex.entities == Vector(EntityRegister(9100, "", "", "community", "")))
  }

  test("unknown numeric id does NOT salvage (reference finds no register)") {
    val text = "===\n# X* 777 ACOSTA. MIGUEL\n==="
    val ex = Extractor.extract("c0", 0, text, ctxWith(Set(123)))
    assert(ex.errors.nonEmpty)
    assert(ex.entities.isEmpty)
  }

  test("BAD_NUMERIC_ID headers never attempt salvage (diary_ocr.py:178)") {
    // valid letters id, garbled number -> BAD_NUMERIC_ID; salvage is skipped
    // even though a different token might parse
    val text = "===\n# AM 1X3 ACOSTA. MIGUEL\n==="
    val ex = Extractor.extract("c0", 0, text, ctxWith(Set(123)))
    assert(ex.errors.exists(_.code == ErrorCode.BadNumericId))
    assert(ex.entities.isEmpty)
  }

  test("clean headers are unaffected by the salvage path") {
    val text = "===\n# AM 123 ACOSTA. MIGUEL\n==="
    val ex = Extractor.extract("c0", 0, text, ctxWith(Set(123)))
    assert(ex.errors.isEmpty)
    assert(ex.entities.size == 1 && ex.entities.head.num_id == 123)
    assert(ex.entities.head.text_id == "AM") // real register, not minimal
  }
}
