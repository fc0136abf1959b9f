package graft.core

import org.scalatest.funsuite.AnyFunSuite

class GrammarSpec extends AnyFunSuite {

  test("grammar has the full 47-type inventory") {
    assert(Grammar.moduleZones.size == 47)
  }

  test("every module type's zones fill exactly 10 chars with the type prefix") {
    Grammar.moduleZones.foreach { case (t, zones) =>
      assert(t.length + zones.map(_._2).sum == 10, s"type $t")
    }
  }

  test("prefix rewrites incl. dead-rule quirks (diary_module_parser.py:185-201)") {
    assert(Grammar.rewritePrefix("8A1234").startsWith("BA"))
    assert(Grammar.rewritePrefix("OX").startsWith("DX"))
    assert(Grammar.rewritePrefix("0X").startsWith("DX"))
    assert(Grammar.rewritePrefix("B1xx") == "BIxx")
    // dead rules: '8'→'B' fires first, so '88'→'BB' can never apply;
    // 'O'/'0'→'D' fires first, so '05'/'O5'→'DS' can never apply.
    assert(Grammar.rewritePrefix("88xx") == "B8xx")
    assert(Grammar.rewritePrefix("05xx") == "D5xx")
    assert(Grammar.rewritePrefix("O5xx") == "D5xx")
    assert(Grammar.rewritePrefix("55xx") == "SSxx")
  }

  test("type match uses rewritten prefix, unknown stays None") {
    assert(Grammar.moduleType("8A1234....").contains("BA"))
    assert(Grammar.moduleType("A123456789").contains("A"))
    assert(Grammar.moduleType("=123456789").contains("="))
    assert(Grammar.moduleType("??????????").isEmpty)
    assert(Grammar.moduleType("__________").isEmpty)
    // "55..." rewrites to "SS..." which prefix-matches type "S"
    assert(Grammar.moduleType("55xxxxxxxx").contains("S"))
    // "05..." rewrites to "DS..." which prefix-matches type "D"
    assert(Grammar.moduleType("05xxxxxxxx").contains("D"))
  }

  test("digit-catalog confusion fix: O Z S G T -> 0 2 5 6 7") {
    assert(Grammar.fixKnownIssues(2, "OZSGT") == "02567")
    assert(Grammar.fixKnownIssues(40, "O1") == "01")
  }

  test("alpha-catalog confusion fix: 2 6 8 0 1 -> Z G B O I") {
    assert(Grammar.fixKnownIssues(29, "26801") == "ZGBOI")
    assert(Grammar.fixKnownIssues(31, "1") == "I")
    assert(Grammar.fixKnownIssues(39, "8") == "B")
  }

  test("catalog 3: char fixes then bigram fixes; '5O' maps to '50'") {
    assert(Grammar.fixKnownIssues(3, "NE") == "ME")
    assert(Grammar.fixKnownIssues(3, "8C") == "BC")
    assert(Grammar.fixKnownIssues(3, "5O") == "50") // last-wins duplicate key
    assert(Grammar.fixKnownIssues(3, "0X") == "OX") // char fix 0->O
    assert(Grammar.fixKnownIssues(3, "1X") == "IX")
    assert(Grammar.fixKnownIssues(3, "0R") == "QR") // char fix feeds bigram
  }

  test("catalogs without a fix map pass through") {
    assert(Grammar.fixKnownIssues(30, "8") == "8")
    assert(Grammar.fixKnownIssues(41, "O7") == "O7")
  }

  test("year fix: O S I G -> 0 5 1 6") {
    assert(Grammar.fixYear("OSIG") == "0516")
  }

  test("entity-id fix: _ O -> 0") {
    assert(Grammar.fixEntityId("_O1") == "001")
  }
}

class CatalogsSpec extends AnyFunSuite {

  test("all 35 catalogs synthesized with correct key widths") {
    assert(Catalogs.descriptions.size == 35)
    Catalogs.descriptions.foreach { case (id, (_, width)) =>
      val ks = Catalogs.keys(id)
      assert(ks.nonEmpty, s"catalog $id")
      assert(ks.forall(_.length == width), s"catalog $id widths")
    }
  }

  test("every key is a fixed point of its confusion map") {
    Catalogs.keys.foreach { case (id, ks) =>
      ks.foreach(k => assert(Grammar.fixKnownIssues(id, k) == k, s"cat $id key $k"))
    }
  }

  test("missKey misses and is a fixed point") {
    Catalogs.descriptions.keys.foreach { id =>
      val mk = Catalogs.missKey(id)
      assert(Catalogs.lookup(id, mk).isEmpty, s"cat $id")
      assert(Grammar.fixKnownIssues(id, mk) == mk, s"cat $id")
    }
  }

  test("lookups hit for every synthesized key") {
    Catalogs.keys.foreach { case (id, ks) =>
      ks.foreach(k => assert(Catalogs.lookup(id, k).isDefined))
    }
  }

  test("moduleTypeOrNull == rewritePrefix+startsWith reference (virtual prefix diff)") {
    // the hot path simulates the prefix rewrite in char registers; this
    // differential pins it to the string form over the full confusion
    // alphabet, all lengths 0..6
    val reference = Grammar.moduleZones.keys.toArray.sortBy(t => (-t.length, t))
    def expected(s: String): String =
      reference.find(Grammar.rewritePrefix(s).startsWith(_)).orNull
    val alphabet = "8O05B1ISDXAZ_"
    val rnd = new scala.util.Random(99)
    var checked = 0
    for (_ <- 0 until 4000) {
      val s = Seq.fill(rnd.nextInt(7))(alphabet(rnd.nextInt(alphabet.length))).mkString
      assert(Grammar.moduleTypeOrNull(s) == expected(s), s"input '$s'")
      checked += 1
    }
    // exhaustive over all 2-char strings of the alphabet (the rewrite zone)
    for (a <- alphabet; b <- alphabet) {
      val s = s"$a$b"
      assert(Grammar.moduleTypeOrNull(s) == expected(s), s"input '$s'")
    }
    assert(Grammar.moduleTypeOrNull("") == null)
  }
}
