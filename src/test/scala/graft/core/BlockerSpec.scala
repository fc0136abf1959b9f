package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.fixtures.TranscriptGen

class BlockerSpec extends AnyFunSuite {

  test("blank lines split blocks; spans track source offsets") {
    val text = "AAAA BBBB\nCCCC\n\nDDDD EEEE"
    val blocks = Blocker.splitBlocks(text)
    assert(blocks.size == 2)
    assert(blocks(0).span == Span(0, 14))
    assert(blocks(1).span == Span(16, 25))
    assert(text.substring(blocks(1).span.start, blocks(1).span.end) == "DDDD EEEE")
  }

  test("nav/footer markup classifies as boilerplate (link density)") {
    val rng = TranscriptGen.rngFor(1, 2, 3, 4)
    val nav = Blocker.blockTree(TranscriptGen.navBlock(rng))
    assert(nav.head.block.kind == BlockKind.Boilerplate)
    val footer = Blocker.blockTree(TranscriptGen.footerBlock(rng))
    assert(footer.head.block.kind == BlockKind.Boilerplate)
  }

  test("prose classifies as Prose (kept as clean text, not tokenized)") {
    val t = Blocker.blockTree("the archive records show a register of events for this person.")
    assert(t.head.block.kind == BlockKind.Prose)
  }

  test("JSON tool output classifies as boilerplate (low text density)") {
    val t = Blocker.blockTree("""{"status": "ok", "items": ["r0", "r1"]}""")
    assert(t.head.block.kind == BlockKind.Boilerplate)
  }

  test("module payload classifies as Content (whitelist charset)") {
    val rng = TranscriptGen.rngFor(9, 9, 9, 9)
    val line = TranscriptGen.contentLine(rng)
    val t = Blocker.blockTree(line)
    assert(t.head.block.kind == BlockKind.Content, line)
  }

  test("header block detected by marker; headerText strips marker + separators") {
    val text = "===\n# AM 123 ACOSTA. MIGUEL\n===\n\nA123456789"
    val t = Blocker.blockTree(text)
    assert(t.head.block.kind == BlockKind.Header)
    assert(Blocker.headerText(t.head) == "AM 123 ACOSTA. MIGUEL")
  }

  test("pure separator block") {
    assert(Blocker.blockTree("===").head.block.kind == BlockKind.Separator)
    assert(Blocker.blockTree("----").head.block.kind == BlockKind.Separator)
  }

  test("tiny blocks drop (MinChars)") {
    assert(Blocker.blockTree("AB").head.block.kind == BlockKind.Boilerplate)
  }

  test("fused classify counts == standalone char-count + linkCharsOf scans") {
    val rnd = new scala.util.Random(23)
    val pieces = Vector("WORD", "a9", "<b>", "<unclosed", "http://x.co/p q",
      "https://y.io", "== =", "# HDR", "_", "<a href=x>t</a>", "plain text here",
      "ht", "h", "<>", "9 9 9")
    (1 to 300).foreach { _ =>
      val text = Seq.fill(rnd.nextInt(8) + 1)(pieces(rnd.nextInt(pieces.length)))
        .mkString(Seq(" ", "\n", "\n\n")(rnd.nextInt(3)))
      Blocker.splitBlocks(text).zipWithIndex.foreach { case (raw, i) =>
        val b = Blocker.classify(raw, i).block
        // independent recomputation with the standalone scans
        var nChars = 0; var alnum = 0; var links = 0
        raw.lineBounds.foreach { lb =>
          val ls = Blocker.lineStart(lb); val le = Blocker.lineEnd(lb)
          nChars += le - ls
          links += Blocker.linkCharsOf(text, ls, le)
          (ls until le).foreach(ci =>
            if (Character.isLetterOrDigit(text.charAt(ci))) alnum += 1)
        }
        assert((b.nChars, b.alnumChars, b.linkChars) == ((nChars, alnum, links)),
          s"text=<$text> block=$i")
      }
    }
  }

  test("fused blockTree == splitBlocks + classify on a whole corpus") {
    val turns = graft.fixtures.TranscriptGen.corpus(
      graft.fixtures.TranscriptGen.DefaultSeed, 40)
    turns.foreach { t =>
      val fused = Blocker.blockTree(t.text)
      val twoPhase = Blocker.splitBlocks(t.text).zipWithIndex
        .map { case (raw, i) => Blocker.classify(raw, i) }
      assert(fused.map(_.block) == twoPhase.map(_.block), t.conv_id)
      assert(fused.map(_.raw.lineBounds.toSeq) == twoPhase.map(_.raw.lineBounds.toSeq))
    }
  }
}

class ExtractorSpec extends AnyFunSuite {

  private val ctx = ModuleParser.defaultContext(TranscriptGen.allEntityIds)

  test("assistant turn extracts modules with correct spans into the raw text") {
    val turn = TranscriptGen.turn(TranscriptGen.DefaultSeed, 60, 5, 1)
    val ex = Extractor.extractTurn(turn, ctx)
    assert(ex.modules.nonEmpty)
    ex.modules.foreach { m =>
      if (m.span_start >= 0) {
        val slice = turn.text.substring(m.span_start, m.span_end)
        // source slice with gaps removed == module payload with gap
        // placeholders removed (literal '_' zone chars drop on both sides)
        assert(slice.replace(" ", "").replace("_", "") ==
          m.module_str.replace("_", ""),
          s"span mismatch: '$slice' vs '${m.module_str}'")
      }
    }
  }

  test("first assistant turn yields the conversation's entity register") {
    val turn = TranscriptGen.turn(TranscriptGen.DefaultSeed, 60, 7, 1)
    val ex = Extractor.extractTurn(turn, ctx)
    assert(ex.entities.nonEmpty)
    assert(ex.entities.head.num_id == TranscriptGen.convEntity(7))
  }

  test("user prose turn yields clean text and no modules") {
    val turn = TranscriptGen.turn(TranscriptGen.DefaultSeed, 60, 5, 0)
    val ex = Extractor.extractTurn(turn, ctx)
    assert(ex.modules.isEmpty)
    assert(ex.clean.clean_text.nonEmpty)
    // clean-text spans reconstruct the text from the raw turn
    val fromSpans = ex.clean.spans
      .map(s => turn.text.substring(s.start, s.end)).mkString("\n\n")
    assert(fromSpans == ex.clean.clean_text)
  }

  test("tool turn: JSON dropped entirely") {
    val turn = TranscriptGen.turn(TranscriptGen.DefaultSeed, 60, 5, 2)
    val ex = Extractor.extractTurn(turn, ctx)
    assert(ex.modules.isEmpty)
    assert(ex.clean.clean_text.isEmpty)
  }

  test("extraction is deterministic (same turn twice)") {
    val turn = TranscriptGen.turn(TranscriptGen.DefaultSeed, 60, 11, 4)
    assert(Extractor.extractTurn(turn, ctx) == Extractor.extractTurn(turn, ctx))
  }

  test("corpus-wide: error rows produce dead-letter rows, not lost rows") {
    val turns = TranscriptGen.corpus(TranscriptGen.DefaultSeed, 20)
    val exs = turns.map(t => Extractor.extractTurn(t, ctx))
    val errs = exs.flatMap(_.errors)
    assert(errs.nonEmpty)
    // every error carries a usable code from the enum
    val codes = Set(ErrorCode.InsufficientTokens, ErrorCode.BadLetterId,
      ErrorCode.BadNumericId, ErrorCode.IdOutOfRange, ErrorCode.InvalidName,
      ErrorCode.ModulesNumberExceeded, ErrorCode.ModuleTypeNotRecognized,
      ErrorCode.BadZoneString, ErrorCode.BadYear, ErrorCode.InvalidValueOnZone,
      ErrorCode.BadNumId, ErrorCode.NoEntityRegister)
    errs.foreach(e => assert(codes.contains(e.code)))
  }
}
