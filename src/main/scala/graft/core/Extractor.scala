package graft.core

/** Per-turn extraction: the partition-local core the Spark pipeline maps over.
  *
  * Mirrors the reference's page lifecycle
  * (/root/reference/diary_ocr.py:35-108: segment columns → blocks →
  * header resolve → content rows → modules → parse → dedup-append) collapsed
  * to one pure function Turn → TurnExtraction. Everything here is
  * deterministic and partition-local; cross-turn concerns (dedup, ordering,
  * entity merge, resume) live in the Spark pipeline.
  */
object Extractor {

  def extractTurn(turn: Turn, ctx: ModuleParser.Context): TurnExtraction = {
    val blocks = Blocker.blockTree(turn.text)

    val modules = Vector.newBuilder[ExtractedModule]
    val entities = Vector.newBuilder[EntityRegister]
    val errors = Vector.newBuilder[ExtractionError]
    val proseTexts = Vector.newBuilder[String]
    val proseSpans = Vector.newBuilder[Span]
    var blocksKept = 0
    var rowsTokenized = 0

    blocks.foreach { cb =>
      val b = cb.block
      b.kind match {
        case BlockKind.Header =>
          blocksKept += 1
          EntityParser.parse(Blocker.headerText(cb)) match {
            case Right(reg) => entities += reg
            case Left(f) =>
              errors += ExtractionError(
                turn.conv_id, turn.turn_idx, b.ordinal, -1, -1,
                f.code, -1, f.detail, Blocker.headerText(cb))
          }

        case BlockKind.Content =>
          blocksKept += 1
          var rowOrdinal = 0
          cb.lines.foreach { case (line, lineStart) =>
            val payloadChars = line.count(_ != ' ')
            if (payloadChars >= Tokenizer.MinRowChars && !Blocker.isSeparator(line)) {
              rowsTokenized += 1
              val row = Tokenizer.rowString(line, lineStart)
              val slices = Tokenizer.sliceRow(row)
              if (slices.length > ModuleParser.MaxModulesPerRow) {
                // Row cap — diary_module_parser.py:122-124.
                errors += ExtractionError(
                  turn.conv_id, turn.turn_idx, b.ordinal, rowOrdinal, -1,
                  ErrorCode.ModulesNumberExceeded, -1, slices.length.toString, line)
              } else {
                slices.foreach { s =>
                  ModuleParser.parseModule(s.ordinal, s.str, ctx) match {
                    case Right(pm) =>
                      modules += ExtractedModule(
                        turn.conv_id, turn.turn_idx, b.ordinal, rowOrdinal,
                        s.ordinal, pm.moduleType, pm.zones, s.str,
                        s.span.start, s.span.end)
                    case Left(e) =>
                      errors += ExtractionError(
                        turn.conv_id, turn.turn_idx, b.ordinal, rowOrdinal,
                        s.ordinal, e.code, e.catalogId, e.zoneStr, s.str)
                  }
                }
              }
              rowOrdinal += 1
            }
          }

        case BlockKind.Prose =>
          blocksKept += 1
          proseTexts += cb.lines.map(_._1).mkString("\n")
          proseSpans += b.span

        case _ => // separator / boilerplate: dropped
      }
    }

    val clean = CleanTurn(
      turn.conv_id, turn.turn_idx,
      proseTexts.result().mkString("\n\n"), proseSpans.result(),
      n_blocks_total = blocks.length, n_blocks_kept = blocksKept)

    TurnExtraction(
      modules.result(), entities.result(), errors.result(), clean,
      blocksTotal = blocks.length, blocksKept = blocksKept,
      rowsTokenized = rowsTokenized)
  }
}
