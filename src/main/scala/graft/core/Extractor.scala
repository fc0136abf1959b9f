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

  def extractTurn(turn: Turn, ctx: ModuleParser.Context): TurnExtraction =
    extract(turn.conv_id, turn.turn_idx, turn.text, ctx)

  /** Column-pruned form: extraction reads only (conv_id, turn_idx, text) —
    * the Spark pipeline projects before the scan so role/tool/ts are never
    * decoded. */
  def extract(convId: String, turnIdx: Int, text0: String,
      ctx: ModuleParser.Context): TurnExtraction =
    extract(convId, turnIdx, text0, ctx, new Tokenizer.Scratch)

  /** Scratch-buffer form for hot partition loops: pass one thread-confined
    * Scratch per mapPartitions invocation; buffers are reused across turns. */
  def extract(convId: String, turnIdx: Int, text0: String,
      ctx: ModuleParser.Context, scratch: Tokenizer.Scratch): TurnExtraction = {
    // canonicalize first (the deskew/binarize analog): all downstream span
    // offsets are coordinates in the canonical text
    val text = Normalizer.canonicalize(text0)
    val turn = Turn(convId, turnIdx, null, text, null, null)
    val blocks = Blocker.blockTree(turn.text, scratch)

    val modules = Vector.newBuilder[ExtractedModule]
    val entities = Vector.newBuilder[EntityRegister]
    val errors = Vector.newBuilder[ExtractionError]
    // clean text assembles in ONE buffer (no per-block substring + mkString
    // double copy — prose dominates transcript bytes, so the saved copy is
    // the largest per-turn allocation after the output rows)
    var proseBuf: java.lang.StringBuilder = null
    val proseSpans = Vector.newBuilder[Span]
    var blocksKept = 0
    var rowsTokenized = 0

    blocks.foreach { cb =>
      val b = cb.block
      b.kind match {
        case BlockKind.Header =>
          blocksKept += 1
          val headerStr = Blocker.headerText(cb)
          EntityParser.parse(headerStr) match {
            case Right(reg) => entities += reg
            case Left(f) =>
              errors += ExtractionError(
                turn.conv_id, turn.turn_idx, b.ordinal, -1, -1,
                f.code, -1, f.detail, headerStr)
              // M10 salvage (diary_ocr.py:174-189): a garbled header that
              // still yields a numeric id resolving against the known entity
              // universe produces a minimal fixable register (empty
              // text_id/name marks it salvaged; dedup prefers real registers)
              // alongside the dead-letter row. BAD_NUMERIC_ID is excluded,
              // as in the reference.
              if (f.code != ErrorCode.BadNumericId) {
                EntityParser.parseNumIdOnly(headerStr) match {
                  case Right(id) if ctx.entityIds(id) =>
                    entities += EntityRegister(id, "", "",
                      if (id < EntityParser.CommunityStartId) "person"
                      else "community", "")
                  case _ => // unsalvageable: dead-letter row already emitted
                }
              }
          }

        case BlockKind.Content =>
          blocksKept += 1
          var rowOrdinal = 0
          val text = turn.text
          cb.raw.lineBounds.foreach { lb =>
            val ls = Blocker.lineStart(lb)
            val le = Blocker.lineEnd(lb)
            var payloadChars = 0
            var ci = ls
            while (ci < le) { if (text.charAt(ci) != ' ') payloadChars += 1; ci += 1 }
            if (payloadChars >= Tokenizer.MinRowChars &&
                !Blocker.isSeparatorRange(text, ls, le)) {
              rowsTokenized += 1
              // low-level fill: module strings/spans read straight from the
              // scratch buffers — no ModuleSlice/Span/Vector per row
              val rowLen = Tokenizer.fillRow(text, ls, le, ls, scratch)
              val numModules = Tokenizer.moduleCount(rowLen)
              if (numModules > ModuleParser.MaxModulesPerRow) {
                // Row cap — diary_module_parser.py:122-124.
                errors += ExtractionError(
                  turn.conv_id, turn.turn_idx, b.ordinal, rowOrdinal, -1,
                  ErrorCode.ModulesNumberExceeded, -1, numModules.toString,
                  text.substring(ls, le))
              } else {
                var m = 0
                while (m < numModules) {
                  val str = Tokenizer.moduleStr(scratch, m, rowLen)
                  ModuleParser.parseModule(m, str, ctx) match {
                    case Right(pm) =>
                      val span = Tokenizer.moduleSpanPacked(scratch, m, rowLen)
                      modules += ExtractedModule(
                        turn.conv_id, turn.turn_idx, b.ordinal, rowOrdinal,
                        m, pm.moduleType, pm.zones, str,
                        Blocker.lineStart(span), Blocker.lineEnd(span))
                    case Left(e) =>
                      errors += ExtractionError(
                        turn.conv_id, turn.turn_idx, b.ordinal, rowOrdinal,
                        m, e.code, e.catalogId, e.zoneStr, str)
                  }
                  m += 1
                }
              }
              rowOrdinal += 1
            }
          }

        case BlockKind.Prose =>
          blocksKept += 1
          // block lines are contiguous (single '\n' separators), so the raw
          // span slice equals the lines joined by '\n'
          if (proseBuf == null) proseBuf = new java.lang.StringBuilder(b.span.length)
          else proseBuf.append("\n\n")
          proseBuf.append(turn.text, b.span.start, b.span.end)
          proseSpans += b.span

        case _ => // separator / boilerplate: dropped
      }
    }

    val clean = CleanTurn(
      turn.conv_id, turn.turn_idx,
      if (proseBuf == null) "" else proseBuf.toString, proseSpans.result(),
      n_blocks_total = blocks.length, n_blocks_kept = blocksKept)

    TurnExtraction(
      modules.result(), entities.result(), errors.result(), clean,
      blocksTotal = blocks.length, blocksKept = blocksKept,
      rowsTokenized = rowsTokenized)
  }
}
