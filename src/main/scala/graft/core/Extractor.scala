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
    // flat block tree: kinds/spans/line-ranges live in scratch parallel
    // arrays (block ordinal == index) — no per-block objects on this path
    val nBlocks = Blocker.blockTreeInto(text, scratch)
    val lineAll = scratch.lineAll

    // builders are LAZY: most turns have no entities and no errors, and
    // prose-only turns have no modules — four eager builders per turn were
    // measurable allocation (BENCH/BASELINE.md §3)
    var modules: scala.collection.immutable.VectorBuilder[ExtractedModule] = null
    var entities: scala.collection.immutable.VectorBuilder[EntityRegister] = null
    var errors: scala.collection.immutable.VectorBuilder[ExtractionError] = null
    // clean text assembles in ONE buffer (no per-block substring + mkString
    // double copy — prose dominates transcript bytes, so the saved copy is
    // the largest per-turn allocation after the output rows)
    var proseBuf: java.lang.StringBuilder = null
    var proseSpans: scala.collection.immutable.VectorBuilder[Span] = null
    var blocksKept = 0
    var rowsTokenized = 0

    // index loops, not foreach: closures over the mutable locals above would
    // lift every var into a heap Ref and allocate a closure per turn
    var bi = 0
    while (bi < nBlocks) {
      val bKind = scratch.bKind(bi)
      val bLineLo = scratch.bLineLo(bi)
      val bLineHi = scratch.bLineHi(bi)
      bKind match {
        case Blocker.KindHeader =>
          blocksKept += 1
          val headerStr = Blocker.headerTextFlat(text, lineAll, bLineLo, bLineHi)
          EntityParser.parse(headerStr) match {
            case Right(reg) =>
              if (entities == null)
                entities = new scala.collection.immutable.VectorBuilder[EntityRegister]
              entities += reg
            case Left(f) =>
              if (errors == null)
                errors = new scala.collection.immutable.VectorBuilder[ExtractionError]
              errors += ExtractionError(
                convId, turnIdx, bi, -1, -1,
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
                    if (entities == null)
                      entities = new scala.collection.immutable.VectorBuilder[EntityRegister]
                    entities += EntityRegister(id, "", "",
                      if (id < EntityParser.CommunityStartId) "person"
                      else "community", "")
                  case _ => // unsalvageable: dead-letter row already emitted
                }
              }
          }

        case Blocker.KindContent =>
          blocksKept += 1
          var rowOrdinal = 0
          var li = bLineLo
          while (li < bLineHi) {
            val lb = lineAll(li)
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
                if (errors == null)
                  errors = new scala.collection.immutable.VectorBuilder[ExtractionError]
                errors += ExtractionError(
                  convId, turnIdx, bi, rowOrdinal, -1,
                  ErrorCode.ModulesNumberExceeded, -1, numModules.toString,
                  text.substring(ls, le))
              } else {
                var m = 0
                while (m < numModules) {
                  val str = Tokenizer.moduleStr(scratch, m, rowLen)
                  // hot-path parse: outcome lands in the reusable scratch
                  // holder — no Either/Option/ParsedModule per module
                  if (ModuleParser.parseModuleInto(m, str, ctx, scratch.parse)) {
                    val span = Tokenizer.moduleSpanPacked(scratch, m, rowLen)
                    if (modules == null) modules =
                      new scala.collection.immutable.VectorBuilder[ExtractedModule]
                    modules += ExtractedModule(
                      convId, turnIdx, bi, rowOrdinal,
                      m, scratch.parse.moduleType,
                      scala.collection.immutable.ArraySeq.unsafeWrapArray(
                        scratch.parse.zones), str,
                      Blocker.lineStart(span), Blocker.lineEnd(span))
                  } else {
                    if (errors == null)
                      errors = new scala.collection.immutable.VectorBuilder[ExtractionError]
                    errors += ExtractionError(
                      convId, turnIdx, bi, rowOrdinal,
                      m, scratch.parse.errCode, scratch.parse.errCatalog,
                      scratch.parse.errZone, str)
                  }
                  m += 1
                }
              }
              rowOrdinal += 1
            }
            li += 1
          }

        case Blocker.KindProse =>
          blocksKept += 1
          // block lines are contiguous (single '\n' separators), so the raw
          // span slice equals the lines joined by '\n'
          val spanStart = scratch.bStart(bi)
          val spanEnd = scratch.bEnd(bi)
          if (proseBuf == null) {
            // exact-size buffer: sum the remaining prose spans once so the
            // builder never grows (prose dominates transcript bytes; a
            // growth doubling re-copies all of it)
            var cap = 0
            var pj = bi
            while (pj < nBlocks) {
              if (scratch.bKind(pj) == Blocker.KindProse)
                cap += math.max(0, scratch.bEnd(pj) - scratch.bStart(pj)) + 2
              pj += 1
            }
            proseBuf = new java.lang.StringBuilder(math.max(cap - 2, 0))
            proseSpans = new scala.collection.immutable.VectorBuilder[Span]
          } else proseBuf.append("\n\n")
          proseBuf.append(text, spanStart, spanEnd)
          proseSpans += Span(spanStart, spanEnd)

        case _ => // separator / boilerplate: dropped
      }
      bi += 1
    }

    val clean = CleanTurn(
      convId, turnIdx,
      if (proseBuf == null) "" else proseBuf.toString,
      if (proseSpans == null) Vector.empty else proseSpans.result(),
      n_blocks_total = nBlocks, n_blocks_kept = blocksKept)

    TurnExtraction(
      if (modules == null) Vector.empty else modules.result(),
      if (entities == null) Vector.empty else entities.result(),
      if (errors == null) Vector.empty else errors.result(),
      clean,
      blocksTotal = nBlocks, blocksKept = blocksKept,
      rowsTokenized = rowsTokenized)
  }
}
