package graft.core

/** Block-tree splitter + boilerplate classifier — the G1–G6 / P4–P9 family,
  * re-expressed as text-density + link-density heuristics over a block tree.
  *
  * The reference finds page regions by morphology + contours and keeps or
  * drops them with geometry predicates
  * (/root/reference/src/annuary/annuary_structure_detector.py:15-126,
  * /root/reference/src/diary/diary_structure_detector.py:20-198). The text
  * analog: a turn's raw text/markup splits into blocks on blank lines
  * (projection-profile analog — a blank line is a zero-ink horizontal band),
  * separator lines split header from content (is_separation_diary_row analog,
  * diary_structure_detector.py:148-152), and each block is scored with
  * text-density / link-density / size features standing in for the area and
  * aspect-ratio predicates.
  */
object Blocker {

  /** Keep thresholds — the P4–P8 analogs. A block survives iff it has at
    * least MinChars payload characters (area analog,
    * annuary_structure_detector.py:120-126), text density at least
    * TextDensityMin and link density at most LinkDensityMax (the keep/drop
    * feature scoring of is_valid_* predicates). */
  val MinChars = 8
  val TextDensityMin = 0.50
  val LinkDensityMax = 0.40

  /** Structured-payload alphabet — the analog of the reference's OCR
    * character whitelist `ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789=`
    * (/root/reference/diary_ocr.py:240-243) plus the missing-value char '_'.
    * A surviving block whose non-space chars are ≥ PayloadRatioMin from this
    * alphabet is structured Content (module rows); otherwise it is Prose
    * (main content text, kept but not module-tokenized). */
  val PayloadRatioMin = 0.90
  def isPayloadChar(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') || c == '=' || c == '_'

  /** Markup/URL regions count as link ink. */
  private val LinkRegion = "<[^>]*>|https?://[^\\s<]+".r
  /** A separator line: >=3 of only '=' or '-' (header/content divider). */
  private val SeparatorLine = "^[=\\-]{3,}$".r
  /** Header marker: the digitized register line of the block. */
  val HeaderMarker = "# "

  final case class RawBlock(span: Span, lines: Vector[(String, Int)]) // (line, lineStartOffset)

  final case class ClassifiedBlock(block: Block, lines: Vector[(String, Int)])

  /** Split turn text into blocks on blank lines, tracking char offsets. */
  def splitBlocks(text: String): Vector[RawBlock] = {
    val out = Vector.newBuilder[RawBlock]
    var lineStart = 0
    var cur = Vector.newBuilder[(String, Int)]
    var curStart = -1
    var curEnd = -1
    def flush(): Unit = {
      val lines = cur.result()
      if (lines.nonEmpty) out += RawBlock(Span(curStart, curEnd), lines)
      cur = Vector.newBuilder[(String, Int)]
      curStart = -1; curEnd = -1
    }
    val n = text.length
    var i = 0
    while (lineStart <= n) {
      i = text.indexOf('\n', lineStart)
      val end = if (i < 0) n else i
      val line = text.substring(lineStart, end)
      if (line.trim.isEmpty) flush()
      else {
        if (curStart < 0) curStart = lineStart
        curEnd = end
        cur += ((line, lineStart))
      }
      if (i < 0) { flush(); lineStart = n + 1 }
      else lineStart = i + 1
    }
    out.result()
  }

  def isSeparator(line: String): Boolean =
    SeparatorLine.pattern.matcher(line.trim).matches()

  /** Feature extraction + classification of one raw block. */
  def classify(raw: RawBlock, ordinal: Int): ClassifiedBlock = {
    val body = raw.lines.map(_._1)
    val nLines = body.length
    val nChars = body.iterator.map(_.length).sum
    var alnum = 0
    body.foreach(l => l.foreach(c => if (Character.isLetterOrDigit(c)) alnum += 1))
    var linkChars = 0
    body.foreach(l => LinkRegion.findAllMatchIn(l).foreach(m => linkChars += m.end - m.start))

    val kind =
      if (body.forall(isSeparator)) BlockKind.Separator
      else if (body.exists(_.startsWith(HeaderMarker))) BlockKind.Header
      else {
        val b = Block(ordinal, BlockKind.Content, raw.span, nLines, nChars, alnum, linkChars)
        if (nChars < MinChars || b.textDensity < TextDensityMin || b.linkDensity > LinkDensityMax)
          BlockKind.Boilerplate
        else {
          var nonSpace = 0
          var payload = 0
          body.foreach(_.foreach { c =>
            if (c != ' ') { nonSpace += 1; if (isPayloadChar(c)) payload += 1 }
          })
          if (nonSpace > 0 && payload.toDouble / nonSpace >= PayloadRatioMin)
            BlockKind.Content
          else BlockKind.Prose
        }
      }
    ClassifiedBlock(Block(ordinal, kind, raw.span, nLines, nChars, alnum, linkChars), raw.lines)
  }

  /** Full turn → classified block tree. */
  def blockTree(text: String): Vector[ClassifiedBlock] =
    splitBlocks(text).zipWithIndex.map { case (raw, i) => classify(raw, i) }

  /** The register string of a header block: the marker line minus the marker,
    * with any continuation lines appended (newlines fold to spaces downstream,
    * annuary_register_parser.py:31). */
  def headerText(cb: ClassifiedBlock): String = {
    val idx = cb.lines.indexWhere(_._1.startsWith(HeaderMarker))
    val marked = cb.lines(idx)._1.substring(HeaderMarker.length)
    val rest = cb.lines.drop(idx + 1).map(_._1).filterNot(isSeparator)
    (marked +: rest).mkString("\n")
  }
}
