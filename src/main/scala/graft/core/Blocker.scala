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
  * aspect-ratio predicates. The density heuristic family follows the
  * published boilerplate-removal literature (Kohlschütter et al.,
  * "Boilerplate detection using shallow text features", WSDM 2010).
  *
  * Allocation discipline: blocks carry line OFFSETS into the original turn
  * text; no per-line substrings are created during split/classify, and
  * dropped (boilerplate/separator) blocks never allocate strings at all —
  * at 100 TB the classifier scans far more bytes than it keeps.
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

  /** Header marker: the digitized register line of the block. */
  val HeaderMarker = "# "

  /** One block: `span` over the turn text, lines as [start, end) offsets. */
  final case class RawBlock(text: String, span: Span, lineBounds: Array[Span]) {
    def lineStrings: Vector[(String, Int)] =
      lineBounds.iterator.map(s => (text.substring(s.start, s.end), s.start)).toVector
  }

  final case class ClassifiedBlock(block: Block, raw: RawBlock) {
    def lines: Vector[(String, Int)] = raw.lineStrings
  }

  /** Is text[lo, hi) blank under String.trim semantics (all chars ≤ ' ')? */
  private def isBlankLine(text: String, lo: Int, hi: Int): Boolean = {
    var i = lo
    while (i < hi) { if (text.charAt(i) > ' ') return false; i += 1 }
    true
  }

  /** Split turn text into blocks on blank lines, tracking char offsets.
    * No substrings allocated. */
  def splitBlocks(text: String): Vector[RawBlock] = {
    val out = Vector.newBuilder[RawBlock]
    val cur = scala.collection.mutable.ArrayBuffer.empty[Span]
    var curStart = -1
    var curEnd = -1
    def flush(): Unit = {
      if (cur.nonEmpty) {
        out += RawBlock(text, Span(curStart, curEnd), cur.toArray)
        cur.clear()
      }
      curStart = -1; curEnd = -1
    }
    val n = text.length
    var lineStart = 0
    while (lineStart <= n) {
      val nl = text.indexOf('\n', lineStart)
      val end = if (nl < 0) n else nl
      if (isBlankLine(text, lineStart, end)) flush()
      else {
        if (curStart < 0) curStart = lineStart
        curEnd = end
        cur += Span(lineStart, end)
      }
      if (nl < 0) { flush(); lineStart = n + 1 }
      else lineStart = nl + 1
    }
    out.result()
  }

  /** Separator line test over a range: trimmed, ≥3 chars, all '=' or '-'
    * (same semantics as the regex `^[=\-]{3,}$` on the trimmed line). */
  private[core] def isSeparatorRange(text: String, lo0: Int, hi0: Int): Boolean = {
    var lo = lo0
    var hi = hi0
    while (lo < hi && text.charAt(lo) <= ' ') lo += 1
    while (hi > lo && text.charAt(hi - 1) <= ' ') hi -= 1
    if (hi - lo < 3) return false
    var i = lo
    while (i < hi) {
      val c = text.charAt(i)
      if (c != '=' && c != '-') return false
      i += 1
    }
    true
  }

  def isSeparator(line: String): Boolean = isSeparatorRange(line, 0, line.length)

  /** Link-region chars in text[lo, hi) — hand scan with the exact semantics
    * of the regex `<[^>]*>|https?://[^\s<]+` applied per line
    * (leftmost-match, tags need a closing '>' within the line, URLs run to
    * whitespace or '<'). */
  private def isJavaRegexSpace(ch: Char): Boolean = // exact \s class
    ch == ' ' || ch == '\t' || ch == '\n' || ch == '\u000B' || ch == '\f' || ch == '\r'

  private[core] def linkCharsOf(text: String, lo: Int, hi: Int): Int = {
    var i = lo
    var total = 0
    while (i < hi) {
      val c = text.charAt(i)
      if (c == '<') {
        var j = i + 1
        while (j < hi && text.charAt(j) != '>') j += 1
        if (j < hi) { total += j - i + 1; i = j + 1 }
        else i += 1
      } else if (c == 'h' && (text.startsWith("http://", i) || text.startsWith("https://", i))) {
        var j = i
        while (j < hi && !isJavaRegexSpace(text.charAt(j)) && text.charAt(j) != '<') j += 1
        total += j - i
        i = j
      } else i += 1
    }
    total
  }

  private[core] def linkCharsOf(line: String): Int = linkCharsOf(line, 0, line.length)

  private def startsWithAt(text: String, prefix: String, lo: Int, hi: Int): Boolean =
    hi - lo >= prefix.length && text.startsWith(prefix, lo)

  /** Feature extraction + classification of one raw block — one pass over
    * the block's characters (plus the link scan); zero allocation for
    * dropped blocks. */
  def classify(raw: RawBlock, ordinal: Int): ClassifiedBlock = {
    val text = raw.text
    val nLines = raw.lineBounds.length
    var nChars = 0
    var alnum = 0
    var linkChars = 0
    var nonSpace = 0
    var payload = 0
    var allSeparator = true
    var hasHeader = false
    var li = 0
    while (li < nLines) {
      val lb = raw.lineBounds(li)
      nChars += lb.end - lb.start
      var i = lb.start
      while (i < lb.end) {
        val c = text.charAt(i)
        if (Character.isLetterOrDigit(c)) alnum += 1
        if (c != ' ') { nonSpace += 1; if (isPayloadChar(c)) payload += 1 }
        i += 1
      }
      linkChars += linkCharsOf(text, lb.start, lb.end)
      if (allSeparator && !isSeparatorRange(text, lb.start, lb.end)) allSeparator = false
      if (!hasHeader && startsWithAt(text, HeaderMarker, lb.start, lb.end)) hasHeader = true
      li += 1
    }

    val kind =
      if (allSeparator) BlockKind.Separator
      else if (hasHeader) BlockKind.Header
      else {
        val b = Block(ordinal, BlockKind.Content, raw.span, nLines, nChars, alnum, linkChars)
        if (nChars < MinChars || b.textDensity < TextDensityMin || b.linkDensity > LinkDensityMax)
          BlockKind.Boilerplate
        else if (nonSpace > 0 && payload.toDouble / nonSpace >= PayloadRatioMin)
          BlockKind.Content
        else BlockKind.Prose
      }
    ClassifiedBlock(Block(ordinal, kind, raw.span, nLines, nChars, alnum, linkChars), raw)
  }

  /** Full turn → classified block tree. */
  def blockTree(text: String): Vector[ClassifiedBlock] = {
    val raws = splitBlocks(text)
    val out = Vector.newBuilder[ClassifiedBlock]
    var i = 0
    raws.foreach { raw => out += classify(raw, i); i += 1 }
    out.result()
  }

  /** The register string of a header block: the marker line minus the marker,
    * with any continuation lines appended (newlines fold to spaces downstream,
    * annuary_register_parser.py:31). */
  def headerText(cb: ClassifiedBlock): String = {
    val text = cb.raw.text
    val bounds = cb.raw.lineBounds
    val idx = bounds.indexWhere(lb => startsWithAt(text, HeaderMarker, lb.start, lb.end))
    val marked = text.substring(bounds(idx).start + HeaderMarker.length, bounds(idx).end)
    val rest = bounds.drop(idx + 1).iterator
      .filterNot(lb => isSeparatorRange(text, lb.start, lb.end))
      .map(lb => text.substring(lb.start, lb.end))
      .toVector
    (marked +: rest).mkString("\n")
  }
}
