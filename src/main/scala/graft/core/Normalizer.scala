package graft.core

/** Input canonicalization — the P3/M15 analog (binarize + deskew,
  * /root/reference/src/utils.py:28-33,58-101): the reference rectifies the
  * raster (grayscale → threshold, rotation fix) before any segmentation;
  * the text analog rectifies the byte stream before block splitting.
  *
  * Kept deliberately small and loss-less for span math: every emitted char
  * maps 1:1 to an input char (CRLF folds to a single '\n' — the only 2→1
  * mapping — so normalization runs BEFORE span-carrying extraction, making
  * normalized-text offsets the canonical coordinate system, exactly like the
  * deskewed raster is the reference's coordinate system). */
object Normalizer {

  /** Returns the canonical text: CRLF/CR → LF, TAB → space, NBSP → space,
    * and the reference's stray high bytes (\\u0080 \\u0098 \\u0099,
    * annuary_register_parser.py:112) dropped. Fast path: returns the input
    * object untouched when already canonical. */
  def canonicalize(text: String): String = {
    val n = text.length
    var i = 0
    var dirty = false
    while (i < n && !dirty) {
      val c = text.charAt(i)
      if (c == '\r' || c == '\t' || c == '\u00A0' ||
        c == '\u0080' || c == '\u0098' || c == '\u0099') dirty = true
      i += 1
    }
    if (!dirty) return text
    val sb = new java.lang.StringBuilder(n)
    i = 0
    while (i < n) {
      val c = text.charAt(i)
      c match {
        case '\r' =>
          sb.append('\n')
          if (i + 1 < n && text.charAt(i + 1) == '\n') i += 1 // CRLF -> one LF
        case '\t' | '\u00A0' => sb.append(' ')
        case '\u0080' | '\u0098' | '\u0099' => // dropped
        case other => sb.append(other)
      }
      i += 1
    }
    sb.toString
  }
}
