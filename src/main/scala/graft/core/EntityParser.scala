package graft.core

/** Header/entity register parser — the M5–M10 family.
  *
  * Same field semantics as the reference's annuary register parser
  * (/root/reference/src/annuary/annuary_register_parser.py:28-162):
  * whitespace tokenization, letters-id + numeric-id validation, the
  * 9000 person/community threshold, name sanitization, parenthesized/numeric
  * info extraction with order-preserving dedup, and info-substring removal
  * from the name. Errors are typed values, not exceptions (batch engine:
  * the error channel is data).
  */
object EntityParser {

  val CommunityStartId = 9000 // annuary_register_parser.py:6
  val MaxNumId = 9850 // annuary_register_parser.py:7

  // The reference's `^...$` patterns (annuary_register_parser.py:10-14) as
  // data: kept for the differential spec; the parse path uses the
  // allocation-free char-class scans below (each fullMatch allocated a
  // Matcher, ~5 per header — measured 2.9 KB/header, AllocProbe).
  private[core] val NumIdPattern = "^[0-9]*$".r
  private[core] val LetIdPattern = "^[A-Z]*$".r
  private[core] val PersonNamePattern = """^[A-Z0-9+*". \(\)\/]*$""".r
  private[core] val CommunityNamePattern = """^[A-Z0-9\-+*. \(\)\/]*$""".r
  private val ParenthesisGroup = """\(([A-Za-z0-9]+)\)""".r

  final case class ParseFailure(code: String, detail: String)

  // Python's re.match anchors at the start only; with `^...$` patterns that
  // is full-string match (annuary_register_parser.py uses ^..$ everywhere);
  // empty strings match the `*` quantifier in all four patterns.
  @inline private def isAsciiDigit(c: Char): Boolean = c >= '0' && c <= '9'
  private[core] def allDigits(s: String): Boolean = { // ^[0-9]*$
    var i = 0; while (i < s.length) { if (!isAsciiDigit(s.charAt(i))) return false; i += 1 }
    true
  }
  private[core] def allUpper(s: String): Boolean = { // ^[A-Z]*$
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i); if (c < 'A' || c > 'Z') return false; i += 1
    }
    true
  }
  // note the asymmetry, preserved from the reference: person names admit
  // '"' but not '-'; community names admit '-' but not '"'
  @inline private def nameCharCommon(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || isAsciiDigit(c) || c == '+' || c == '*' ||
      c == '.' || c == ' ' || c == '(' || c == ')' || c == '/'
  private[core] def personNameOk(s: String): Boolean = { // ^[A-Z0-9+*". \(\)\/]*$
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (!nameCharCommon(c) && c != '"') return false
      i += 1
    }
    true
  }
  private[core] def communityNameOk(s: String): Boolean = { // ^[A-Z0-9\-+*. \(\)\/]*$
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (!nameCharCommon(c) && c != '-') return false
      i += 1
    }
    true
  }

  def tokenize(s: String): Array[String] =
    s.split(' ').filter(_.nonEmpty) // annuary_register_parser.py:153-154

  /** `\d` under Java's default (ASCII) semantics. */
  def containsNumbers(s: String): Boolean = {
    var i = 0
    while (i < s.length) { if (isAsciiDigit(s.charAt(i))) return true; i += 1 }
    false
  }

  /** Full register parse: `raw` is one header string (newlines already folded
    * to spaces by the caller, mirroring :31). */
  def parse(raw: String): Either[ParseFailure, EntityRegister] = {
    val registerStr = raw.replace('\n', ' ')
    val tokens = tokenize(registerStr)
    if (tokens.length < 3)
      return Left(ParseFailure(ErrorCode.InsufficientTokens, registerStr))

    val lettersId = tokens(0)
    if (!allUpper(lettersId) || lettersId.length < 2)
      return Left(ParseFailure(ErrorCode.BadLetterId, lettersId))

    val numbersIdStr = tokens(1)
    if (!allDigits(numbersIdStr) || numbersIdStr.isEmpty)
      return Left(ParseFailure(ErrorCode.BadNumericId, numbersIdStr))
    // Post-regex overflow = an all-digit id too large for Int. The
    // reference's unbounded Python int passes the regex and fails the
    // MaxNumId range check (annuary_register_parser.py:89-97), so overflow
    // is ID_OUT_OF_RANGE, not BAD_NUMERIC_ID — parseNumIdOnly already
    // agrees.
    val numId =
      try numbersIdStr.toInt
      catch { case _: NumberFormatException =>
        return Left(ParseFailure(ErrorCode.IdOutOfRange, numbersIdStr))
      }
    if (numId > MaxNumId)
      return Left(ParseFailure(ErrorCode.IdOutOfRange, numbersIdStr))

    val kind = if (numId < CommunityStartId) "person" else "community" // :99-103

    // Name: substring after the two id tokens (:105-116).
    val indexId = tokens(0).length + tokens(1).length + 1
    var name = registerStr.substring(math.min(indexId, registerStr.length)).trim
    // ','→'.' plus stray high-byte strip (\\x80 \\x98 \\x99 — smart-quote
    // debris in the reference's OCR output, annuary_register_parser.py:112).
    name = name
      .replace(',', '.')
      .replace("\u0080", "")
      .replace("\u0098", "")
      .replace("\u0099", "")
    val isPerson = kind == "person"
    if (!isPerson && name.nonEmpty) name = '*' + name.substring(1) // :159-162

    if (isPerson && !personNameOk(name))
      return Left(ParseFailure(ErrorCode.InvalidName, name))
    if (!isPerson && !communityNameOk(name))
      return Left(ParseFailure(ErrorCode.InvalidName, name))

    // Info extraction (:129-151): parenthesis group, community first token,
    // any token containing digits; order-preserving dedup.
    val info = scala.collection.mutable.ArrayBuffer.empty[String]
    ParenthesisGroup.findFirstMatchIn(name).foreach(m => info += m.matched)
    val nameTokens = tokenize(name)
    if (!isPerson && nameTokens.nonEmpty) info += nameTokens(0) // unconditional, :143-144
    for (t <- nameTokens)
      if (containsNumbers(t) && !info.contains(t)) info += t

    // Strip info substrings from the name (:44-45).
    var cleanName = name
    for (i <- info) cleanName = cleanName.replace(i, "").trim

    Right(EntityRegister(numId, lettersId, cleanName, kind, info.mkString(" ").trim))
  }

  /** Fallback numeric-id-only parse (annuary_register_parser.py:55-65). */
  def parseNumIdOnly(raw: String): Either[ParseFailure, Int] = {
    val registerStr = raw.replace('\n', ' ')
    val tokens = tokenize(registerStr)
    if (tokens.length < 3)
      return Left(ParseFailure(ErrorCode.InsufficientTokens, registerStr))
    val numbersIdStr = tokens(1)
    if (!allDigits(numbersIdStr) || numbersIdStr.isEmpty)
      return Left(ParseFailure(ErrorCode.BadNumericId, numbersIdStr))
    try {
      val n = numbersIdStr.toInt
      if (n > MaxNumId) Left(ParseFailure(ErrorCode.IdOutOfRange, numbersIdStr))
      else Right(n)
    } catch {
      case _: NumberFormatException =>
        Left(ParseFailure(ErrorCode.IdOutOfRange, numbersIdStr))
    }
  }
}
