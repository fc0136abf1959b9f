package graft.core

/** Fixed-width module decoder — the M11–M14 + G11 + J1/J2 family.
  *
  * Same zone semantics as the reference's diary module parser
  * (/root/reference/src/diary/diary_module_parser.py:120-298): type resolution
  * via confusion-prefix rewrite + prefix match, per-zone fixed-width cuts
  * walking an index from the type length, per-zone decode dispatch
  * (0 = passthrough, 1 = year, 27→9 alias, 32/42 = entity FK, else catalog
  * lookup with confusion fix), the ≤3-modules-per-row cap, and the skip-rule
  * tolerance that keeps the raw zone string.
  *
  * Errors are values; a zone error covered by a skip rule degrades to the raw
  * zone string and the rest of the module still parses — zone-level error
  * granularity, exactly like the reference's skip list
  * (diary_module_parser.py:157-166).
  */
object ModuleParser {

  val MaxModulesPerRow = 3 // diary_module_parser.py:122-124
  val SpaceChar = '_' // diary_module_parser.py:77


  final case class ZoneError(code: String, catalogId: Int, zoneStr: String)

  // zones ride as an exact-size array (wrapped immutable) — the hot path
  // emits millions of these; a Vector's tree nodes per module are pure
  // memory-system pressure (BENCH/BASELINE.md §3)
  final case class ParsedModule(moduleType: String, zones: Seq[String])

  /** entityIds: the broadcast entity (annuary) key set for FK resolution
    * (J2 — diary_module_parser.py:268-290). skipRules: tolerated zone
    * failures keyed by module ordinal. */
  final class Context(
      val entityIds: Int => Boolean,
      val skipRules: Set[SkipRule]
  ) extends Serializable {
    def shouldSkip(moduleOrdinal: Int, e: ZoneError): Boolean =
      skipRules.contains(SkipRule(moduleOrdinal, e.catalogId, e.zoneStr))
  }

  /** Unboxed membership for the entity-id universe: Set[Int].contains boxes
    * its argument on every FK zone; a bitset predicate through the
    * @specialized Function1[Int, Boolean] does not. */
  def entityIdPredicate(ids: Set[Int]): Int => Boolean = {
    val bs = new java.util.BitSet
    ids.foreach(i => if (i >= 0) bs.set(i))
    val hasNegative = ids.exists(_ < 0) // defensive: synthetic ids are ≥ 0
    if (hasNegative) ids.contains _
    else (i: Int) => i >= 0 && bs.get(i)
  }

  def defaultContext(entityIds: Set[Int]): Context =
    new Context(entityIdPredicate(entityIds), Set.empty)

  /** Reusable per-thread parse outcome — the hot loop's replacement for the
    * Either/Option wrapper tower (≈10 wrapper objects per module; the
    * extraction loop emits millions of modules, BENCH/BASELINE.md §3). On
    * success `moduleType`/`zones` are set (zones escapes into the output
    * row — that allocation is the floor, not overhead); on failure the err*
    * fields are set. One instance rides in Tokenizer.Scratch. */
  final class ParseResult {
    var moduleType: String = _
    var zones: Array[String] = _
    var errCode: String = _
    var errCatalog: Int = 0
    var errZone: String = _
    @inline def fail(code: String, catalogId: Int, zone: String): Boolean = {
      errCode = code; errCatalog = catalogId; errZone = zone; false
    }
  }

  /** Allocation-free all-digits check — the YEAR_PATTERN / NUM_ID_PATTERN
    * semantics (diary_module_parser.py:78-79, `^[0-9]*$`) without a
    * Pattern.matcher allocation per call (year zones appear 1–2× in nearly
    * every module type). */
  @inline private def isAllDigits(s: String): Boolean = {
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c < '0' || c > '9') return false
      i += 1
    }
    true
  }

  // ---- precomputed zone tables (the parse-stage allocation diet) ----------
  //
  // Nearly every zone is 1-2 chars (moduleZones widths; a zone is shorter
  // only when truncated at the module edge) and ASCII. For those spans the
  // whole zone decode — confusion fix, catalog membership, canonical output
  // string — is a pure function of (catalogId, c0, c1), so it is TABLED
  // once at class init BY CALLING THE EXISTING decode path (semantics
  // preserved by construction, pinned by ParserSpec + the q20/q25 oracles).
  // The hot loop then does one array read per zone instead of a substring
  // + fix + hash lookup: the per-zone allocation (≈330 B/turn, the
  // dominant parse cost in the AllocProbe ledger) drops to zero on the
  // success path. Non-ASCII, width>2, and FK/free-width zones fall back to
  // the string path unchanged.
  private val AsciiW = 128
  private val CodeSpace = AsciiW + AsciiW * AsciiW // width-1 codes ++ width-2
  @inline private def zcode1(c0: Char): Int = c0.toInt
  @inline private def zcode2(c0: Char, c1: Char): Int =
    AsciiW + c0.toInt * AsciiW + c1.toInt

  /** code -> the literal 1-2 char ASCII string (free-text zones, errors). */
  private val asciiStrings: Array[String] = {
    val a = new Array[String](CodeSpace)
    var c0 = 0
    while (c0 < AsciiW) {
      a(zcode1(c0.toChar)) = String.valueOf(c0.toChar)
      var c1 = 0
      while (c1 < AsciiW) {
        a(zcode2(c0.toChar, c1.toChar)) = new String(Array(c0.toChar, c1.toChar))
        c1 += 1
      }
      c0 += 1
    }
    a
  }

  /** code -> canonical fixed year string, or null when invalid. */
  private val yearTable: Array[String] = {
    val a = new Array[String](CodeSpace)
    val canon = new java.util.HashMap[String, String]()
    var i = 0
    while (i < CodeSpace) {
      val raw = asciiStrings(i)
      val tmp = Grammar.fixYear(raw)
      if (tmp.indexOf('_') >= 0 || tmp.forall(c => c >= '0' && c <= '9')) {
        var v = canon.get(tmp)
        if (v == null) { canon.put(tmp, tmp); v = tmp }
        a(i) = v
      }
      i += 1
    }
    a
  }

  /** catalogId (POST-alias) -> code -> canonical member string, or null
    * when the fixed value is not in the catalog. */
  private val zoneTables: Array[Array[String]] = {
    val tables = new Array[Array[String]](64)
    val canon = new java.util.HashMap[String, String]()
    Catalogs.tables.keys.foreach { cid =>
      val t = new Array[String](CodeSpace)
      var i = 0
      while (i < CodeSpace) {
        val fixed = Grammar.fixKnownIssues(cid, asciiStrings(i))
        if (Catalogs.contains(cid, fixed)) {
          var v = canon.get(fixed)
          if (v == null) { canon.put(fixed, fixed); v = fixed }
          t(i) = v
        }
        i += 1
      }
      tables(cid) = t
    }
    tables
  }

  /** Span form of [[parseZoneInto]] for `moduleStr.substring(lo, hi)`:
    * identical outcomes, zero allocation on the tabled paths. */
  private def parseZoneSpanInto(catalogId0: Int, s: String, lo: Int, hi: Int,
      ctx: Context, res: ParseResult): String = {
    if (hi <= lo) {
      res.fail(ErrorCode.BadZoneString, catalogId0, ""); return null
    }
    val w = hi - lo
    if (w <= 2) {
      val c0 = s.charAt(lo)
      val c1 = if (w == 2) s.charAt(lo + 1) else ' '
      if (c0 < AsciiW && (w == 1 || c1 < AsciiW)) {
        val code = if (w == 1) zcode1(c0) else zcode2(c0, c1)
        if (catalogId0 == 0) return asciiStrings(code) // free text, canonical
        if (catalogId0 == 1) {
          val v = yearTable(code)
          if (v != null) return v
          res.fail(ErrorCode.BadYear, 1, asciiStrings(code)); return null
        }
        if (catalogId0 != 32 && catalogId0 != 42) {
          val cid = if (catalogId0 == 27) 9 else catalogId0
          val table = if (cid >= 0 && cid < 64) zoneTables(cid) else null
          if (table != null) {
            val v = table(code)
            if (v != null) return v
            res.fail(ErrorCode.InvalidValueOnZone, catalogId0,
              Grammar.fixKnownIssues(cid, asciiStrings(code)))
            return null
          }
        }
      }
    }
    // fallback: FK zones, width > 2, non-ASCII, unknown catalogs
    parseZoneInto(catalogId0, s.substring(lo, hi), ctx, res)
  }

  /** Hot-path module parse: true = success (res.moduleType/zones set),
    * false = fatal error (res.err* set). Allocates only the output zones
    * array + zone strings. */
  def parseModuleInto(
      moduleOrdinal: Int,
      moduleStr: String,
      ctx: Context,
      res: ParseResult): Boolean = {
    val tpe = Grammar.moduleTypeOrNull(moduleStr)
    if (tpe == null)
      return res.fail(ErrorCode.ModuleTypeNotRecognized, -1, moduleStr)
    val zones = Grammar.zonesFor(tpe)
    val out = new Array[String](zones.length)
    var zi = 0
    var index = tpe.length
    var rest = zones
    while (rest.nonEmpty) {
      val zone = rest.head
      rest = rest.tail
      val catalogId = zone._1
      val width = zone._2
      val end = math.min(index + width, moduleStr.length)
      val lo = math.min(index, moduleStr.length)
      val v = parseZoneSpanInto(catalogId, moduleStr, lo, end, ctx, res)
      if (v != null) out(zi) = v
      else if (ctx.shouldSkip(moduleOrdinal,
          ZoneError(res.errCode, res.errCatalog, res.errZone))) {
        // the skip rule keeps the RAW zone string (tabled for short ASCII)
        out(zi) =
          if (end <= lo) ""
          else {
            val c0 = moduleStr.charAt(lo)
            if (end - lo == 1 && c0 < AsciiW) asciiStrings(zcode1(c0))
            else if (end - lo == 2 && c0 < AsciiW &&
                moduleStr.charAt(lo + 1) < AsciiW)
              asciiStrings(zcode2(c0, moduleStr.charAt(lo + 1)))
            else moduleStr.substring(lo, end)
          }
      } else return false
      index += width
      zi += 1
    }
    res.moduleType = tpe
    res.zones = out
    true
  }

  /** Hot-path zone decode: the value, or null with res.err* set. */
  def parseZoneInto(catalogId0: Int, zoneStr: String, ctx: Context,
      res: ParseResult): String = {
    if (zoneStr.isEmpty) {
      res.fail(ErrorCode.BadZoneString, catalogId0, zoneStr); return null
    }
    if (catalogId0 == 0) return zoneStr // free text
    if (catalogId0 == 1) { // year (diary_module_parser.py:251-266)
      val tmp = Grammar.fixYear(zoneStr)
      if (tmp.indexOf('_') >= 0 || isAllDigits(tmp)) return tmp
      res.fail(ErrorCode.BadYear, 1, zoneStr); return null
    }
    if (catalogId0 == 32 || catalogId0 == 42) { // entity FK (:268-290)
      val fixed = Grammar.fixEntityId(zoneStr)
      if (fixed.contains("000")) return fixed
      if (!isAllDigits(fixed)) {
        res.fail(ErrorCode.BadNumId, catalogId0, fixed); return null
      }
      // Exactly the historical toInt-or-BadNumId semantics: Int-range
      // all-digit strings (module-path zones are width ≤ 4, but this is
      // public API) resolve against the universe (→ NoEntityRegister when
      // absent, as in the reference); only Int-overflow degrades to
      // BadNumId, and without the exception cost for >10-digit floods.
      val numId =
        if (fixed.length > 10) -1
        else try java.lang.Integer.parseInt(fixed)
        catch { case _: NumberFormatException => -1 }
      if (numId < 0) {
        res.fail(ErrorCode.BadNumId, catalogId0, fixed); return null
      }
      if (ctx.entityIds(numId)) return fixed
      res.fail(ErrorCode.NoEntityRegister, catalogId0, fixed); return null
    }
    val catalogId = if (catalogId0 == 27) 9 else catalogId0 // alias :227-228
    val fixed = Grammar.fixKnownIssues(catalogId, zoneStr)
    if (Catalogs.contains(catalogId, fixed)) fixed
    else { res.fail(ErrorCode.InvalidValueOnZone, catalogId0, fixed); null }
  }

  /** Parse one 10-char module slice. Left = fatal error for this module.
    * (Wrapper over the hot-path form — tests and non-hot callers.) */
  def parseModule(
      moduleOrdinal: Int,
      moduleStr: String,
      ctx: Context
  ): Either[ZoneError, ParsedModule] = {
    val res = new ParseResult
    if (parseModuleInto(moduleOrdinal, moduleStr, ctx, res))
      Right(ParsedModule(res.moduleType,
        scala.collection.immutable.ArraySeq.unsafeWrapArray(res.zones)))
    else Left(ZoneError(res.errCode, res.errCatalog, res.errZone))
  }

  /** Decode one zone (diary_module_parser.py:209-249). */
  def parseZone(catalogId0: Int, zoneStr: String, ctx: Context): Either[ZoneError, String] = {
    val res = new ParseResult
    val v = parseZoneInto(catalogId0, zoneStr, ctx, res)
    if (v != null) Right(v)
    else Left(ZoneError(res.errCode, res.errCatalog, res.errZone))
  }

  /** Year zone (diary_module_parser.py:251-266): confusion fix, '_' passthrough
    * (missing year), else all-digits required. */
  def parseYear(yearStr: String): Either[ZoneError, String] = {
    val tmp = Grammar.fixYear(yearStr)
    if (tmp.contains('_')) Right(tmp)
    else if (isAllDigits(tmp)) Right(tmp)
    else Left(ZoneError(ErrorCode.BadYear, 1, yearStr))
  }

  /** Entity FK zone (diary_module_parser.py:268-290): fix _→0 O→0, '000'
    * substring accepted raw, else digits → id → broadcast-set membership. */
  def resolveEntity(catalogId: Int, zoneStr0: String, ctx: Context): Either[ZoneError, String] = {
    val res = new ParseResult
    if (zoneStr0.isEmpty) {
      // preserve the standalone API's historical empty-string behavior
      val fixed = Grammar.fixEntityId(zoneStr0)
      return Left(ZoneError(ErrorCode.BadNumId, catalogId, fixed))
    }
    val v = parseZoneInto(catalogId, zoneStr0, ctx, res)
    if (v != null) Right(v)
    else Left(ZoneError(res.errCode, res.errCatalog, res.errZone))
  }
}
