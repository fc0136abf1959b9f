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

  private val AllDigits = "^[0-9]*$".r.pattern // YEAR_PATTERN / NUM_ID_PATTERN :78-79

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

  def defaultContext(entityIds: Set[Int]): Context =
    new Context(entityIds.contains, Set.empty)

  /** Parse one 10-char module slice. Left = fatal error for this module. */
  def parseModule(
      moduleOrdinal: Int,
      moduleStr: String,
      ctx: Context
  ): Either[ZoneError, ParsedModule] = {
    Grammar.moduleType(moduleStr) match {
      case None =>
        Left(ZoneError(ErrorCode.ModuleTypeNotRecognized, -1, moduleStr))
      case Some(tpe) =>
        val zones = Grammar.moduleZones(tpe)
        val out = new Array[String](zones.length)
        var zi = 0
        var index = tpe.length
        var rest = zones
        while (rest.nonEmpty) {
          val (catalogId, width) = rest.head
          rest = rest.tail
          val end = math.min(index + width, moduleStr.length)
          val zoneStr = if (index >= moduleStr.length) "" else moduleStr.substring(index, end)
          parseZone(catalogId, zoneStr, ctx) match {
            case Right(v) => out(zi) = v
            case Left(e) =>
              if (ctx.shouldSkip(moduleOrdinal, e)) out(zi) = zoneStr
              else return Left(e)
          }
          index += width
          zi += 1
        }
        Right(ParsedModule(tpe, scala.collection.immutable.ArraySeq.unsafeWrapArray(out)))
    }
  }

  /** Decode one zone (diary_module_parser.py:209-249). */
  def parseZone(catalogId0: Int, zoneStr: String, ctx: Context): Either[ZoneError, String] = {
    if (zoneStr.isEmpty)
      return Left(ZoneError(ErrorCode.BadZoneString, catalogId0, zoneStr))

    if (catalogId0 == 0) return Right(zoneStr) // free text
    if (catalogId0 == 1) return parseYear(zoneStr)
    if (catalogId0 == 32 || catalogId0 == 42) return resolveEntity(catalogId0, zoneStr, ctx)

    val catalogId = if (catalogId0 == 27) 9 else catalogId0 // alias :227-228
    val fixed = Grammar.fixKnownIssues(catalogId, zoneStr)
    if (Catalogs.contains(catalogId, fixed)) Right(fixed)
    else Left(ZoneError(ErrorCode.InvalidValueOnZone, catalogId0, fixed))
  }

  /** Year zone (diary_module_parser.py:251-266): confusion fix, '_' passthrough
    * (missing year), else all-digits required. */
  def parseYear(yearStr: String): Either[ZoneError, String] = {
    val tmp = Grammar.fixYear(yearStr)
    if (tmp.contains('_')) Right(tmp)
    else if (AllDigits.matcher(tmp).matches()) Right(tmp)
    else Left(ZoneError(ErrorCode.BadYear, 1, yearStr))
  }

  /** Entity FK zone (diary_module_parser.py:268-290): fix _→0 O→0, '000'
    * substring accepted raw, else digits → id → broadcast-set membership. */
  def resolveEntity(catalogId: Int, zoneStr0: String, ctx: Context): Either[ZoneError, String] = {
    val zoneStr = Grammar.fixEntityId(zoneStr0)
    if (zoneStr.contains("000")) return Right(zoneStr)
    if (!AllDigits.matcher(zoneStr).matches() || zoneStr.isEmpty)
      return Left(ZoneError(ErrorCode.BadNumId, catalogId, zoneStr))
    val numId =
      try zoneStr.toInt
      catch {
        case _: NumberFormatException =>
          return Left(ZoneError(ErrorCode.BadNumId, catalogId, zoneStr))
      }
    if (ctx.entityIds(numId)) Right(zoneStr)
    else Left(ZoneError(ErrorCode.NoEntityRegister, catalogId, zoneStr))
  }
}
