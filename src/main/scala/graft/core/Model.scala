package graft.core

/** Core data model of the extraction engine.
  *
  * Reimagines the reference's record shapes for transcript extraction
  * (see /root/reference/src/annuary/annuary_register_parser.py:47-53 and
  * /root/reference/src/diary/diary_module_parser.py:143-168): a "page"
  * becomes a conversation, a content row's character groups become token
  * spans over the turn's raw text, and the parsed 10-char modules become
  * typed `ExtractedModule` rows carrying their source span offsets.
  */

/** One transcript turn — the authoritative input shape (BASELINE.json input_hint). */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: java.sql.Timestamp
)

/** Half-open character span [start, end) within a turn's raw text.
  * The analog of the reference's (x, y, w, h) box (/root/reference/src/utils.py:15-17),
  * collapsed to 1-D because transcript turns are byte streams, not rasters. */
final case class Span(start: Int, end: Int) {
  def isEmpty: Boolean = end <= start
  def length: Int = math.max(0, end - start)
  /** Half-open overlap test — mirrors the reference's half-open range
    * membership (/root/reference/src/diary/diary_structure_detector.py:269-272). */
  def overlaps(o: Span): Boolean = start < o.end && o.start < end
  def contains(o: Span): Boolean = start <= o.start && o.end <= end
}

/** Block kinds produced by the block-tree splitter (boilerplate classifier). */
object BlockKind {
  val Header = "header"
  val Content = "content"
  val Prose = "prose"
  val Boilerplate = "boilerplate"
  val Separator = "separator"
}

/** One block of a turn's block tree, with the geometry-analog features the
  * keep/drop heuristics score (the P4–P9 analog of
  * /root/reference/src/annuary/annuary_structure_detector.py:69-74,120-126). */
final case class Block(
    ordinal: Int,
    kind: String,
    span: Span,
    nLines: Int,
    nChars: Int,
    alnumChars: Int,
    linkChars: Int
) {
  def textDensity: Double = if (nChars == 0) 0.0 else alnumChars.toDouble / nChars
  def linkDensity: Double = if (nChars == 0) 0.0 else linkChars.toDouble / nChars
}

/** A token group inside a content row: `numChars` output characters backed by
  * an optional source span (None = gap placeholder, the analog of the
  * reference's space modules — /root/reference/src/diary/diary_structure_detector.py:280-315). */
final case class TokenGroup(numChars: Int, span: Option[Span])

/** One successfully extracted + validated module.
  * `zones` excludes the module type (it rides in `moduleType`);
  * `moduleStr` is the raw 10-char slice; `span` points into the turn text. */
final case class ExtractedModule(
    conv_id: String,
    turn_idx: Int,
    block_ordinal: Int,
    row_ordinal: Int,
    module_ordinal: Int,
    module_type: String,
    zones: Seq[String],
    module_str: String,
    span_start: Int,
    span_end: Int
) {
  /** Sink serialization — analog of '|'.join(module)
    * (/root/reference/src/diary/diary_data.py:35-38). */
  def serialized: String = (module_type +: zones).mkString("|")
}

/** An extracted entity register — analog of the annuary register record
  * (/root/reference/src/annuary/annuary_register_parser.py:47-53). */
final case class EntityRegister(
    num_id: Int,
    text_id: String,
    name: String,
    kind: String,
    info: String
)

/** Typed error codes — union of the reference's two exception enums
  * (/root/reference/src/annuary/annuary_register_parser.py:18-22 and
  * /root/reference/src/diary/diary_module_parser.py:9-15). */
object ErrorCode {
  // annuary family
  val InsufficientTokens = "INSUFFICIENT_TOKENS"
  val BadLetterId = "BAD_LETTER_ID"
  val BadNumericId = "BAD_NUMERIC_ID"
  val IdOutOfRange = "ID_OUT_OF_RANGE"
  val InvalidName = "INVALID_NAME"
  // diary family
  val ModulesNumberExceeded = "MODULES_NUMBER_EXCEEDED"
  val ModuleTypeNotRecognized = "MODULE_TYPE_NOT_RECOGNIZED"
  val BadZoneString = "BAD_ZONE_STRING"
  val BadYear = "BAD_YEAR"
  val InvalidValueOnZone = "INVALID_VALUE_ON_ZONE"
  val BadNumId = "BAD_NUM_ID"
  val NoEntityRegister = "NO_ENTITY_REGISTER"
}

/** Dead-letter row — the batch replacement of the reference's interactive
  * repair loop (/root/reference/annuary_ocr.py:78-107, diary_ocr.py:279-302).
  * Carries enough context (module index, zone, zone string, raw input) for an
  * offline fix + resume. */
final case class ExtractionError(
    conv_id: String,
    turn_idx: Int,
    block_ordinal: Int,
    row_ordinal: Int,
    module_ordinal: Int,
    code: String,
    zone_catalog: Int,
    zone_str: String,
    raw: String
)

/** Skip rule — analog of the reference's user-approved skip list
  * (/root/reference/src/diary/diary_module_parser.py:170-181): a tolerated
  * (module ordinal, zone catalog, zone string) triple whose zone failure is
  * downgraded to "keep the raw string". */
final case class SkipRule(module_ordinal: Int, zone_catalog: Int, zone_str: String)

/** Per-(partition) lineage/metrics row (north-rule observability; the batch
  * analog of the reference's print_status / progress narration —
  * /root/reference/src/annuary/annuary_data.py:36-44). */
final case class PartitionMetrics(
    partition_id: Int,
    turns: Long,
    blocks_total: Long,
    blocks_kept: Long,
    blocks_dropped: Long,
    rows_tokenized: Long,
    modules_ok: Long,
    modules_err: Long,
    span_chars: Long
)

/** Per-turn cleaned main content: prose blocks that survive the boilerplate
  * classifier, joined in block order, with their source spans — the
  * HTML-boilerplate-strip output (north-star "main-content extraction"). */
final case class CleanTurn(
    conv_id: String,
    turn_idx: Int,
    clean_text: String,
    spans: Seq[Span],
    n_blocks_total: Int,
    n_blocks_kept: Int
)

/** Result of extracting one turn. */
final case class TurnExtraction(
    modules: Vector[ExtractedModule],
    entities: Vector[EntityRegister],
    errors: Vector[ExtractionError],
    clean: CleanTurn,
    blocksTotal: Int,
    blocksKept: Int,
    rowsTokenized: Int
)
