package graft.core

/** The fixed-width module grammar.
  *
  * Semantics from /root/reference/src/diary/diary_module_parser.py:27-75
  * (MODULE_ZONES: 47 module types, each a list of (catalogId, width) zones),
  * :81-114 (per-catalog OCR-confusion maps) and :183-207 (prefix rewrites +
  * longest-prefix type match). The *data* is the reference's published record
  * layout; the implementation is new.
  *
  * Catalog id meanings: 0 = free text (passthrough), 1 = year (regex-validated),
  * 27 is an alias of 9, 32/42 = entity (annuary) foreign keys; all others are
  * dimension-table lookups.
  */
object Grammar {

  /** (catalogId, width) zone layout per module type. */
  val moduleZones: Map[String, List[(Int, Int)]] = Map(
    "A" -> List((30, 1), (1, 2), (2, 1), (3, 2), (1, 2), (2, 1)),
    "BA" -> List((1, 2), (2, 1), (3, 2), (5, 2), (6, 1)),
    "BB" -> List((1, 2), (2, 1), (3, 2), (7, 2), (8, 1)),
    "BC" -> List((1, 2), (10, 1), (3, 2), (9, 2), (11, 1)),
    "BD" -> List((1, 2), (2, 1), (3, 2), (9, 2), (12, 1)),
    "BE" -> List((1, 2), (2, 1), (3, 2), (1, 2), (2, 1)),
    "BF" -> List((1, 2), (13, 1), (3, 2), (5, 2), (14, 1)),
    "BH" -> List((1, 2), (2, 1), (3, 2), (5, 2), (14, 1)),
    "BI" -> List((1, 2), (2, 1), (3, 2), (16, 2), (17, 1)),
    "BJ" -> List((1, 2), (2, 1), (3, 2), (9, 2), (12, 1)),
    "BK" -> List((1, 2), (2, 1), (3, 2), (5, 2), (12, 1)),
    "BL" -> List((1, 2), (2, 1), (3, 2), (18, 2), (12, 1)),
    "BM" -> List((1, 2), (2, 1), (3, 2), (9, 2), (19, 1)),
    "BN" -> List((1, 2), (2, 1), (3, 2), (9, 2), (20, 1)),
    "BO" -> List((1, 2), (21, 1), (3, 2), (40, 2), (22, 1)),
    "BP" -> List((1, 2), (2, 1), (3, 2), (9, 2), (20, 1)),
    "BQ" -> List((1, 2), (2, 1), (3, 2), (9, 2), (12, 1)),
    "BR" -> List((1, 2), (2, 1), (3, 2), (5, 2), (23, 1)),
    "BS" -> List((1, 2), (2, 1), (3, 2), (24, 2), (12, 1)),
    "BT" -> List((1, 2), (2, 1), (3, 2), (24, 2), (12, 1)),
    "BU" -> List((1, 2), (2, 1), (3, 2), (1, 2), (2, 1)),
    "BV" -> List((1, 2), (2, 1), (3, 2), (9, 2), (8, 1)),
    "BW" -> List((1, 2), (2, 1), (3, 2), (5, 2), (20, 1)),
    "BZ" -> List((1, 2), (2, 1), (3, 2), (9, 2), (12, 1)),
    "C" -> List((0, 1), (1, 2), (2, 1), (25, 2), (1, 2), (2, 1)),
    "D" -> List((26, 1), (1, 2), (2, 1), (3, 2), (27, 2), (0, 1)),
    "E" -> List((30, 1), (1, 2), (2, 1), (0, 2), (1, 2), (2, 1)),
    "G" -> List((29, 1), (1, 2), (2, 1), (3, 2), (1, 2), (2, 1)),
    "H" -> List((29, 1), (1, 2), (2, 1), (3, 2), (1, 2), (2, 1)),
    "I" -> List((29, 1), (1, 2), (2, 1), (3, 2), (1, 2), (2, 1)),
    "J" -> List((0, 1), (1, 2), (2, 1), (0, 2), (1, 2), (2, 1)),
    "K" -> List((0, 1), (1, 2), (2, 1), (3, 2), (1, 2), (2, 1)),
    "L" -> List((31, 1), (1, 2), (2, 1), (0, 1), (32, 4)),
    "M" -> List((29, 1), (1, 2), (2, 1), (25, 2), (1, 2), (2, 1)),
    "N" -> List((29, 1), (1, 2), (2, 1), (25, 2), (1, 2), (2, 1)),
    "O" -> List((29, 1), (1, 2), (2, 1), (25, 2), (1, 2), (2, 1)),
    "P" -> List((0, 1), (1, 2), (2, 1), (0, 2), (1, 2), (2, 1)),
    "Q" -> List((29, 1), (1, 2), (2, 1), (3, 2), (9, 2), (33, 1)),
    "S" -> List((26, 1), (1, 2), (2, 1), (3, 2), (0, 2), (0, 1)),
    "T" -> List((26, 1), (1, 2), (2, 1), (3, 2), (1, 2), (2, 1)),
    "VC" -> List((1, 2), (2, 1), (3, 2), (34, 2), (35, 1)),
    "VM" -> List((1, 2), (2, 1), (3, 2), (36, 2), (37, 1)),
    "W" -> List((38, 1), (1, 2), (2, 1), (3, 2), (5, 2), (12, 1)),
    "X" -> List((0, 1), (1, 2), (2, 1), (0, 1), (42, 4)),
    "Y" -> List((30, 1), (1, 2), (2, 1), (41, 2), (1, 2), (2, 1)),
    "Z" -> List((30, 1), (1, 2), (2, 1), (41, 2), (1, 2), (2, 1)),
    "=" -> List((39, 1), (1, 2), (2, 1), (3, 2), (0, 2), (0, 1))
  )

  /** Module types ordered longest-first so prefix matching is deterministic.
    * (No reference type is a prefix of another — "B"/"V" alone are not types —
    * so longest-first equals the reference's first-match semantics,
    * diary_module_parser.py:203-205, without Python-dict-order dependence.) */
  private val typesByLength: Array[String] =
    moduleZones.keys.toArray.sortBy(t => (-t.length, t))

  /** OCR-confusion prefix rewrites applied before type matching
    * (diary_module_parser.py:185-201), in the reference's sequential order —
    * INCLUDING its dead-rule quirks: because '8'→'B' fires first, '88'→'BB'
    * can never match ("88…" is already "B8…"); likewise 'O'/'0'→'D' makes
    * '05'/'O5'→'DS' unreachable ("05…" is already "D5…"). Both preserved
    * bit-exactly. A consequence: module type 'O' is dead — any raw string
    * starting with 'O' is rewritten to 'D…' before matching. */
  def rewritePrefix(s: String): String = {
    var m = s
    if (m.startsWith("8")) m = "B" + m.substring(1)
    if (m.startsWith("O") || m.startsWith("0")) m = "D" + m.substring(1)
    if (m.startsWith("B1")) m = "BI" + m.substring(2)
    if (m.startsWith("88")) m = "BB" + m.substring(2)
    if (m.startsWith("55")) m = "SS" + m.substring(2)
    if (m.startsWith("05") || m.startsWith("O5")) m = "DS" + m.substring(2)
    m
  }

  /** Hot-path type resolve: null = unrecognized. No Option wrapper — the
    * extraction loop calls this once per module (BENCH/BASELINE.md §3
    * allocation diet). */
  def moduleTypeOrNull(moduleStr: String): String = {
    val m = rewritePrefix(moduleStr)
    var i = 0
    while (i < typesByLength.length) { // no iterator/closure on the hot path
      if (m.startsWith(typesByLength(i))) return typesByLength(i)
      i += 1
    }
    null
  }

  /** Resolve the module type of a raw module string; None = unrecognized. */
  def moduleType(moduleStr: String): Option[String] =
    Option(moduleTypeOrNull(moduleStr))

  /** Allocation-free zone-layout lookup (immutable Map.get allocates a Some
    * per call; the extraction loop does one lookup per module). */
  private val zonesByType: java.util.HashMap[String, List[(Int, Int)]] = {
    val m = new java.util.HashMap[String, List[(Int, Int)]]()
    moduleZones.foreach { case (k, v) => m.put(k, v) }
    m
  }
  def zonesFor(tpe: String): List[(Int, Int)] = zonesByType.get(tpe)

  // char fixes as unboxed match functions + copy-on-write application: the
  // parse path calls these per zone on mostly-clean input; `String.map` over
  // a Map[Char, Char] would box every char AND allocate a new string even
  // when nothing changes (measured ~1.8 KB/turn in the parse stage)
  private def digitFixChar(c: Char): Char = (c: @annotation.switch) match {
    case 'O' => '0'; case 'Z' => '2'; case 'S' => '5'; case 'G' => '6'
    case 'T' => '7'; case _ => c
  }
  private def alphaFixChar(c: Char): Char = (c: @annotation.switch) match {
    case '2' => 'Z'; case '6' => 'G'; case '8' => 'B'; case '0' => 'O'
    case '1' => 'I'; case _ => c
  }

  /** Apply a char fix copy-on-write: returns the SAME string when clean. */
  private def mapCharsCow(s: String, f: Char => Char): String = {
    val n = s.length
    var i = 0
    while (i < n && f(s.charAt(i)) == s.charAt(i)) i += 1
    if (i == n) return s
    val arr = s.toCharArray
    while (i < n) { arr(i) = f(arr(i)); i += 1 }
    new String(arr)
  }

  /** Catalog-3 (places) bigram + char fixes — diary_module_parser.py:82-85.
    * The reference stores these in one Python dict (hash iteration order);
    * here single-char rewrites apply first, then bigrams — the only order
    * under which every mapping in the table is reachable (char-fix '0'→'O'
    * after bigram '5O'→'50' would undo it). Note the reference dict literal
    * repeats key '5O' ('SO' then '50'); last wins. */
  private val placesBigrams: List[(String, String)] = List(
    "NE" -> "ME", "NI" -> "MI", "NO" -> "MO", "OR" -> "QR", "OU" -> "QU",
    "U5" -> "US", "5I" -> "SI", "5L" -> "SL", "5O" -> "50", "8C" -> "BC",
    "T8" -> "TB", "OF" -> "DF", "6T" -> "GT", "VU" -> "YU"
  )
  private def placesChar(c: Char): Char = (c: @annotation.switch) match {
    case '0' => 'O'; case '1' => 'I'; case _ => c
  }

  // membership as Boolean arrays: Set[Int].contains boxes its argument on
  // every call, and these run once per zone in the extraction loop
  private val digitCatalogs: Array[Boolean] = {
    val a = new Array[Boolean](64)
    Seq(2, 5, 6, 7, 8, 9, 10, 11, 12, 13, 16, 17, 18, 19, 20, 21, 22, 23, 24,
      33, 34, 35, 36, 37, 40).foreach(a(_) = true)
    a
  }
  private val alphaCatalogs: Array[Boolean] = {
    val a = new Array[Boolean](64)
    Seq(29, 31, 39).foreach(a(_) = true)
    a
  }

  /** Per-catalog confusion fix (diary_module_parser.py:81-114,292-298). */
  def fixKnownIssues(catalogId: Int, zoneStr: String): String = {
    if (catalogId == 3) {
      val afterChars = mapCharsCow(zoneStr, placesChar)
      // java.lang.String.replace returns `this` when the target is absent —
      // the fold stays allocation-free on clean input
      placesBigrams.foldLeft(afterChars) { case (s, (bad, good)) =>
        s.replace(bad, good)
      }
    } else if (catalogId >= 0 && catalogId < 64 && digitCatalogs(catalogId)) {
      mapCharsCow(zoneStr, digitFixChar)
    } else if (catalogId >= 0 && catalogId < 64 && alphaCatalogs(catalogId)) {
      mapCharsCow(zoneStr, alphaFixChar)
    } else zoneStr
  }

  private def yearFixChar(c: Char): Char = (c: @annotation.switch) match {
    case 'O' => '0'; case 'S' => '5'; case 'I' => '1'; case 'G' => '6'
    case _ => c
  }

  /** Year confusion fix (diary_module_parser.py:253-255). */
  def fixYear(s: String): String = mapCharsCow(s, yearFixChar)

  private def entityFixChar(c: Char): Char = (c: @annotation.switch) match {
    case '_' => '0'; case 'O' => '0'; case _ => c
  }

  /** Entity-FK confusion fix (diary_module_parser.py:270-271). */
  def fixEntityId(s: String): String = mapCharsCow(s, entityFixChar)
}
