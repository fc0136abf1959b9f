package graft.core

/** The 35 dimension catalogs.
  *
  * Same shapes as the reference's catalog tables
  * (/root/reference/src/catalogs_data.py:7-43: id-keyed small dimensions,
  * first header column is the key), values synthesized deterministically —
  * no data is copied from the reference corpus.
  *
  * Every synthesized key is a fixed point of `Grammar.fixKnownIssues` for its
  * catalog (true dimension keys are what the OCR-confusion maps repair
  * *towards*), so confusion-corrupted fixture inputs round-trip to a hit.
  */
object Catalogs {

  /** catalogId -> (name, keyWidth). Widths are the zone widths each catalog is
    * used with in Grammar.moduleZones (diary_module_parser.py:27-75). */
  val descriptions: Map[Int, (String, Int)] = Map(
    2 -> ("months", 1),
    3 -> ("places", 2),
    5 -> ("occupations", 2),
    6 -> ("return_active", 1),
    7 -> ("local_factions", 2),
    8 -> ("public_actions", 1),
    9 -> ("cities", 2),
    10 -> ("cultural_levels", 1),
    11 -> ("school_types", 1),
    12 -> ("political_trends", 1),
    13 -> ("fam_political_trends", 1),
    14 -> ("richness", 1),
    16 -> ("schools", 2),
    17 -> ("academic_statuses", 1),
    18 -> ("geographical_orientation", 2),
    19 -> ("death_causes", 1),
    20 -> ("locality_types", 1),
    21 -> ("religions", 1),
    22 -> ("ethnics", 1),
    23 -> ("retirement_causes", 1),
    24 -> ("trends_belonging", 2),
    25 -> ("ministries", 2),
    26 -> ("parliamentarians", 1),
    29 -> ("political_trends_29", 1),
    30 -> ("charge_characteristics", 1),
    31 -> ("personal_links", 1),
    33 -> ("political_positions", 1),
    34 -> ("social_movements", 2),
    35 -> ("collective_events", 1),
    36 -> ("content_measures", 2),
    37 -> ("measure_types", 1),
    38 -> ("military_rank_precisions", 1),
    39 -> ("careers", 1),
    40 -> ("recognised_child", 2),
    41 -> ("military_divisions", 2)
  )

  private val digitAlphabet = "0123456789"
  private val letterAlphabet = "ABCDEFGHIJKLMNPQRSTUVWXYZ" // no 'O' (confusable)

  /** Catalogs keyed by letter codes (like the reference's places/careers);
    * the rest are digit-keyed (like months/cities ids). */
  private val letterKeyed: Set[Int] = Set(3, 26, 29, 30, 31, 39)

  /** Deterministic candidate key stream for a catalog. */
  private def candidates(id: Int, width: Int): Iterator[String] = {
    val alphabet = if (letterKeyed(id)) letterAlphabet else digitAlphabet
    width match {
      case 1 => ("_" + alphabet).iterator.map(_.toString)
      case 2 =>
        Iterator("__") ++ (for {
          a <- alphabet.iterator
          b <- alphabet
        } yield s"$a$b")
    }
  }

  /** Number of keys synthesized per catalog (small dimensions, like the
    * reference's hand-curated CSVs). */
  private def sizeFor(width: Int): Int = if (width == 1) 9 else 33

  /** catalogId -> ordered key list (deterministic). */
  val keys: Map[Int, Vector[String]] = descriptions.map { case (id, (_, width)) =>
    val ks = candidates(id, width)
      .filter(k => Grammar.fixKnownIssues(id, k) == k) // fixed points only
      .take(sizeFor(width))
      .toVector
    id -> ks
  }

  /** catalogId -> key -> value row (synthesized description string). */
  val tables: Map[Int, Map[String, String]] = descriptions.map { case (id, (name, _)) =>
    id -> keys(id).map(k => k -> s"${name}_$k").toMap
  }

  /** Lookup with the catalog-27-aliases-9 rule (diary_module_parser.py:227-228)
    * applied by the caller; this is the raw probe. */
  def lookup(catalogId: Int, key: String): Option[String] =
    tables.get(catalogId).flatMap(_.get(key))

  // array-indexed presence probe for the hot parse path: no Option chain,
  // no per-probe allocation (tables is compile-time data, ids are small)
  private val tableArr: Array[Map[String, String]] = {
    val maxId = tables.keys.max
    val arr = new Array[Map[String, String]](maxId + 1)
    tables.foreach { case (id, m) => arr(id) = m }
    arr
  }

  /** Allocation-free membership probe (the J1 validation test). */
  def contains(catalogId: Int, key: String): Boolean =
    catalogId >= 0 && catalogId < tableArr.length && {
      val m = tableArr(catalogId)
      m != null && m.contains(key)
    }

  /** A deterministic key that is guaranteed NOT to be in catalog `id` and is a
    * fixed point of the confusion map (used by fixtures to provoke
    * INVALID_VALUE_ON_ZONE). */
  def missKey(id: Int): String = {
    val width = descriptions(id)._2
    val present = keys(id).toSet
    candidates(id, width)
      .filter(k => Grammar.fixKnownIssues(id, k) == k && !present.contains(k))
      .next()
  }
}
