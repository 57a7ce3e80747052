package graft.fixtures

/** Versioned extraction dictionaries (FIXTURES.md §2).
  *
  * The reference's NER and relation extraction are LLM calls
  * (entity_extractor.py:156-272, relation_extractor.py:124-235); per the
  * north_star they are re-expressed deterministically as a gazetteer /
  * dictionary NER plus a pattern table. These fixtures are part of the repo
  * and shared by the synthetic-corpus generator, the Spark engine, and the
  * serial oracle.
  */
object Fixtures {

  /** One gazetteer entry: surface form → entity type. Aliases of the same
    * underlying entity are separate surfaces (linking merges them).
    */
  final case class GazEntry(surface: String, tpe: String)

  private val orgPrefixes = Vector(
    "Skyline", "Nova", "Quantum", "Vertex", "Atlas", "Orion", "Pinnacle",
    "Cascade", "Summit", "Aurora", "Zenith", "Meridian", "Halcyon",
    "Stellar", "Crimson", "Harborline", "Granite", "Falconer", "Evergreen",
    "Silverline", "Northwind", "Bluepeak", "Ironclad", "Lumen", "Vanguard")

  private val orgSuffixes = Vector(
    "Systems", "Industries", "Technologies", "Holdings", "Dynamics",
    "Networks", "Capital", "Energy", "Logistics", "Biosciences")

  /** 30 canonical org base names, e.g. "Skyline Systems". */
  val orgBases: Vector[String] =
    (0 until 30).map(i => s"${orgPrefixes(i % 25)} ${orgSuffixes(i * 7 % 10)}").toVector

  /** Alias surfaces per org: base, base Inc., base Co. — suffix-stripped
    * forms per relation_extractor.py:357-374 so linking collapses them.
    */
  def orgAliases(base: String): Vector[String] =
    Vector(base, base + " Inc.", base + " Co.")

  private val firstNames = Vector(
    "Maria", "Daniel", "Ingrid", "Kenji", "Amara", "Lucas", "Priya",
    "Tomas", "Yuki", "Elena", "Marcus", "Sofia")
  private val lastNames = Vector(
    "Alvarez", "Okafor", "Lindqvist", "Tanaka", "Novak", "Marchetti",
    "Deshpande", "Keller", "Abebe", "Costa", "Whitfield", "Ferreira")

  /** 24 persons, each with a middle-initial alias variant. */
  val personBases: Vector[String] =
    (0 until 24).map(i => s"${firstNames(i % 12)} ${lastNames((i * 5 + i / 12) % 12)}").toVector

  def personAliases(base: String): Vector[String] = {
    val parts = base.split(" ")
    Vector(base, s"${parts(0)} ${parts(1)(0)}. ${parts(1)}")
  }

  val locations: Vector[String] = Vector(
    "Austin", "Dublin", "Singapore", "Toronto", "Munich", "Osaka",
    "Denver", "Lisbon", "Oslo", "Seattle", "Atlanta", "Madrid",
    "Zurich", "Sydney", "Nairobi", "Boston")

  val products: Vector[String] = Vector(
    "VoltEdge", "SkyTrace", "OmniGrid", "FlexCore", "TrueNorth Suite",
    "PulseMetric", "EchoFrame", "GridWorks", "ClearPath Analytics",
    "HyperWeave", "BrightLedger", "FormaCast")

  val events: Vector[String] = Vector(
    "the Global Tech Summit", "the Annual Shareholder Meeting",
    "the FinTech Expo", "the Supply Chain Forum", "the AI World Congress",
    "the Energy Innovation Conference", "the Developer Days",
    "the Capital Markets Day")

  val facilities: Vector[String] = Vector(
    "the Riverside Plant", "the Midtown Data Center",
    "the Eastport Warehouse", "the Lakeview Campus",
    "the Northgate Lab", "the Harborview Office")

  val groups: Vector[String] = Vector(
    "the Engineering Division", "the Sales Team", "the Audit Committee",
    "the Research Group", "the Advisory Board", "the Operations Unit")

  /** The full gazetteer: every surface form with its type. */
  val gazetteer: Vector[GazEntry] = {
    val orgs = orgBases.flatMap(b => orgAliases(b).map(GazEntry(_, "ORGANIZATION")))
    val persons = personBases.flatMap(b => personAliases(b).map(GazEntry(_, "PERSON")))
    val locs = locations.map(GazEntry(_, "LOCATION"))
    val prods = products.map(GazEntry(_, "PRODUCT"))
    val evs = events.map(GazEntry(_, "EVENT"))
    val facs = facilities.map(GazEntry(_, "FACILITY"))
    val grps = groups.map(GazEntry(_, "GROUP"))
    (orgs ++ persons ++ locs ++ prods ++ evs ++ facs ++ grps).distinct
  }

  /** One relation pattern: the normalized infix between two adjacent
    * mentions in a sentence, the predicate label it emits (1-4 words, per
    * models/entity.py:156), and required subject/object entity types.
    */
  final case class RelPattern(
      infix: String, pred: String, subjType: String, objType: String)

  val patterns: Vector[RelPattern] = Vector(
    RelPattern("acquired", "acquired", "ORGANIZATION", "ORGANIZATION"),
    RelPattern("partnered with", "partnered with", "ORGANIZATION", "ORGANIZATION"),
    RelPattern("invested in", "invested in", "ORGANIZATION", "ORGANIZATION"),
    RelPattern("competes with", "competes with", "ORGANIZATION", "ORGANIZATION"),
    RelPattern(", chief executive officer of", "ceo of", "PERSON", "ORGANIZATION"),
    RelPattern("was appointed chief financial officer of", "cfo of", "PERSON", "ORGANIZATION"),
    RelPattern("joined", "joined", "PERSON", "ORGANIZATION"),
    RelPattern("launched", "launched", "ORGANIZATION", "PRODUCT"),
    RelPattern("unveiled", "unveiled", "ORGANIZATION", "PRODUCT"),
    RelPattern("opened a new facility in", "opened facility in", "ORGANIZATION", "LOCATION"),
    RelPattern("is headquartered in", "headquartered in", "ORGANIZATION", "LOCATION"),
    RelPattern("reported revenue of", "reported revenue", "ORGANIZATION", "MONEY"),
    RelPattern("presented at", "presented at", "PERSON", "EVENT"),
    RelPattern("sponsored", "sponsored", "ORGANIZATION", "EVENT"),
    RelPattern("commissioned", "commissioned", "ORGANIZATION", "FACILITY"),
    RelPattern("restructured", "restructured", "ORGANIZATION", "GROUP"))

  val patternByInfix: Map[String, RelPattern] =
    patterns.map(p => p.infix -> p).toMap

  /** Filler vocabulary for synthetic sentences. */
  val fillerWords: Vector[String] = Vector(
    "revenue", "growth", "margin", "guidance", "outlook", "quarter",
    "demand", "supply", "market", "segment", "performance", "capital",
    "expenses", "operating", "results", "strategy", "momentum", "pipeline",
    "headwinds", "tailwinds", "forecast", "investment", "expansion",
    "efficiency", "customers", "bookings", "backlog", "adjusted",
    "earnings", "consolidated")

  val sectors: Vector[String] = Vector(
    "Technology", "Energy", "Healthcare", "Industrials", "Financials")

  val mediaKinds: Vector[String] = Vector("image", "audio", "video", "table")
}
