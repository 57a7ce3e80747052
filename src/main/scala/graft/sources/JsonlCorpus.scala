package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ECT-QA-style JSONL corpus source (reference ingestion/ectqa_loader.py):
  * a streaming JSONL reader with per-record filters, limit, malformed-line
  * accounting, title/metadata derivation and quarter-end dates —
  * re-expressed as one `spark.read.schema(...).json` with PERMISSIVE
  * corrupt-record capture (the distributed equivalent of the reference's
  * per-line try/except skip counting, ectqa_loader.py:88-119).
  */
object JsonlCorpus {

  /** Record shape of the corpus (ectqa_loader.py:142-200). */
  val schema: StructType = StructType(Seq(
    StructField("company_name", StringType),
    StructField("stock_code", StringType),
    StructField("sector", StringType),
    StructField("year", IntegerType),
    StructField("quarter", StringType),
    StructField("transcript", StringType),
    StructField("url", StringType),
    StructField("_corrupt_record", StringType)))

  final case class Filters(
      sector: Option[String] = None,
      year: Option[Int] = None,
      quarter: Option[String] = None,
      stockCode: Option[String] = None,
      limit: Option[Int] = None)

  /** Quarter → period-end month/day map (ectqa_loader.py:202-242 /
    * pipeline.py:256-264: Q1→Mar 31, Q2→Jun 30, Q3→Sep 30, Q4→Dec 31).
    */
  def quarterEnd(year: org.apache.spark.sql.Column,
      quarter: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    last_day(make_date(year,
      regexp_extract(quarter, "\\d", 0).cast("int") * 3, lit(1)))

  /** Load + filter + derive. Malformed lines land in `_corrupt_record` and
    * are split out; `corrupt` carries them for skip accounting.
    */
  def load(spark: SparkSession, path: String,
      filters: Filters = Filters()): (DataFrame, DataFrame) = {
    val raw = spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      // one pass feeds both the good and the corrupt split. The cache is
      // session-lifetime (both returned frames are lazy, so no in-function
      // unpersist is possible) — callers doing repeated loads in one
      // long-lived session should unpersist via the returned frames or
      // clearCache() between loads
      .cache()
    val corrupt = raw.where(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record"))
    var good = raw.where(col("_corrupt_record").isNull).drop("_corrupt_record")
    filters.sector.foreach(s => good = good.where(col("sector") === s))
    filters.year.foreach(y => good = good.where(col("year") === y))
    filters.quarter.foreach(q => good = good.where(col("quarter") === q))
    filters.stockCode.foreach(c => good = good.where(col("stock_code") === c))
    // the reference's limit is "first N records in FILE order"
    // (ectqa_loader's sequential per-line loop); a bare DataFrame.limit on
    // a multi-split read keeps whichever N rows arrive first and varies
    // with parallelism. monotonically_increasing_id is ordered by
    // (partition index, in-partition position) and the JSON reader's
    // partitions follow file-split order, so sorting on it realizes the
    // reference's deterministic prefix
    filters.limit.foreach { n =>
      good = good.withColumn("_ord", monotonically_increasing_id())
        .orderBy(col("_ord")).limit(n).drop("_ord")
    }
    val derived = good
      .withColumn("title", concat(col("company_name"), lit(" ("),
        col("stock_code"), lit(") - "), col("quarter"), lit(" "),
        col("year"), lit(" Earnings Call")))
      .withColumn("created_at", quarterEnd(col("year"), col("quarter")))
      .withColumn("doc_id",
        sha2(concat_ws("|", col("stock_code"), col("year"), col("quarter")), 256))
    (derived, corrupt)
  }

  /** Deterministic ECT-QA-shaped JSONL fixture (synthesized from the same
    * seed-driven corpus generator — no external data): nDocs good records
    * plus a malformed line every 97 records, exercising the PERMISSIVE
    * corrupt-record split exactly like the reference's per-line try/except
    * (ectqa_loader.py:88-119). Content is a pure function of (nDocs, seed),
    * so the Spark query and the driver's DuckDB `read_json` oracle read
    * byte-identical files; the path is content-versioned so a generator
    * change can never silently reuse a stale file.
    */
  def fixturePath(nDocs: Int, seed: Long): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_ectqa_v1_${nDocs}_$seed.jsonl"

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  def writeFixture(nDocs: Int, seed: Long): String = {
    val path = fixturePath(nDocs, seed)
    val f = new java.io.File(path)
    if (!f.exists()) {
      val tmp = new java.io.File(
        path + ".tmp." + ProcessHandle.current().pid())
      val w = new java.io.PrintWriter(tmp, "UTF-8")
      try {
        graft.synth.CorpusSynth.serial(nDocs, seed).zipWithIndex.foreach {
          case ((d, m), i) =>
            if (i % 97 == 13) w.println(s"CORRUPT LINE $i :: not json {")
            val transcript =
              d.spans.filter(_.kind == "text").map(_.text).mkString(" ")
            w.println(
              s"""{"company_name":${jsonStr(m.company_name)},""" +
                s""""stock_code":${jsonStr(m.stock_code)},""" +
                s""""sector":${jsonStr(m.sector)},""" +
                s""""year":${m.year},"quarter":${jsonStr(m.quarter)},""" +
                s""""transcript":${jsonStr(transcript)},""" +
                s""""url":${jsonStr(m.url)}}""")
        }
      } finally w.close()
      // rename is atomic on the same filesystem; a concurrent writer
      // produced identical bytes, so either winner is correct
      if (!tmp.renameTo(f) && !f.exists())
        sys.error(s"could not materialize JSONL fixture at $path")
    }
    path
  }

  /** Dataset stats (ectqa_loader.py:244-305): counts by sector / year /
    * quarter, distinct companies, token sum — one pass, grouping sets.
    */
  def stats(corpus: DataFrame): DataFrame =
    corpus
      .withColumn("n_tokens",
        size(split(trim(col("transcript")), "\\s+")))
      .groupBy(col("sector"), col("year"), col("quarter"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("stock_code")).as("n_companies"),
        sum(col("n_tokens")).as("total_tokens"))
}
