package graft.retrieval

import graft.temporal.Temporal
import graft.temporal.Temporal._

/** Deterministic temporal-context parsing (reference
  * retrieval/temporal_retrieval.py:149-219 — the regex/keyword fallback
  * branch; the LLM branch is out of scope per SURVEY §7.4.1).
  *
  * Rules preserved: temporal keywords table (162-167), year regex
  * \b(19|20)\d{2}\b; exactly one year → POINT_IN_TIME at that year; two or
  * more years → TIME_RANGE min..max; keywords with no year → LATEST for
  * "latest/current/now/recent", HISTORY for "history/over time/evolution".
  */
object TemporalParse {

  final case class TemporalContext(
      hasTemporalReference: Boolean,
      filter: Option[TemporalFilter],
      keywords: Seq[String],
      phrase: String)

  private val latestWords =
    Seq("latest", "current", "currently", "now", "recent", "today")
  private val historyWords =
    Seq("history", "historical", "over time", "evolution", "evolved",
      "changed", "trend")
  private val rangeWords = Seq("between", "from", "since", "until", "through")
  private val yearRe = """\b(19|20)\d{2}\b""".r
  private val quarterRe = """(?i)\bQ([1-4])\b""".r

  def parse(query: String): TemporalContext = {
    val lower = query.toLowerCase
    val years = yearRe.findAllIn(query).toSeq.map(_.toInt).distinct.sorted
    val quarters = quarterRe.findAllMatchIn(query).map(m => s"Q${m.group(1)}")
      .toSeq.distinct
    val kws = (latestWords ++ historyWords ++ rangeWords)
      .filter(lower.contains)

    val filter =
      if (years.size >= 2)
        Some(TemporalFilter(TimeRange,
          startYear = Some(years.min), endYear = Some(years.max)))
      else if (years.size == 1)
        Some(TemporalFilter(PointInTime, fiscalYear = Some(years.head),
          fiscalQuarter = quarters.headOption))
      else if (kws.exists(historyWords.contains))
        Some(TemporalFilter(History))
      else if (kws.exists(latestWords.contains))
        Some(TemporalFilter(Temporal.Latest))
      else None

    TemporalContext(filter.nonEmpty, filter, kws, query)
  }
}
