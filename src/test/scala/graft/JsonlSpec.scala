package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.JsonlCorpus

class JsonlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private lazy val path: String = {
    val dir = Files.createTempDirectory("graft-jsonl")
    val f = dir.resolve("corpus.jsonl")
    val lines = Seq(
      """{"company_name":"Acme Corp","stock_code":"ACME","sector":"Tech","year":2023,"quarter":"Q1","transcript":"Acme grew revenue twelve percent this quarter.","url":"u1"}""",
      """{"company_name":"Acme Corp","stock_code":"ACME","sector":"Tech","year":2023,"quarter":"Q2","transcript":"Margins expanded again.","url":"u2"}""",
      """{"company_name":"Zeta Inc","stock_code":"ZETA","sector":"Retail","year":2023,"quarter":"Q1","transcript":"Zeta opened ten stores.","url":"u3"}""",
      """this line is not json at all""",
      """{"company_name":"Zeta Inc","stock_code":"ZETA","sector":"Retail","year":2024,"quarter":"Q4","transcript":"Holiday quarter was strong.","url":"u4"}""")
    Files.writeString(f, lines.mkString("\n"))
    f.toString
  }

  test("loads records, splits corrupt lines, derives title/date/doc_id") {
    val (good, corrupt) = JsonlCorpus.load(spark, path)
    assert(good.count() === 4)
    assert(corrupt.count() === 1)
    val acmeQ1 = good.where(col("quarter") === "Q1" && col("stock_code") === "ACME").head()
    assert(acmeQ1.getAs[String]("title") === "Acme Corp (ACME) - Q1 2023 Earnings Call")
    assert(acmeQ1.getAs[java.sql.Date]("created_at").toString === "2023-03-31")
    val q4 = good.where(col("quarter") === "Q4").head()
    assert(q4.getAs[java.sql.Date]("created_at").toString === "2024-12-31")
    assert(good.select("doc_id").distinct().count() === 4)
  }

  test("filters: sector, year, quarter, stock code, limit") {
    assert(JsonlCorpus.load(spark, path,
      JsonlCorpus.Filters(sector = Some("Tech")))._1.count() === 2)
    assert(JsonlCorpus.load(spark, path,
      JsonlCorpus.Filters(year = Some(2024)))._1.count() === 1)
    assert(JsonlCorpus.load(spark, path,
      JsonlCorpus.Filters(stockCode = Some("ZETA"), quarter = Some("Q1")))._1.count() === 1)
    // limit is the DETERMINISTIC first-N in file order (round-5 review
    // finding: it used to keep an arbitrary-arrival subset), so at N=2 it
    // must be exactly the first two good records, u1 and u2
    val limited = JsonlCorpus.load(spark, path,
      JsonlCorpus.Filters(limit = Some(2)))._1
    assert(limited.select("url").collect().map(_.getString(0)).toSet ===
      Set("u1", "u2"))
  }

  test("stats aggregates counts, companies and token sums per group") {
    val (good, _) = JsonlCorpus.load(spark, path)
    val s = JsonlCorpus.stats(good).collect()
      .map(r => (r.getAs[String]("sector"), r.getAs[Int]("year"),
        r.getAs[String]("quarter")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_companies"),
          r.getAs[Long]("total_tokens"))).toMap
    assert(s(("Tech", 2023, "Q1")) === ((1L, 1L, 7L)))
    assert(s(("Retail", 2023, "Q1")) === ((1L, 1L, 4L)))
    assert(s.size === 4)
  }
}
