package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.DocLoader

/** File-format loader contract (reference ingestion/document_loader.py):
  * each decoder verified against the fixture generator's independently
  * derived expected text (generator arithmetic vs engine parsing — the
  * same two-sided contract the Verify gate replays through DuckDB), plus
  * unit cases for the parser edges the corpus fixture cannot hit.
  */
class DocLoaderSpec extends AnyFunSuite {

  // ---- unit: text decode (document_loader.py:202-227) -----------------

  test("decodeText: strict UTF-8, latin-1 fallback on malformed bytes") {
    val utf8 = "naïve — résumé ✓"
    assert(DocLoader.decodeText(utf8.getBytes(StandardCharsets.UTF_8)) === utf8)
    val latin = "Résumé attaché"
    val bytes = latin.getBytes(StandardCharsets.ISO_8859_1)
    // 0xE9 alone is malformed UTF-8 → byte-transparent latin-1 readback
    assert(DocLoader.decodeText(bytes) === latin)
  }

  // ---- unit: HTML get_text contract (document_loader.py:169-200) ------

  test("htmlToText: tags are node boundaries, script/style/comments drop") {
    val html =
      """<html><head><title>T</title>
        |<style>p { color: red; }</style>
        |<script>if (1 < 2) alert("x");</script>
        |</head><body><!-- nav -->
        |<h1>A &amp; B</h1><p>first</p>
        |<div>x<b>y</b>z</div>
        |</body></html>""".stripMargin
    assert(DocLoader.htmlToText(html) === "T\nA & B\nfirst\nx\ny\nz")
  }

  test("htmlToText: entity decode is single-pass (no double decode)") {
    // &amp;lt; must become the literal "&lt;", not "<"
    assert(DocLoader.htmlToText("<p>&amp;lt;</p>") === "&lt;")
    // numeric refs decode; an INTERNAL nbsp survives (only edges strip)
    assert(DocLoader.htmlToText("<p>&#65;&#x42;&nbsp;C</p>") === "AB\u00a0C")
    assert(DocLoader.htmlToText("<p>x&#65;y</p>") === "xAy")
    assert(DocLoader.htmlToText("<p>x&#x42;y</p>") === "xBy")
  }

  test("htmlToText: NBSP-only nodes drop (Python strip() parity)") {
    assert(DocLoader.htmlToText("<p>&nbsp;</p><p>a</p>") === "a")
  }

  test("decodeEntities: full HTML4 named set (pinning the chosen subset)") {
    // real-world names the synthetic fixture never contains — the exact
    // divergence ADVICE r4 flagged; BS4 decodes all of these
    assert(DocLoader.htmlToText("<p>caf&eacute; &mdash; d&eacute;j&agrave; vu&hellip;</p>")
      === "café — déjà vu…")
    assert(DocLoader.htmlToText("<p>&copy; 2026 &middot; 5&nbsp;&euro; &ndash; &frac12;&deg;</p>")
      === "© 2026 · 5 € – ½°")
    assert(DocLoader.htmlToText("<p>&ldquo;x&rdquo; &rsquo; &alpha;&Omega; &le;&ne;&infin;</p>")
      === "“x” ’ αΩ ≤≠∞")
    // the table is the complete HTML 4.01 set: 96 latin-1 + markup/symbol
    assert(DocLoader.NamedEntities.size === 253) // 252 HTML4 + apos
    assert(DocLoader.NamedEntities("thetasym") === "ϑ")
    // lang/rang pin the HTML5 code points (U+27E8/U+27E9) — what the
    // reference's BeautifulSoup decodes — not HTML4's U+2329/U+232A
    assert(DocLoader.NamedEntities("lang") === "⟨")
    assert(DocLoader.NamedEntities("rang") === "⟩")
    // unknown names (HTML5-only) pass through untouched — documented gap
    assert(DocLoader.htmlToText("<p>a&langle;b</p>") === "a&langle;b")
  }

  // ---- unit: markdown → HTML → text (document_loader.py:142-167) ------

  test("markdownToText: headings, inline markup, lists, quotes, fences") {
    val md =
      """# Title
        |
        |Plain paragraph with **bold** and a [link](https://x.invalid).
        |
        |- item one
        |> quoted
        |
        |```
        |code line 1
        |code line 2
        |```""".stripMargin
    val got = DocLoader.markdownToText(md)
    // inline markup introduces node boundaries exactly like
    // markdown.markdown + BeautifulSoup.get_text("\n", strip=True)
    assert(got ===
      "Title\nPlain paragraph with\nbold\nand a\nlink\n.\nitem one\nquoted\ncode line 1\ncode line 2")
  }

  // ---- unit: PDF (document_loader.py:104-140) --------------------------

  test("contentStreamText: Tj, TJ arrays, escapes, nested parens") {
    val cs = "BT (a\\(b\\)c) Tj [(x) -250 (y)] TJ ((nested)) Tj ET"
    assert(DocLoader.contentStreamText(cs) === "a(b)c\nxy\n(nested)")
  }

  test("pdfToText: rejects a non-PDF buffer") {
    val e = intercept[IllegalArgumentException] {
      DocLoader.pdfToText("GIF89a not a pdf".getBytes)
    }
    assert(e.getMessage.contains("%PDF-"))
  }

  test("pdfToText: tolerates one corrupt stream, keeps the rest VERBATIM") {
    // pick a fixture pdf with >= 2 pages so the tolerance path is actually
    // exercised (a 1-page doc would make every assertion vacuous), then
    // truncate the FIRST stream's deflate data in place (keep /Length so
    // the slice is wrong-but-in-bounds)
    val f = DocLoader.genFiles(60, seed = 5L)
      .find(x => x.ext == "pdf" && x.expectedText.contains("\n\n"))
      .getOrElse(fail("fixture generator produced no multi-page pdf"))
    val expectedPages = f.expectedText.split("\n\n")
    assert(expectedPages.length >= 2)
    val s = new String(f.bytes, StandardCharsets.ISO_8859_1)
    val at = s.indexOf("stream\n") + "stream\n".length
    val corrupted = f.bytes.clone()
    // zero 8 bytes of deflate payload → that stream fails, others survive
    (at until math.min(at + 8, corrupted.length)).foreach(corrupted(_) = 0)
    val got = DocLoader.pdfToText(corrupted)
    // page 1 is lost; the SURVIVING pages come back byte-identical — the
    // reference's per-page try/except keeps good pages untouched
    // (document_loader.py:123-129)
    assert(got === expectedPages.tail.mkString("\n\n"))
    assert(!got.contains(expectedPages.head.linesIterator.next()))
  }

  test("pdfToText: malformed xref table does not affect extraction") {
    // the extractor scans object streams directly and never trusts xref;
    // a real-world PDF with a corrupt xref (the classic salvage case —
    // PdfReader(strict=False) territory) must still yield every page.
    // The fixture's streams mix Tj, TJ kerning arrays and escaped parens,
    // so all three text-operator paths run through the salvage too.
    val f = DocLoader.genFiles(60, seed = 5L)
      .find(x => x.ext == "pdf" && x.expectedText.contains("\n\n")).get
    val s = new String(f.bytes, StandardCharsets.ISO_8859_1)
    val xrefAt = s.lastIndexOf("xref")
    assert(xrefAt > 0)
    val corrupted = f.bytes.clone()
    // scramble the whole xref entry block (offsets become garbage digits)
    ((xrefAt + 4) until math.min(xrefAt + 64, corrupted.length))
      .foreach(corrupted(_) = '9'.toByte)
    assert(DocLoader.pdfToText(corrupted) === f.expectedText)
  }

  // ---- generator-vs-parser round trip over the whole fixture ----------

  test("all fixture files decode to the generator-derived expected text") {
    val files = DocLoader.genFiles(200, seed = 11L)
    assert(files.count(_.ext == "pdf") === 50)
    assert(files.count(_.ext == "md") === 50)
    assert(files.count(_.ext == "html") === 50)
    assert(files.count(_.ext == "txt") === 50)
    files.foreach { f =>
      if (f.expectedError != null) {
        val e = intercept[RuntimeException](DocLoader.decodeFile(f.ext, f.bytes))
        assert(e.getMessage === f.expectedError, f.filename)
      } else {
        val got = DocLoader.decodeFile(f.ext, f.bytes)
        assert(got === f.expectedText,
          s"${f.filename}: parsed text diverged from generator derivation")
      }
    }
  }

  // ---- Spark surface: binaryFile scan + narrow decode ------------------

  test("load: distributed decode matches expectedRows exactly") {
    val spark = SparkTestBase.spark
    val n = 60
    val dir = DocLoader.writeFixture(n, seed = 13L)
    val got = DocLoader.load(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        Option(r.getString(3)), Option(r.getString(4))))
      .sortBy(_._1)
    val want = DocLoader.expectedRows(n, seed = 13L)
      .map(t => (t._1, t._2, t._3, Option(t._4), Option(t._5)))
      .sortBy(_._1)
    assert(got.length === want.length)
    got.zip(want).foreach { case (g, w) => assert(g === w, g._1) }
  }

  test("asCorpus: loaded files chunk through the ingestion chunker") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val dir = DocLoader.writeFixture(40, seed = 13L)
    val loaded = DocLoader.load(spark, dir)
    val corpus = DocLoader.asCorpus(loaded)
    // 40 good files (the .dat error row drops), spans-table shape
    assert(corpus.count() === 40)
    assert(corpus.columns.toSeq === Seq("doc_id", "spans"))
    // file-derived sidecar metadata (the reference fills Document.metadata
    // from filename/size for file-sourced docs, document_loader.py:33-60)
    val docs = corpus.as[graft.core.Schema.DocRow]
    val metas = docs.map(d => graft.core.Schema.DocMeta(
      d.doc_id, "", "", "", 2000, "Q4", d.doc_id, 0))
    val chunked = graft.ingest.SpanChunker.chunk(spark, docs, metas,
      graft.ingest.SpanChunker.Config(120, 20))
    assert(chunked.count() > 0)
    // span preservation: reassembled chunk spans == the input span list
    val perDoc = chunked.groupBy("doc_id").count()
    assert(perDoc.count() === 40)
    val re = chunked.collect().groupBy(_.doc_id).map { case (id, cs) =>
      id -> cs.sortBy(_.chunk_index).flatMap(_.spans).map(_.text).mkString
    }
    val want = docs.collect().map(d =>
      d.doc_id -> d.spans.map(_.text).mkString).toMap
    assert(re === want)
  }

  test("load: no shuffle in the plan (narrow scan→decode)") {
    val spark = SparkTestBase.spark
    val dir = DocLoader.writeFixture(20, seed = 13L)
    val plan = DocLoader.load(spark, dir).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
