package graft.ops

import graft.html.HtmlTokenizer
import graft.pipeline.{ExtractPipeline, PageRow}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Extraction queries exposed through SparkEntry.
  *
  * `roundtrip` is the oracle-checkable byte-identity proof: each
  * document's text is wrapped into a boilerplate-heavy page
  * (deterministic markup: nav/sidebar/footer link farms, script/style,
  * comments), pushed through the full tokenize → tag-tree → block
  * classification pipeline, and must come back byte-identical — which
  * DuckDB verifies against the original `text` column.
  */
object ExtractOps {

  /** The documents→pages url rule, in its three faces. All derivations
    * of a synthetic page url from a doc_id — and every inverse — MUST
    * go through these: the resume machinery anti-joins a cheap
    * urls-only projection ([[docUrlCol]]) against urls committed by the
    * row-building face ([[docUrl]]); a silent divergence between the
    * two would make every resume re-extract the whole corpus and
    * append duplicate urls. ExtractOpsSpec pins column == literal.
    */
  def docUrl(id: Long): String = s"doc://$id"

  /** [[docUrl]] as a column expression over a numeric doc_id. */
  def docUrlCol(docId: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(lit("doc://"), docId.cast("string"))

  /** Inverse of [[docUrl]]: doc_id back out of a page url. */
  def docIdCol(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_extract(url, "doc://(\\d+)", 1).cast("long")

  /** Deterministic page wrapper (no RNG — parity is the point). */
  def wrapHtml(text: String): Array[Byte] = {
    val nav = (1 to 8).map(i => s"""<li><a href="/nav$i">nav item $i</a></li>""")
      .mkString("""<ul class="nav">""", "", "</ul>")
    val html = new StringBuilder()
      .append("<!DOCTYPE html><html><head><title>fixture</title>")
      .append("<style>p { margin: 0; } /* 1 < 2 */</style>")
      .append("<script>var q = 1 < 2 && 2 > 1;</script></head><body>")
      .append("<!-- boilerplate -->")
      .append(s"<header>$nav</header><aside>$nav</aside>")
      .append(s"<main><article><p>${HtmlTokenizer.escape(text)}</p></article></main>")
      .append(s"<footer>$nav</footer></body></html>")
      .toString
    html.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  /** documents(dir) as a pages table: (url, warc_ts, html, text, lang).
    * NO Par.spread before page synthesis (r6 pass-4 A/B, two sessions:
    * roundtrip 0.223/0.152 s unspread vs 0.267/0.176 s spread,
    * roundtripExpr 0.130/0.098/0.072 vs 0.209/0.179/0.153,
    * corpusStats 0.173/0.155 vs 0.190/0.189 at sf0.1/32c): the wrap +
    * extract cost per row no longer outweighs the spread exchange —
    * the pass-1 reading reversed on calm re-measurement, matching the
    * q1_agg-class removals. At production split counts the spread was
    * a probe-gated no-op anyway, so removal is scale-neutral.
    */
  def documentsAsPages(spark: SparkSession, dir: String): Dataset[PageRow] =
    documentsAsPagesOf(Tables.read(spark, dir, "documents"))

  /** [[documentsAsPages]] over a caller-supplied documents slice — the
    * incremental hook: a resume synthesizes pages ONLY for pending
    * doc_ids instead of wrapping the whole corpus to throw most of it
    * away in the anti-join.
    */
  def documentsAsPagesOf(docsDf: DataFrame): Dataset[PageRow] = {
    val spark = docsDf.sparkSession
    import spark.implicits._
    docsDf
      .select(col("doc_id"), col("text"), col("lang"))
      .as[(Long, String, String)]
      .map { case (id, text, lang) =>
        PageRow(docUrl(id), new java.sql.Timestamp(1577836800000L + id),
          wrapHtml(text), "", lang)
      }
  }

  /** Byte-identity roundtrip: wrap → extract → (doc_id, text). */
  def roundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pages = documentsAsPages(spark, dir)
    ExtractPipeline.run(pages, charset = "utf-8")
      .select(
        docIdCol(col("url")).as("doc_id"),
        col("text"))
  }

  /** Same roundtrip through the custom Catalyst expression
    * (`extract_main_text(html, charset)`) — proves the SQL surface
    * computes byte-identically to the typed pipeline.
    */
  def roundtripExpr(spark: SparkSession, dir: String): DataFrame = {
    val pages = documentsAsPages(spark, dir).toDF()
    pages.select(
      docIdCol(col("url")).as("doc_id"),
      graft.functions.GraftFunctions.extract_main_text(col("html"), lit("utf-8")).as("text"))
  }

  /** PDF byte-identity roundtrip (north rule "PDF/layout parse"): each
    * document's text becomes a complete synthetic PDF (even doc_ids
    * Flate-compressed, odd raw — both decode paths exercised), routed
    * through the SAME pipeline as HTML via content sniffing, and must
    * come back byte-identical.
    */
  def pdfRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pages = graft.ops.Par.spread(
        Tables.read(spark, dir, "documents"), dir)
      .select(col("doc_id"), col("text"), col("lang"))
      .as[(Long, String, String)]
      .map { case (id, text, lang) =>
        PageRow(docUrl(id), new java.sql.Timestamp(1577836800000L + id),
          graft.pdf.PdfGen.pdf(Seq(text), flate = id % 2 == 0), "", lang)
      }
    ExtractPipeline.run(pages, charset = "utf-8")
      .select(
        docIdCol(col("url")).as("doc_id"),
        col("text"))
  }

  /** Corpus-level extraction stats via the typed
    * [[graft.pipeline.ExtractStatsAggregator]] (map-side partial merge,
    * one reduced row). The text-chars total is oracle-checkable because
    * the roundtrip is byte-identical: sum(text_chars) == sum(length(text)).
    */
  def corpusStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pages = documentsAsPages(spark, dir)
    ExtractPipeline.run(pages, charset = "utf-8")
      .select(graft.pipeline.ExtractStatsAggregator.toColumn)
      .toDF() // Dataset[CorpusStats] → (n_docs, n_parse_ok, total_text_chars)
  }

  /** Deterministic structured page for the span-extraction roundtrip:
    * title + meta + two headings + a 3-row key/value table + body text.
    */
  def spanPage(id: Long, source: String, text: String): String = {
    val esc = HtmlTokenizer.escape _
    s"""<html><head><title>Doc $id</title>
       |<meta name="source" content="${esc(source)}"></head>
       |<body><h1>Doc $id</h1><h2>Section ${id % 7}</h2>
       |<table><tr><th>key</th><th>value</th></tr>
       |<tr><td>source</td><td>${esc(source)}</td></tr>
       |<tr><td>len</td><td>${text.length}</td></tr></table>
       |<p>${esc(text)}</p></body></html>""".stripMargin
  }

  /** Generic tag-path span extraction roundtrip (north star: "tables,
    * headings, metadata blocks"): every structured field is recovered by
    * PARSING the page with [[graft.extract.Spans]], then checked against
    * the DuckDB oracle's direct recomputation from the source columns.
    */
  def spansRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // NO Par.spread (r6 pass-4 A/B, two sessions: 0.126/0.094 s unspread
    // vs 0.180/0.168 s spread at sf0.1/32c) — see documentsAsPages
    Tables.read(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)]
      .map { case (id, text, source) =>
        val sp = graft.extract.Spans.extract(spanPage(id, source, text))
        val table = sp.tables.head
        (id, sp.title.getOrElse(""),
          sp.headings.find(_.level == 1).map(_.text).getOrElse(""),
          sp.headings.find(_.level == 2).map(_.text).getOrElse(""),
          sp.tables.length.toLong, table.length.toLong,
          table(1)(1), table(2)(1).toLong,
          sp.metas.toMap.getOrElse("source", ""))
      }
      .toDF("doc_id", "title", "h1", "h2", "n_tables", "n_rows",
        "cell_source", "cell_len", "meta_source")
  }

  /** Full pipeline over the synthetic web corpus (incl. giant-page skew
    * routing); returns per-url extraction rows with the text as its md5
    * digest, oracle-backed by a frozen golden table (the raw text bytes
    * are asserted in ScalaTest against WebCorpus; the digest pins them
    * at the driver's DuckDB gate too).
    */
  def webCorpus(spark: SparkSession, n: Int, partitions: Int): DataFrame = {
    import spark.implicits._
    val fixtures = graft.fixtures.WebCorpus.generate(n)
    val pages = spark.createDataset(fixtures.map(_.page))
    ExtractPipeline.run(pages, charset = "utf-8", numPartitions = partitions)
      .select(col("url"), md5(col("text")).as("text_md5"), col("blocks"),
        col("content_blocks"), col("html_bytes"), col("parse_ok"))
  }
}
