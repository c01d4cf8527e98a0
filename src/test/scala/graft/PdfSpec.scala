package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pdf.{PdfGen, PdfTextExtractor}
import java.nio.charset.StandardCharsets

class PdfSpec extends AnyFunSuite {

  test("generated PDFs roundtrip byte-identically (raw and FlateDecode)") {
    val lines = Seq(
      "Hello PDF world, this is a test of the text extractor.",
      "Parens (like these) and back\\slashes must survive.",
      "Short.",
      "A much longer line that will be split into several Tj runs on the same text line to exercise concatenation semantics properly.")
    for (flate <- Seq(false, true)) {
      val bytes = PdfGen.pdf(lines, flate)
      assert(PdfTextExtractor.isPdf(bytes))
      assert(PdfTextExtractor.extractText(bytes) == lines.mkString("\n"), s"flate=$flate")
    }
  }

  test("non-Latin-1 text roundtrips via UTF-16BE hex strings") {
    val lines = Seq(
      "em dash — and curly “quotes” survive",
      "mixed ascii and 中文 characters",
      "plain ascii line")
    for (flate <- Seq(false, true)) {
      val bytes = PdfGen.pdf(lines, flate)
      assert(PdfTextExtractor.extractText(bytes) == lines.mkString("\n"), s"flate=$flate")
    }
  }

  test("content interpreter: TJ arrays, hex strings, quotes, escapes, octal") {
    val content =
      """BT
        |/F1 10 Tf
        |1 0 0 1 50 700 Tm
        |[(Kerned ) -120 (pairs ) -80 (join.)] TJ
        |0 -12 Td
        |<48657821> Tj
        |(line3) '
        |(oct\101l and \(escaped\) parens) '
        |ET""".stripMargin.getBytes(StandardCharsets.ISO_8859_1)
    val got = PdfTextExtractor.extractFromContent(content)
    assert(got ==
      "Kerned pairs join.\nHex!\nline3\noctAl and (escaped) parens")
  }

  test("horizontal Td does not break the line; vertical does") {
    val content =
      """BT
        |1 0 0 1 10 100 Tm
        |(ab) Tj
        |15 0 Td
        |(cd) Tj
        |0 -10 Td
        |(ef) Tj
        |ET""".stripMargin.getBytes(StandardCharsets.ISO_8859_1)
    assert(PdfTextExtractor.extractFromContent(content) == "abcd\nef")
  }

  test("non-PDF and garbage bytes are handled") {
    assert(!PdfTextExtractor.isPdf("<html></html>".getBytes))
    assert(!PdfTextExtractor.isPdf(null))
    assert(!PdfTextExtractor.isPdf(Array.emptyByteArray))
    // garbage after a PDF header must not throw
    val garbage = ("%PDF-1.4\n" + "stream\nnot really\nendstream\n").getBytes
    assert(PdfTextExtractor.extractText(garbage) == "")
  }

  test("pipeline routes PDFs by magic bytes next to HTML rows") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val pdfPage = graft.pipeline.PageRow("pdf://1",
      new java.sql.Timestamp(0L), PdfGen.pdf(Seq("pdf body text"), flate = true), "", "en")
    val htmlPage = graft.pipeline.PageRow("html://1",
      new java.sql.Timestamp(0L),
      "<html><body><main><p>html body text</p></main></body></html>".getBytes, "", "en")
    val out = graft.pipeline.ExtractPipeline
      .run(spark.createDataset(Seq(pdfPage, htmlPage)))
      .collect().map(d => d.url -> d.text).toMap
    assert(out("pdf://1") == "pdf body text")
    assert(out("html://1").contains("html body text"))
  }
}
