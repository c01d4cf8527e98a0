package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.extract.Spans

class SpansSpec extends AnyFunSuite {

  test("headings, title, metas, tables in document order") {
    val html =
      """<html><head><title>T1</title><title>T2 ignored</title>
        |<meta name="author" content="ada">
        |<meta property="og:type" content="article">
        |<meta charset="utf-8"></head>
        |<body><h1>Top</h1><p>x</p><h2>Sub <b>bold</b></h2>
        |<table><tr><th>a</th><th>b</th></tr><tr><td> c </td><td>d
        |e</td></tr></table>
        |<h3>Deep</h3></body></html>""".stripMargin
    val sp = Spans.extract(html)
    assert(sp.title.contains("T1"))
    assert(sp.headings.map(h => (h.level, h.text)) ==
      Seq((1, "Top"), (2, "Sub bold"), (3, "Deep")))
    assert(sp.metas == Seq("author" -> "ada", "og:type" -> "article"))
    assert(sp.tables == Seq(Seq(Seq("a", "b"), Seq("c", "d e"))))
  }

  test("nested tables: outer rows exclude inner rows; inner text stays in the cell") {
    val html =
      """<table><tr><td>outer1</td><td>
        |<table><tr><td>inner</td></tr></table>
        |</td></tr><tr><td>outer2</td><td>y</td></tr></table>""".stripMargin
    val sp = Spans.extract(html)
    assert(sp.tables.length == 1)
    val t = sp.tables.head
    assert(t.length == 2)
    assert(t(0) == Seq("outer1", "inner"))
    assert(t(1) == Seq("outer2", "y"))
  }

  test("script/style content never leaks into spans") {
    val html = "<h1>ok</h1><script>var h1 = '<h2>fake</h2>';</script><style>h1{}</style>"
    val sp = Spans.extract(html)
    assert(sp.headings == Seq(Spans.Heading(1, "ok")))
  }
}
