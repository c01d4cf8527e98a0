package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.mstr.{MstrLocale, MstrParsers, Soup}

/** A4 edge behaviors (reference metric_parser.py:143-236, 307-360) —
  * SURVEY §7.4 calls this "the trickiest pure function": formula text
  * reconstruction with seen-set dedup, operator-preserving
  * consecutive-dup removal, whitespace/paren cleanup, and function/fact
  * id classification by preceding image.
  */
class MetricFormulaSpec extends AnyFunSuite {
  private val loc = MstrLocale.ptBR
  private val MID = "AAAA000011112222333344445555BBBB"
  private val F1 = "11110000111122223333444455551111"
  private val F2 = "22220000111122223333444455552222"
  private def ph(id: String) = "[" + "$$$$" + id + "$$$$" + "]"

  private def defSection(formulaCell: String): Soup = {
    val html =
      s"""<html><body>
         |<a name="$MID"></a>
         |<table class="SECTIONHEADER"><tr><td>DEFINIÇÃO</td></tr></table>
         |<table>
         |<tr><td>FÓRMULA</td><td>$formulaCell</td></tr>
         |</table>
         |</body></html>""".stripMargin
    new Soup(graft.html.TagTree.parse(html))
  }

  private def definition(cell: String) =
    MstrParsers.extractMetricDefinition(defSection(cell), loc, "M", Some(MID))

  test("seen-set dedup operates per text node; standalone parens always pass") {
    // <b>Receita</b>'s text node exactly repeats the seen link text → deduped
    val d = definition(s"""Sum ( <a href="Fato.html${ph(F2)}">Receita</a> )<b>Receita</b>""")
    assert(d.formula == Some("Sum (Receita)"))
    // dedup is per whole text node: "Receita" inside a LARGER text node
    // is NOT deduped (reference iterates NavigableStrings, not words)
    val d2 = definition(s"""Sum ( <a href="Fato.html${ph(F2)}">Receita</a> ) ( Receita )""")
    assert(d2.formula == Some("Sum (Receita)(Receita)"))
  }

  test("consecutive duplicate removal preserves operators") {
    val d = definition("""A + + B""")
    // '+' is in the keep set → consecutive '+' both survive;
    assert(d.formula.contains("A + + B"))
  }

  test("whitespace cleanup: collapse runs, tighten parens") {
    val d = definition("""Sum   (    X   )""")
    assert(d.formula.contains("Sum (X)"))
  }

  test("function/fact classified by preceding img src") {
    val cell =
      s"""<img src="img/Function.gif"><a href="Função.html${ph(F1)}">Sum</a>
         |(<img src="img/Fact.gif"><a href="Fato.html${ph(F2)}">Receita</a>)""".stripMargin
    val d = definition(cell)
    assert(d.functionId.contains(F1))
    assert(d.factId.contains(F2))
  }

  test("fallback without images: first link is function, second is fact") {
    val cell =
      s"""<a href="Função.html${ph(F1)}">Avg</a>(<a href="Fato.html${ph(F2)}">Valor</a>)"""
    val d = definition(cell)
    assert(d.functionId.contains(F1))
    assert(d.factId.contains(F2))
  }

  test("composite: tipo from TIPO row, children from Metric-image links, order-preserving dedup") {
    val html =
      s"""<html><body>
         |<a name="$MID"></a>
         |<table class="SECTIONHEADER"><tr><td>DEFINIÇÃO</td></tr></table>
         |<table>
         |<tr><td>Tipo de métrica</td><td>Composto</td></tr>
         |<tr><td>FÓRMULA</td><td>
         |  <img src="img/Metric.gif"><a href="Métrica.html${ph(F1)}">M1</a> /
         |  <img src="img/Metric.gif"><a href="Métrica.html${ph(F2)}">M2</a>
         |  <img src="img/Metric.gif"><a href="Métrica.html${ph(F1)}">M1</a>
         |</td></tr>
         |</table>
         |</body></html>""".stripMargin
    val s = new Soup(graft.html.TagTree.parse(html))
    val d = MstrParsers.extractMetricDefinition(s, loc, "M", Some(MID))
    assert(d.tipo == "composto")
    assert(d.childMetricIds == List(F1, F2)) // dup F1 dropped, order kept
  }
}
