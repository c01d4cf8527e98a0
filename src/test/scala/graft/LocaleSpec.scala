package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.mstr.{MstrLocale, MstrParsers, Soup}

/** en-US locale leg (reference i18n/en_us.py): the same parsers resolve
  * English section headers, type labels, and metric classification.
  */
class LocaleSpec extends AnyFunSuite {

  private val loc = MstrLocale.enUS
  private val MID = "AAAA000011112222333344445555BBBB"
  private val FID = "CCCC000011112222333344445555DDDD"
  private val FUID = "EEEE000011112222333344445555FFFF"

  test("forLang dispatch") {
    assert(MstrLocale.forLang("en").code == "en-US")
    assert(MstrLocale.forLang("en-GB").code == "en-US")
    assert(MstrLocale.forLang("pt-BR").code == "pt-BR")
    assert(MstrLocale.forLang(null).code == "pt-BR")
  }

  test("english metric definition: type, formula components, function/fact") {
    val ph = (id: String) => "[" + "$$$$" + id + "$$$$" + "]"
    val html =
      s"""<html><body>
         |<a name="$MID"></a>
         |<table class="SECTIONHEADER"><tr><td>DEFINITION</td></tr></table>
         |<table>
         |<tr><td>Metric Type</td><td>Simple</td></tr>
         |<tr><td>FORMULA</td><td>
         |  <img src="images/Function16.gif">
         |  <a href="Function.html${ph(FUID)}">Sum</a>
         |  (<img src="images/Fact16.gif"><a href="Fact.html${ph(FID)}">Revenue</a>)
         |</td></tr>
         |</table>
         |</body></html>""".stripMargin
    val s = new Soup(graft.html.TagTree.parse(html))
    val d = MstrParsers.extractMetricDefinition(s, loc, "Total Revenue", Some(MID))
    assert(d.tipo == "simples") // canonical internal value
    assert(d.functionId.contains(FUID))
    assert(d.factId.contains(FID))
  }

  test("english index links parse identically") {
    val html =
      s"""<html><body>
         |<a class="MAINBODY" href="Metric.html#$MID">Total Revenue</a>
         |<a class="MAINBODY" href="Fact.html#$FID">Revenue</a>
         |</body></html>""".stripMargin
    val s = new Soup(graft.html.TagTree.parse(html))
    val links = MstrParsers.extractIndexLinks(s)
    assert(links.map(_.name) == Seq("Total Revenue", "Revenue"))
    assert(links.head.anchor.contains(MID))
  }
}
