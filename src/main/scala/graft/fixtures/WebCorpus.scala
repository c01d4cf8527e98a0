package graft.fixtures

import graft.html.HtmlTokenizer
import graft.pipeline.PageRow
import graft.text.TextOps
import java.sql.Timestamp
import scala.util.Random

/** Deterministic synthetic Common-Crawl-style page generator.
  *
  * Fixed seed, no wall clock, no external data (FIXTURES.md §1, §4).
  * Every generated page carries boilerplate (nav/footer/sidebar link
  * farms, inline script/style, comments) around a known article body,
  * so the expected main text is known by construction and frozen as
  * the golden (`expectedText`).
  */
object WebCorpus {

  final case class Fixture(page: PageRow, expectedText: String)

  private val wordPool: Array[String] =
    ("lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod tempor " +
      "incididunt labore dolore magna aliqua enim minim veniam quis nostrud " +
      "exercitation ullamco laboris nisi aliquip commodo consequat duis aute irure " +
      "reprehenderit voluptate velit esse cillum fugiat nulla pariatur excepteur sint " +
      "occaecat cupidatat non proident sunt culpa officia deserunt mollit anim est " +
      "laborum dados texto conteúdo página relatório métrica atributo extração " +
      "qualidade análise").split("\\s+")

  private val navWords: Array[String] =
    "home about contact login search products news archive sitemap help terms privacy careers blog".split(" ")

  private def sentence(rnd: Random, nWords: Int): String =
    (0 until nWords).map(_ => wordPool(rnd.nextInt(wordPool.length))).mkString(" ")

  private def linkFarm(rnd: Random, n: Int): String =
    (0 until n).map { _ =>
      val w = navWords(rnd.nextInt(navWords.length))
      s"""<li><a href="/$w">$w</a></li>"""
    }.mkString(s"""<ul class="nav">""", "", "</ul>")

  /** Build one page. `paragraphs` are the raw article texts (may contain
    * `&`, `<`, accents, NBSP); they are HTML-escaped into the page and
    * the golden expected text is their Python-whitespace-collapsed form
    * joined with '\n'.
    */
  def buildPage(url: String, tsMillis: Long, paragraphs: Seq[String],
                lang: String, rnd: Random, utf8: Boolean = true): Fixture = {
    val sb = new StringBuilder
    sb ++= "<!DOCTYPE html><html><head><title>t</title>"
    sb ++= "<style>body { color: #333; } /* <not a tag> */</style>"
    sb ++= "<script>var x = 1 < 2 && 3 > 2;</script></head><body>"
    sb ++= "<!-- header boilerplate -->"
    sb ++= s"""<header>${linkFarm(rnd, 8 + rnd.nextInt(8))}</header>"""
    sb ++= s"""<aside>${linkFarm(rnd, 5 + rnd.nextInt(6))}</aside>"""
    sb ++= "<main><article>"
    paragraphs.foreach { p => sb ++= s"<p>${HtmlTokenizer.escape(p)}</p>" }
    sb ++= "</article></main>"
    sb ++= s"""<footer>${linkFarm(rnd, 6 + rnd.nextInt(6))}<div><a href="/l1">l1</a> <a href="/l2">l2</a> <a href="/l3">l3</a></div></footer>"""
    sb ++= "</body></html>"
    val html = sb.toString
    val bytes =
      if (utf8) html.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      else html.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val expected = paragraphs.map(TextOps.collapseWs).filter(_.nonEmpty).mkString("\n")
    Fixture(PageRow(url, new Timestamp(tsMillis), bytes, "", lang), expected)
  }

  /** One deterministic page by index — order-independent (per-page RNG
    * stream), so generation distributes over executors.
    */
  def generateOne(i: Int, seed: Long = 42L, giantEvery: Int = 97,
                  giantParagraphs: Int = 800): Fixture = {
    val baseTs = 1577836800000L // 2020-01-01T00:00:00Z, fixed
    locally {
      val rnd = new Random(seed * 1000003L + i) // per-page stream: order-independent
      val giant = giantEvery > 0 && i % giantEvery == giantEvery - 1
      val nPara = if (giant) giantParagraphs else 2 + rnd.nextInt(6)
      val paragraphs = (0 until nPara).map { _ =>
        val s = sentence(rnd, 6 + rnd.nextInt(20))
        // sprinkle chars that exercise escaping + Python-strip parity
        rnd.nextInt(5) match {
          case 0 => s + " & <tags> cost 3 > 2"
          case 1 => "  " + s + "  " // NBSP edges
          case 2 => s + " ação coração São Paulo"
          case _ => s
        }
      }
      val lang = if (rnd.nextBoolean()) "pt-BR" else "en-US"
      buildPage(f"https://fixture.test/web/page$i%06d.html",
        baseTs + i * 1000L, paragraphs, lang, rnd)
    }
  }

  /** Deterministic corpus. ~`n` pages; every `giantEvery`-th page is a
    * multi-hundred-paragraph "giant" (heavy tail for skew tests).
    */
  def generate(n: Int, seed: Long = 42L, giantEvery: Int = 97,
               giantParagraphs: Int = 800): IndexedSeq[Fixture] =
    (0 until n).map(i => generateOne(i, seed, giantEvery, giantParagraphs))
}
