package graft.fixtures

import graft.mstr.MstrLocale
import graft.pipeline.PageRow
import java.sql.Timestamp

/** Parametric MSTR-style corpus generator: `corpus(n)` emits a
  * deterministic documentation export with `n` reports and
  * proportionally sized entity pools (datasets, attributes, simple +
  * composite metrics, facts, tables, users), using the exact HTML
  * idioms of the hand-crafted [[MstrCorpus]] (anchored sections,
  * SECTIONHEADER tables, `[$$$$ID$$$$]` hrefs, DOCUMENT DEFINITION
  * cells, ViewReport markers, [ROWS]/[COLUMNS] comments). No RNG — ids
  * are md5 of stable tags, so every run and every plan sees the same
  * bytes. Exercises at corpus scale what the 2-report fixture can't:
  * many sections per file, cross-report metric reuse, dataset sharing,
  * embedded metrics sprinkled through the pool.
  */
object MstrGen {

  private def hid(tag: String, i: Int): String =
    graft.text.TextOps.md5HexUpper(s"gen:$tag:$i")

  private def ph(id: String) = s"[$$$$$$$$$id$$$$$$$$]"
  private def mainbody(name: String, href: String) =
    s"""<a class="MAINBODY" href="$href">$name</a><br>"""
  private def index(links: Seq[(String, String)]): String =
    links.map { case (n, h) => mainbody(n, h) }
      .mkString("<html><body>", "\n", "</body></html>")
  private def sectionHeader(title: String) =
    s"""<table class="SECTIONHEADER"><tr><td>$title</td></tr></table>"""

  final case class Sizes(nReports: Int) {
    val nAttrs: Int = math.max(2, nReports / 2)
    val nSimple: Int = math.max(2, nReports)
    val nComposite: Int = math.max(1, nReports / 2)
    val nFacts: Int = math.max(1, nReports / 8)
    val nTables: Int = math.max(2, nReports / 4)
    val nUsers = 3
    val nRelDs: Int = math.max(1, nReports / 4) // report-type datasets
  }

  /** Locale-dependent literal labels not covered by MstrLocale's
    * structural tokens (reference i18n/pt_br.py, i18n/en_us.py).
    */
  private final case class Labels(simples: String, composto: String,
                                  userHdr: String, accessHdr: String,
                                  pageBy: String, chartValue: String)
  private def labelsFor(loc: MstrLocale): Labels =
    if (loc.code == "en-US")
      Labels("Simple Metric", "Composite", "USER", "ACCESS", "PAGE BY", "Vertical Bar")
    else
      Labels("Métrica simples", "Composto", "USUÁRIO", "ACESSO", "PAGINAR POR", "Barra Vertical")

  /** `hotCubes=true` packs EVERY cube section into ONE content file —
    * the "all datasets in one export file" shape real MSTR dumps can
    * produce, which concentrates the whole dataset-stage request list
    * on a single basename (the hot-basename skew scenario the join
    * plan's salted request routing exists for).
    *
    * `fanInCube=true` is the orthogonal skew shape: every report
    * references THE SAME cube section (one dataset shared by all —
    * "everything reads the corporate base cube"). The dataset-stage
    * request list concentrates on a file that holds only its normal
    * handful of index links, so planning-time link counting CANNOT see
    * it — only the measured per-file request counts riding the stage
    * probes can. The fan-in cascades: that cube's attributes/metrics/
    * facts receive every report's follow-up requests too.
    */
  def corpus(n: Int, loc: MstrLocale = MstrLocale.ptBR,
             hotCubes: Boolean = false,
             fanInCube: Boolean = false): Map[String, String] = {
    val s = Sizes(n)
    import s._
    val lb = labelsFor(loc)

    // ---- entity identities ----
    def repId(i: Int) = hid("rep", i)
    def cubeId(i: Int) = hid("cube", i)
    def relDsId(i: Int) = hid("relds", i)
    def attrId(i: Int) = hid("attr", i)
    def metId(i: Int) = hid("met", i)
    def compId(i: Int) = hid("comp", i)
    def factId(i: Int) = hid("fact", i)
    def tabId(i: Int) = hid("tab", i)
    def userId(i: Int) = hid("user", i)
    val fnId = hid("fn", 0)
    def embId(i: Int) = hid("emb", i) // never indexed → embedded metric

    def docFile(i: Int) = s"GenDoc_${i / 10 + 1}.html"
    def cubeFile(i: Int) =
      if (hotCubes) "GenCubo_1.html" else s"GenCubo_${i / 5 + 1}.html"
    def relDsFile(i: Int) = s"GenRel_${i + 1}.html" // one section per file
    def attrFile(i: Int) = s"GenAttr_${i / 6 + 1}.html"
    def metFile(i: Int) = s"GenMet${i}_1.html"      // one metric per file
    def compFile(i: Int) = s"GenComp${i}_1.html"
    def factFile(i: Int) = s"GenFato_${i / 8 + 1}.html"

    // ---- index files ----
    val documento = index((0 until nReports).map(i =>
      s"Gen Relatorio $i" -> s"${docFile(i)}#${repId(i)}"))
    val cuboIdx = index((0 until nReports).map(i =>
      s"Gen Cubo $i" -> s"${cubeFile(i)}#${cubeId(i)}"))
    val relIdx = index((0 until nRelDs).map(i =>
      s"Gen RelDS $i" -> s"${relDsFile(i)}#${relDsId(i)}"))
    val atalhoIdx = index(Seq("Gen Atalho 0" -> s"GenAtalho_1.html#${hid("atalho", 0)}"))
    val metricaIdx = index(
      (0 until nSimple).map(i => s"Gen Metrica $i" -> s"${metFile(i)}#${metId(i)}") ++
        (0 until nComposite).map(i => s"Gen Composta $i" -> s"${compFile(i)}#${compId(i)}"))
    val atributoIdx = index((0 until nAttrs).map(i =>
      s"Gen Atributo $i" -> s"${attrFile(i)}#${attrId(i)}"))
    val fatoIdx = index((0 until nFacts).map(i =>
      s"Gen Fato $i" -> s"${factFile(i)}#${factId(i)}"))
    val funcaoIdx = index(Seq("Soma" -> s"GenFn_1.html#$fnId"))
    val tabelaIdx = index((0 until nTables).map(i =>
      s"GT_TAB_$i" -> s"GenTab_1.html#${tabId(i)}"))
    val pastaIdx = index((0 until nUsers).map(i =>
      s"Gen User $i" -> s"GenPasta_1.html#${userId(i)}"))

    // ---- report sections (10 per GenDoc file) ----
    def reportSection(i: Int): String = {
      // every 5th report ALSO references the previous report's cube
      // (dataset sharing → cross-report metric reuse), every 4th gets a
      // report-type dataset
      // fanInCube: every report's primary dataset IS cube 0 (and the
      // every-5th sharing link is dropped — it would duplicate cube 0
      // within the same report)
      val ci = if (fanInCube) 0 else i
      val dsLinks = Seq(
        Some(s"""<a href="${loc.cuboInteligente}#${ph(cubeId(ci))}">Gen Cubo $ci</a>"""),
        if (i % 5 == 0 && i > 0 && !fanInCube)
          Some(s"""<a href="${loc.cuboInteligente}#${ph(cubeId(i - 1))}">Gen Cubo ${i - 1}</a>""")
        else None,
        if (i % 4 == 0 && i / 4 < nRelDs)
          Some(s"""<a href="${loc.relatorio}#${ph(relDsId(i / 4))}">Gen RelDS ${i / 4}</a>""")
        else None).flatten.mkString("\n    ")
      s"""<tr><td><a name="${repId(i)}"></a>
         |<table>
         |<tr valign="TOP"><td>${loc.proprietario}:</td><td>Gen User ${i % nUsers}</td></tr>
         |<tr valign="TOP"><td>${loc.controleAcesso}:</td><td>
         |  <table>
         |  <tr><td>${lb.userHdr}</td><td>${lb.accessHdr}</td></tr>
         |  <tr><td>Gen User ${(i + 1) % nUsers}</td><td>Full Control</td></tr>
         |  <tr><td>Gen User ${(i + 2) % nUsers}</td><td>View</td></tr>
         |  </table>
         |</td></tr>
         |</table>
         |</td>
         |<td>${loc.documentDefinition}</td>
         |<td><table><tr><td>
         |    $dsLinks
         |</td></tr></table></td>
         |</tr>""".stripMargin
    }

    val docFiles: Map[String, String] = (0 until nReports).groupBy(docFile)
      .map { case (file, ids) =>
        file -> ids.map(reportSection)
          .mkString("<html><body><table>\n", "\n", "\n</table></body></html>")
      }

    // ---- cube sections (5 per GenCubo file) ----
    def cubeSection(i: Int): String = {
      val a1 = i % nAttrs
      val a2 = (i + 1) % nAttrs
      val m1 = i % nSimple
      val c1 = i % nComposite
      // every 7th cube also links a non-indexed metric → embedded
      val emb = if (i % 7 == 0)
        s"""\n        <a href="Metrica_1.html#${ph(embId(i))}">Gen Derived $i</a>"""
      else ""
      s"""<tr><td><a name="${cubeId(i)}"></a>
         |<td>${loc.objetosTemplate}</td>
         |<table>
         |<tr><td>${loc.objetosRelatorio}</td><td>${loc.linhas}</td><td>${loc.colunas}</td><td>${lb.pageBy}</td></tr>
         |<tr><td></td>
         |    <td><a href="Atributo.html#${ph(attrId(a1))}">Gen Atributo $a1</a>
         |        <a href="Atributo.html#${ph(attrId(a2))}">Gen Atributo $a2</a></td>
         |    <td><a href="Metrica_1.html#${ph(metId(m1))}">Gen Metrica $m1</a>
         |        <a href="Metrica_1.html#${ph(compId(c1))}">Gen Composta $c1</a>$emb</td>
         |    <td></td></tr>
         |</table>
         |</td></tr>""".stripMargin
    }

    val cubeFiles: Map[String, String] = (0 until nReports).groupBy(cubeFile)
      .map { case (file, ids) =>
        file -> ids.map(cubeSection)
          .mkString("<html><body><table>\n", "\n", "\n</table></body></html>")
      }

    // ---- report-type dataset files (one section per file) ----
    val relDsFiles: Map[String, String] = (0 until nRelDs).map { i =>
      relDsFile(i) ->
        s"""<html><body><table>
           |<tr><td><a name="${relDsId(i)}"></a>
           |<img src="images/ViewReport.bmp">
           |<!--[ROWS]--><table><tr><td><a href="Atributo.html#${ph(attrId(i % nAttrs))}">Gen Atributo ${i % nAttrs}</a></td></tr></table>
           |<!--[COLUMNS]--><table><tr><td><a href="Metrica_1.html#${ph(metId(i % nSimple))}">Gen Metrica ${i % nSimple}</a></td></tr></table>
           |<table>
           |<tr><td>${loc.opcoesGrafico}</td></tr>
           |<tr><td>${loc.tipoGrafico}:</td><td>${lb.chartValue}</td></tr>
           |</table>
           |</td></tr>
           |</table></body></html>""".stripMargin
    }.toMap

    // ---- attribute sections (6 per GenAttr file) ----
    def attrSection(i: Int): String = {
      val t = i % nTables
      val extraForm = if (i % 2 == 0)
        s"""
           |<a name="${attrId(i)}_F2"></a>
           |<table><tr><td><b>Descrição</b></td></tr></table>
           |<table><tr><td>VALORES</td><td>
           |  <table>
           |  <tr><td>${loc.expressao}</td><td>MAP</td><td>${loc.tabelasFonte}</td></tr>
           |  </table>
           |</td></tr></table>""".stripMargin
      else ""
      s"""<tr><td><a name="${attrId(i)}"></a>
         |${sectionHeader(loc.detalhesFormularios)}
         |<a name="${attrId(i)}_F1"></a>
         |<table><tr><td><b>ID</b></td></tr></table>
         |<table><tr><td>VALORES</td><td>
         |  <table>
         |  <tr><td>${loc.expressao}</td><td>MAP</td><td>${loc.tabelasFonte}</td></tr>
         |  <tr><td>COD_$i</td><td>Manual</td><td><a href="GenTab_1.html#${ph(tabId(t))}">GT_TAB_$t</a></td></tr>
         |  </table>
         |</td></tr></table>$extraForm
         |</td></tr>""".stripMargin
    }

    val attrFiles: Map[String, String] = (0 until nAttrs).groupBy(attrFile)
      .map { case (file, ids) =>
        file -> ids.map(attrSection)
          .mkString("<html><body><table>\n", "\n", "\n</table></body></html>")
      }

    // ---- metric files (one per metric — formula-walk semantics) ----
    def tipoRow(v: String) =
      s"""<table><tr><td>${loc.tipoMetrica}</td><td>$v</td></tr></table>"""
    def metricDoc(anchor: String, body: String) =
      s"""<html><body><table><tr><td><a name="$anchor"></a>${sectionHeader(loc.definicao)}$body</td></tr></table></body></html>"""

    val simpleFiles: Map[String, String] = (0 until nSimple).map { i =>
      val f = i % nFacts
      metFile(i) -> metricDoc(metId(i),
        tipoRow(lb.simples) +
          s"""<table><tr><td>${loc.formula}</td><td><img src="images/Function.bmp"><a href="GenFn_1.html#${ph(fnId)}">Soma</a> ( <img src="images/Fact.bmp"><a href="Fato.html#${ph(factId(f))}">Gen Fato $f</a> )</td></tr></table>""")
    }.toMap

    val compositeFiles: Map[String, String] = (0 until nComposite).map { i =>
      val c1 = (2 * i) % nSimple
      val c2 = (2 * i + 1) % nSimple
      compFile(i) -> metricDoc(compId(i),
        tipoRow(lb.composto) +
          s"""<table><tr><td>${loc.formula}</td><td><img src="images/Metric.bmp"><a href="${metFile(c1)}#${ph(metId(c1))}">Gen Metrica $c1</a> + <img src="images/Metric.bmp"><a href="${metFile(c2)}#${ph(metId(c2))}">Gen Metrica $c2</a></td></tr></table>""")
    }.toMap

    // ---- fact sections (8 per GenFato file) ----
    def factSection(i: Int): String = {
      val t1 = i % nTables
      val t2 = (i + 1) % nTables
      s"""<tr><td><a name="${factId(i)}"></a>
         |${sectionHeader(loc.expressoes)}
         |<table>
         |<tr><td>${loc.expressao}</td><td>${loc.tabelasFonte}</td></tr>
         |<tr><td>VLR_$i</td><td><a href="GenTab_1.html#${ph(tabId(t1))}">GT_TAB_$t1</a> <a href="GenTab_1.html#${ph(tabId(t2))}">GT_TAB_$t2</a></td></tr>
         |</table>
         |</td></tr>""".stripMargin
    }

    val factFiles: Map[String, String] = (0 until nFacts).groupBy(factFile)
      .map { case (file, ids) =>
        file -> ids.map(factSection)
          .mkString("<html><body><table>\n", "\n", "\n</table></body></html>")
      }

    Map(
      loc.documento -> documento,
      loc.cuboInteligente -> cuboIdx,
      loc.relatorio -> relIdx,
      loc.atalho -> atalhoIdx,
      loc.metrica -> metricaIdx,
      loc.atributo -> atributoIdx,
      loc.fato -> fatoIdx,
      loc.funcao -> funcaoIdx,
      loc.tabelaLogica -> tabelaIdx,
      loc.pasta -> pastaIdx) ++
      docFiles ++ cubeFiles ++ relDsFiles ++ attrFiles ++
      simpleFiles ++ compositeFiles ++ factFiles
  }

  /** As pages-table rows (Latin-1 per the pinned decode rule). */
  def pages(n: Int, loc: MstrLocale = MstrLocale.ptBR,
            hotCubes: Boolean = false,
            fanInCube: Boolean = false): Seq[PageRow] = {
    val baseTs = 1577836800000L
    corpus(n, loc, hotCubes, fanInCube).toSeq.sortBy(_._1).zipWithIndex.map {
      case ((name, html), i) =>
        PageRow(s"mstr://gen/$name", new Timestamp(baseTs + i),
          html.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1), "", loc.code)
    }
  }
}
