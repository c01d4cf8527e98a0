package graft.fixtures

import graft.pipeline.PageRow
import java.sql.Timestamp

/** Deterministic MSTR-style documentation corpus (FIXTURES.md §3) — no
  * RNG, no wall clock. Exercises: index files, anchored sections,
  * [OBJECT]/[ROWS]/[COLUMNS] markers, SECTIONHEADER tables, `[$$$$ID$$$$]`
  * hrefs, simple/composite/embedded metrics, a metric cycle, attribute
  * forms, owner + numeric-id ACL users, accent-normalized and
  * containment lookups, the `Ms ` → `Mês ` accent-fix trigger, dataset
  * resolution through all three indexes, and an unresolvable dataset.
  */
object MstrCorpus {

  // 32-hex ids, mutually non-substring
  val RID = "A1" * 16        // report: Relatório de Vendas
  val RID2 = "B2" * 16       // report: Relatório Vazio
  val CUBOID = "C3" * 16     // dataset: Cubo Vendas
  val RELAUXID = "D4" * 16   // dataset: Rel Aux (Report type)
  val ATALHOID = "E5" * 16   // dataset: Atalho X (Shortcut)
  val GHOSTID = "F6" * 16    // dataset: Fantasma (unresolvable)
  val MESID = "EA" * 16      // dataset: Mês Atual (accent-fix case)
  val LOJAID = "A7" * 16     // attribute: Loja
  val TEMPOID = "B8" * 16    // attribute: Tempo
  val RECTOTID = "C9" * 16   // metric: Receita Total (simple)
  val CUSTOID = "D0" * 16    // metric: Custo (simple, no-image fallback)
  val MARGEMID = "E1" * 16   // metric: Margem (composite + dup child)
  val CICLOAID = "F2" * 16   // metric: Ciclo A (cycle)
  val CICLOBID = "A3" * 16   // metric: Ciclo B (cycle)
  val MEDIAID = "B4" * 16    // metric: Métrica Média (containment lookup)
  val MEDIAREF = "FB" * 16   // dangling placeholder id used on RelAux
  val EMBID = "C5" * 16      // embedded/derived metric (not in index)
  val SUMID = "D6" * 16      // function: Sum
  val RECFACTID = "E7" * 16  // fact: Receita
  val FTVID = "F8" * 16      // table: FT_VENDAS
  val DIMLID = "A9" * 16     // table: DIM_LOJA
  val ALICEID = "BA" * 16    // user: Alice Admin
  val BOBID = "CB" * 16      // user: Bob Builder (7572142)
  val CARLOSID = "DC" * 16   // user: Carlos Çedilha

  private def ph(id: String) = s"[$$$$$$$$$id$$$$$$$$]"

  private def mainbody(name: String, href: String) =
    s"""<a class="MAINBODY" href="$href">$name</a><br>"""

  private def index(links: (String, String)*): String =
    links.map { case (n, h) => mainbody(n, h) }
      .mkString("<html><body>", "\n", "</body></html>")

  private def sectionHeader(title: String) =
    s"""<table class="SECTIONHEADER"><tr><td>$title</td></tr></table>"""

  // ------------------------------------------------------------------
  // Index files
  // ------------------------------------------------------------------

  def documentoHtml: String = index(
    "Relatório de Vendas" -> s"Documento_1.html#$RID",
    "Relatório Vazio" -> s"Documento_1.html#$RID2")

  def cuboIndexHtml: String = index(
    "Cubo Vendas" -> s"Cubo_1.html#$CUBOID",
    "Mês Atual" -> s"Cubo_1.html#$MESID")

  def relatorioIndexHtml: String = index(
    "Rel Aux" -> s"RelAux_1.html#$RELAUXID")

  def atalhoIndexHtml: String = index(
    "Atalho X" -> s"Atalho_1.html#$ATALHOID")

  // one content file per metric: the reference's formula walk scans all
  // tables to end-of-document (its SECTIONHEADER break can only fire on
  // a table whose first child is a table), so per-object files are the
  // structure under which its semantics are well-defined
  def metricaIndexHtml: String = index(
    "Receita Total" -> s"MetricaRT_1.html#$RECTOTID",
    "Custo" -> s"MetricaCUSTO_1.html#$CUSTOID",
    "Margem" -> s"MetricaMARGEM_1.html#$MARGEMID",
    "Ciclo A" -> s"MetricaCICLOA_1.html#$CICLOAID",
    "Ciclo B" -> s"MetricaCICLOB_1.html#$CICLOBID",
    "Métrica Média" -> s"MetricaMEDIA_1.html#$MEDIAID")

  def atributoIndexHtml: String = index(
    "Loja" -> s"Atributo_1.html#$LOJAID",
    "Tempo" -> s"Atributo_1.html#$TEMPOID")

  def fatoIndexHtml: String = index(
    "Receita" -> s"Fato_1.html#$RECFACTID")

  def funcaoIndexHtml: String = index(
    "Sum" -> s"Funcao_1.html#$SUMID")

  def tabelaLogicaIndexHtml: String = index(
    "FT_VENDAS" -> s"Tabela_1.html#$FTVID",
    "DIM_LOJA" -> s"Tabela_1.html#$DIMLID")

  def pastaIndexHtml: String = index(
    "Alice Admin" -> s"Pasta_1.html#$ALICEID",
    "Bob Builder (7572142)" -> s"Pasta_1.html#$BOBID",
    "Carlos Çedilha" -> s"Pasta_1.html#$CARLOSID")

  // ------------------------------------------------------------------
  // Content files
  // ------------------------------------------------------------------

  /** Both report sections concatenated, each inside its own tr. The
    * DOCUMENT DEFINITION td is a SIBLING cell (not an ancestor of the
    * whole section) so the first-matching-td scan lands on it.
    */
  def documentoContentHtml: String =
    s"""<html><body><table>
       |<tr><td><a name="$RID"></a>
       |<table>
       |<tr valign="TOP"><td>Proprietário:</td><td>Alice Admin</td></tr>
       |<tr valign="TOP"><td>Controle de Acesso:</td><td>
       |  <table>
       |  <tr><td>USUÁRIO</td><td>ACESSO</td></tr>
       |  <tr><td>Alice Admin</td><td>Full Control</td></tr>
       |  <tr><td>7572142</td><td>View</td></tr>
       |  </table>
       |</td></tr>
       |</table>
       |</td>
       |<td>DOCUMENT DEFINITION</td>
       |<td><table>
       |  <tr><td>
       |    <a href="CuboInteligente.html#${ph(CUBOID)}">Cubo Vendas</a>
       |    <a href="Relatório.html#${ph(RELAUXID)}">Rel Aux</a>
       |    <a href="Atalho.html#${ph(ATALHOID)}">Atalho X</a>
       |    <a href="CuboInteligente.html#${ph(MESID)}">Ms Atual</a>
       |    <a href="Nada.html#${ph(GHOSTID)}">Fantasma</a>
       |  </td></tr>
       |</table></td>
       |</tr>
       |<tr><td><a name="$RID2"></a>
       |<table>
       |<tr valign="TOP"><td>Proprietário:</td><td>Carlos Cedilha</td></tr>
       |</table>
       |</td>
       |<td>DOCUMENT DEFINITION</td>
       |<td><table><tr><td><a href="Nada.html#${ph(GHOSTID)}">Fantasma</a></td></tr></table></td>
       |</tr>
       |</table></body></html>""".stripMargin

  /** Two intelligent-cube sections. */
  def cuboContentHtml: String =
    s"""<html><body><table>
       |<tr><td><a name="$CUBOID"></a>
       |<td>OBJETOS DE TEMPLATE</td>
       |<table>
       |<tr><td>OBJETOS DO RELATÓRIO</td><td>LINHAS</td><td>COLUNAS</td><td>PAGINAR POR</td></tr>
       |<tr><td></td>
       |    <td><a href="Atributo_1.html#${ph(LOJAID)}">Loja</a></td>
       |    <td><a href="Metrica_1.html#${ph(RECTOTID)}">Receita Total</a>
       |        <a href="Metrica_1.html#${ph(MARGEMID)}">Margem</a>
       |        <a href="Metrica_1.html#${ph(EMBID)}">Derived X</a></td>
       |    <td></td></tr>
       |</table>
       |</td></tr>
       |<tr><td><a name="$MESID"></a>
       |<td>OBJETOS DE TEMPLATE</td>
       |<table>
       |<tr><td>OBJETOS DO RELATÓRIO</td><td>LINHAS</td><td>COLUNAS</td><td>PAGINAR POR</td></tr>
       |<tr><td></td>
       |    <td><a href="Atributo_1.html#${ph(TEMPOID)}">Tempo</a></td>
       |    <td><a href="Metrica_1.html#${ph(CUSTOID)}">Custo</a>
       |        <a href="Metrica_1.html#${ph(CICLOAID)}">Ciclo A</a></td>
       |    <td></td></tr>
       |</table>
       |</td></tr>
       |</table></body></html>""".stripMargin

  /** Report-type dataset: ViewReport marker, [ROWS]/[COLUMNS], graphic. */
  def relAuxContentHtml: String =
    s"""<html><body><table>
       |<tr><td><a name="$RELAUXID"></a>
       |<img src="images/ViewReport.bmp">
       |<!--[ROWS]--><table><tr><td><a href="Atributo_1.html#${ph(LOJAID)}">Loja</a></td></tr></table>
       |<!--[COLUMNS]--><table><tr><td><a href="Metrica_1.html#${ph(MEDIAREF)}">Média</a></td></tr></table>
       |<table>
       |<tr><td>OPÇÕES DO GRÁFICO</td></tr>
       |<tr><td>Tipo de gráfico:</td><td>Barra Vertical</td></tr>
       |</table>
       |</td></tr>
       |</table></body></html>""".stripMargin

  /** Per-metric content files: simple (image-classified ids), simple
    * (no-image first/second fallback), composite with duplicate child,
    * cycle pair, and the containment-resolved metric.
    */
  private def tipoRow(v: String) =
    s"""<table><tr><td>Tipo de métrica</td><td>$v</td></tr></table>"""
  private def metricFile(anchor: String, body: String) =
    s"""<html><body><table><tr><td><a name="$anchor"></a>${sectionHeader("DEFINIÇÃO")}$body</td></tr></table></body></html>"""

  def receitaTotalHtml: String = metricFile(RECTOTID,
    tipoRow("Métrica simples") +
      s"""<table><tr><td>FÓRMULA</td><td><img src="images/Function.bmp"><a href="Funcao_1.html#${ph(SUMID)}">Sum</a> ( <img src="images/Fact.bmp"><a href="Fato_1.html#${ph(RECFACTID)}">Receita</a> )</td></tr></table>""")

  def custoHtml: String = metricFile(CUSTOID,
    tipoRow("Métrica simples") +
      s"""<table><tr><td>FÓRMULA</td><td><a href="Funcao_1.html#${ph(SUMID)}">Sum</a> ( <a href="Fato_1.html#${ph(RECFACTID)}">Receita</a> )</td></tr></table>""")

  def margemHtml: String = metricFile(MARGEMID,
    tipoRow("Composto") +
      s"""<table><tr><td>FÓRMULA</td><td><img src="images/Metric.bmp"><a href="MetricaRT_1.html#${ph(RECTOTID)}">Receita Total</a> / <img src="images/Metric.bmp"><a href="MetricaCUSTO_1.html#${ph(CUSTOID)}">Custo</a> * <img src="images/Metric.bmp"><a href="MetricaRT_1.html#${ph(RECTOTID)}">Receita Total</a></td></tr></table>""")

  def cicloAHtml: String = metricFile(CICLOAID,
    tipoRow("Composto") +
      s"""<table><tr><td>FÓRMULA</td><td><img src="images/Metric.bmp"><a href="MetricaCICLOB_1.html#${ph(CICLOBID)}">Ciclo B</a></td></tr></table>""")

  def cicloBHtml: String = metricFile(CICLOBID,
    tipoRow("Composto") +
      s"""<table><tr><td>FÓRMULA</td><td><img src="images/Metric.bmp"><a href="MetricaCICLOA_1.html#${ph(CICLOAID)}">Ciclo A</a></td></tr></table>""")

  def mediaHtml: String = metricFile(MEDIAID,
    tipoRow("Métrica simples") +
      s"""<table><tr><td>FÓRMULA</td><td><img src="images/Function.bmp"><a href="Funcao_1.html#${ph(SUMID)}">Sum</a> ( <img src="images/Fact.bmp"><a href="Fato_1.html#${ph(RECFACTID)}">Receita</a> )</td></tr></table>""")

  /** Attribute sections with form details (form anchors carry `_`). */
  def atributoContentHtml: String =
    s"""<html><body><table>
       |<tr><td><a name="$LOJAID"></a>
       |${sectionHeader("DETALHES DOS FORMULÁRIOS DE ATRIBUTO")}
       |<a name="${LOJAID}_F1"></a>
       |<table><tr><td><b>ID</b></td></tr></table>
       |<table><tr><td>VALORES</td><td>
       |  <table>
       |  <tr><td>EXPRESSÃO</td><td>MÉTODO DE MAPEAMENTO</td><td>TABELAS FONTE</td></tr>
       |  <tr><td>COD_LOJA</td><td>Manual</td><td><a href="Tabela_1.html#${ph(FTVID)}">FT_VENDAS</a></td></tr>
       |  </table>
       |</td></tr></table>
       |<a name="${LOJAID}_F2"></a>
       |<table><tr><td><b>Descrição</b></td></tr></table>
       |<table><tr><td>VALORES</td><td>
       |  <table>
       |  <tr><td>EXPRESSÃO</td><td>MÉTODO DE MAPEAMENTO</td><td>TABELAS FONTE</td></tr>
       |  </table>
       |</td></tr></table>
       |</td></tr>
       |<tr><td><a name="$TEMPOID"></a>
       |${sectionHeader("DETALHES DOS FORMULÁRIOS DE ATRIBUTO")}
       |<a name="${TEMPOID}_F1"></a>
       |<table><tr><td><b>ID</b></td></tr></table>
       |<table><tr><td>VALORES</td><td>
       |  <table>
       |  <tr><td>EXPRESSÃO</td><td>MÉTODO DE MAPEAMENTO</td><td>TABELAS FONTE</td></tr>
       |  <tr><td>COD_TEMPO</td><td>Manual</td><td><a href="Tabela_1.html#${ph(DIMLID)}">DIM_LOJA</a></td></tr>
       |  </table>
       |</td></tr></table>
       |</td></tr>
       |</table></body></html>""".stripMargin

  /** Fact EXPRESSÕES section with a duplicate table link (first-wins). */
  def fatoContentHtml: String =
    s"""<html><body><table>
       |<tr><td><a name="$RECFACTID"></a>
       |${sectionHeader("EXPRESSÕES")}
       |<table>
       |<tr><td>EXPRESSÃO</td><td>TABELAS FONTE</td></tr>
       |<tr><td>VLR_RECEITA</td><td><a href="Tabela_1.html#${ph(FTVID)}">FT_VENDAS</a> <a href="Tabela_1.html#${ph(FTVID)}">FT_VENDAS</a></td></tr>
       |</table>
       |</td></tr>
       |</table></body></html>""".stripMargin

  /** The full corpus as (fileName → html). */
  def corpus: Map[String, String] = Map(
    "Documento.html" -> documentoHtml,
    "CuboInteligente.html" -> cuboIndexHtml,
    "Relatório.html" -> relatorioIndexHtml,
    "Atalho.html" -> atalhoIndexHtml,
    "Métrica.html" -> metricaIndexHtml,
    "Atributo.html" -> atributoIndexHtml,
    "Fato.html" -> fatoIndexHtml,
    "Função.html" -> funcaoIndexHtml,
    "TabelaLógica.html" -> tabelaLogicaIndexHtml,
    "Pasta.html" -> pastaIndexHtml,
    "Documento_1.html" -> documentoContentHtml,
    "Cubo_1.html" -> cuboContentHtml,
    "RelAux_1.html" -> relAuxContentHtml,
    "MetricaRT_1.html" -> receitaTotalHtml,
    "MetricaCUSTO_1.html" -> custoHtml,
    "MetricaMARGEM_1.html" -> margemHtml,
    "MetricaCICLOA_1.html" -> cicloAHtml,
    "MetricaCICLOB_1.html" -> cicloBHtml,
    "MetricaMEDIA_1.html" -> mediaHtml,
    "Atributo_1.html" -> atributoContentHtml,
    "Fato_1.html" -> fatoContentHtml)

  /** As rows of the pages table (Latin-1 encoded per the pinned decode
    * rule, SURVEY.md §1.2).
    */
  def pages: Seq[PageRow] = pagesOf(corpus)

  /** Any (fileName → html) map as pages rows — lets specs run surgically
    * modified corpora through both pipeline plans.
    */
  def pagesOf(corpus: Map[String, String]): Seq[PageRow] = {
    val baseTs = 1577836800000L
    corpus.toSeq.sortBy(_._1).zipWithIndex.map { case ((name, html), i) =>
      PageRow(s"mstr://fixture/$name", new Timestamp(baseTs + i),
        html.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1), "", "pt-BR")
    }
  }
}
