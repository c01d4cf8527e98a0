package graft.mstr

/** Locale configuration for MSTR-style documentation corpora
  * (cf. reference i18n/base.py:7-88, i18n/pt_br.py, i18n/en_us.py).
  * Carried as a plain value — broadcast-friendly, driven by the pages
  * table's `lang` column.
  */
final case class MstrLocale(
    code: String,
    // index file names
    documento: String, relatorio: String, cuboInteligente: String,
    atalho: String, metrica: String, fato: String, funcao: String,
    atributo: String, tabelaLogica: String, pasta: String,
    // section headers
    documentDefinition: String, objetosTemplate: String, definicao: String,
    expressoes: String, detalhesFormularios: String, opcoesGrafico: String,
    definicaoNorm: String, expressoesNorm: String,
    objetosTemplateNorm: String, opcoesGraficoNorm: String,
    // table headers
    expressao: String, expression: String, tabelasFonte: String,
    sourceTables: String, tabela: String, fonte: String,
    tipoMetrica: String, tipoGrafico: String, formula: String,
    datasets: String, linhas: String, colunas: String,
    objetosRelatorio: String, proprietario: String, controleAcesso: String,
    // comment markers + image markers
    rowsMarker: String, columnsMarker: String,
    viewReportImg: String, metricImg: String, functionImg: String, factImg: String)

object MstrLocale {

  val ptBR: MstrLocale = MstrLocale(
    code = "pt-BR",
    documento = "Documento.html", relatorio = "Relatório.html",
    cuboInteligente = "CuboInteligente.html", atalho = "Atalho.html",
    metrica = "Métrica.html", fato = "Fato.html", funcao = "Função.html",
    atributo = "Atributo.html", tabelaLogica = "TabelaLógica.html",
    pasta = "Pasta.html",
    documentDefinition = "DOCUMENT DEFINITION",
    objetosTemplate = "OBJETOS DE TEMPLATE",
    definicao = "DEFINIÇÃO", expressoes = "EXPRESSÕES",
    detalhesFormularios = "DETALHES DOS FORMULÁRIOS DE ATRIBUTO",
    opcoesGrafico = "OPÇÕES DO GRÁFICO",
    definicaoNorm = "DEFINICAO", expressoesNorm = "EXPRESSOES",
    objetosTemplateNorm = "OBJETOS DE TEMPLATE",
    opcoesGraficoNorm = "OPCOES DO GRAFICO",
    expressao = "EXPRESSÃO", expression = "EXPRESSION",
    tabelasFonte = "TABELAS FONTE", sourceTables = "SOURCE",
    tabela = "TABELA", fonte = "FONTE",
    tipoMetrica = "Tipo de métrica", tipoGrafico = "Tipo de gráfico",
    formula = "FÓRMULA", datasets = "Datasets:",
    linhas = "LINHAS", colunas = "COLUNAS",
    objetosRelatorio = "OBJETOS DO RELATÓRIO",
    proprietario = "Proprietário", controleAcesso = "Controle de Acesso",
    rowsMarker = "[ROWS]", columnsMarker = "[COLUMNS]",
    viewReportImg = "ViewReport", metricImg = "Metric",
    functionImg = "Function", factImg = "Fact")

  val enUS: MstrLocale = MstrLocale(
    code = "en-US",
    documento = "Document.html", relatorio = "Report.html",
    cuboInteligente = "IntelligentCube.html", atalho = "Shortcut.html",
    metrica = "Metric.html", fato = "Fact.html", funcao = "Function.html",
    atributo = "Attribute.html", tabelaLogica = "LogicalTable.html",
    pasta = "Folder.html",
    documentDefinition = "DOCUMENT DEFINITION",
    objetosTemplate = "TEMPLATE OBJECTS",
    definicao = "DEFINITION", expressoes = "EXPRESSIONS",
    detalhesFormularios = "ATTRIBUTE FORM DETAILS",
    opcoesGrafico = "CHART OPTIONS",
    definicaoNorm = "DEFINITION", expressoesNorm = "EXPRESSIONS",
    objetosTemplateNorm = "TEMPLATE OBJECTS",
    opcoesGraficoNorm = "CHART OPTIONS",
    expressao = "EXPRESSION", expression = "EXPRESSION",
    tabelasFonte = "SOURCE TABLES", sourceTables = "SOURCE",
    tabela = "TABLE", fonte = "SOURCE",
    tipoMetrica = "Metric Type", tipoGrafico = "Chart Type",
    formula = "FORMULA", datasets = "Datasets:",
    linhas = "ROWS", colunas = "COLUMNS",
    objetosRelatorio = "REPORT OBJECTS",
    proprietario = "Owner", controleAcesso = "Access Control",
    rowsMarker = "[ROWS]", columnsMarker = "[COLUMNS]",
    viewReportImg = "ViewReport", metricImg = "Metric",
    functionImg = "Function", factImg = "Fact")

  def forLang(lang: String): MstrLocale =
    if (lang != null && lang.toLowerCase(java.util.Locale.ROOT).startsWith("en")) enUS else ptBR
}
