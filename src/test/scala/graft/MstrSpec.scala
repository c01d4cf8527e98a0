package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.fixtures.MstrCorpus._
import graft.mstr._

/** Golden tests for the MSTR entity pipeline: expected entity trees are
  * hand-derived from the reference semantics (SURVEY.md §2) for the
  * deterministic fixture corpus, and compared structurally AND as
  * serialized JSON bytes.
  */
class MstrSpec extends AnyFunSuite {

  def md5U(s: String): String =
    org.apache.commons.codec.digest.DigestUtils.md5Hex(s).toUpperCase(java.util.Locale.ROOT)

  // ---- expected building blocks ----
  val ltFTV = LogicTable("FT_VENDAS", FTVID, Some(s"Tabela_1.html#$FTVID"), Some("VLR_RECEITA"))
  val factReceita = FactRef("Receita", RECFACTID, s"Fato_1.html#$RECFACTID", List(ltFTV))
  val funcSum = FunctionRef("Sum", SUMID, s"Funcao_1.html#$SUMID")

  def mReceitaTotal(ds: String) = Metrica("Receita Total", RECTOTID,
    s"MetricaRT_1.html#$RECTOTID", ds, "simples", Some("Metrica"),
    Some("Sum (Receita)"), Some(funcSum), Some(factReceita), Nil)

  def mCusto(ds: String) = Metrica("Custo", CUSTOID,
    s"MetricaCUSTO_1.html#$CUSTOID", ds, "simples", Some("Metrica"),
    Some("Sum (Receita)"), Some(funcSum), Some(factReceita), Nil)

  def mMargem(ds: String) = Metrica("Margem", MARGEMID,
    s"MetricaMARGEM_1.html#$MARGEMID", ds, "composto", Some("Metrica"),
    Some("Receita Total / Custo *"), None, None,
    List(mReceitaTotal(ds), mCusto(ds)))

  def mCicloB(ds: String) = Metrica("Ciclo B", CICLOBID,
    s"MetricaCICLOB_1.html#$CICLOBID", ds, "composto", Some("Metrica"),
    Some("Ciclo A"), None, None, Nil) // cycle pruned by visited set

  def mCicloA(ds: String) = Metrica("Ciclo A", CICLOAID,
    s"MetricaCICLOA_1.html#$CICLOAID", ds, "composto", Some("Metrica"),
    Some("Ciclo B"), None, None, List(mCicloB(ds)))

  def mMedia(ds: String) = Metrica("Métrica Média", MEDIAID,
    s"MetricaMEDIA_1.html#$MEDIAID", ds, "simples", Some("Metrica"),
    Some("Sum (Receita)"), Some(funcSum), Some(factReceita), Nil)

  def mEmbedded(ds: String) = Metrica("Derived X", EMBID,
    s"Metrica_1.html#[$$$$$$$$$EMBID$$$$$$$$]", ds, "embedded",
    Some("DerivedMetric"), None, None, None, Nil)

  def aLoja(ds: String) = Atributo("Loja", "Loja", LOJAID,
    s"Atributo_1.html#$LOJAID", ds, Some("Atributo"), List(
      Formulario(md5U(s"${LOJAID}_ID"), "ID",
        List(LogicTable("FT_VENDAS", FTVID, Some(s"Tabela_1.html#$FTVID"), Some("COD_LOJA")))),
      Formulario(md5U(s"${LOJAID}_Descrição"), "Descrição", Nil)))

  def aTempo(ds: String) = Atributo("Tempo", "Tempo", TEMPOID,
    s"Atributo_1.html#$TEMPOID", ds, Some("Atributo"), List(
      Formulario(md5U(s"${TEMPOID}_ID"), "ID",
        List(LogicTable("DIM_LOJA", DIMLID, Some(s"Tabela_1.html#$DIMLID"), Some("COD_TEMPO"))))))

  val expectedR1 = Relatorio("Relatório de Vendas", RID, s"Documento_1.html#$RID",
    List(
      DataSet("Cubo Vendas", CUBOID, s"Cubo_1.html#$CUBOID", RID,
        Some("CuboInteligente"), None, List(aLoja(CUBOID)),
        List(mReceitaTotal(CUBOID), mMargem(CUBOID), mEmbedded(CUBOID))),
      DataSet("Rel Aux", RELAUXID, s"RelAux_1.html#$RELAUXID", RID,
        Some("Report"), Some("Barra Vertical"), List(aLoja(RELAUXID)),
        List(mMedia(RELAUXID))),
      DataSet("Atalho X", ATALHOID, s"Atalho_1.html#$ATALHOID", RID,
        Some("Shortcut"), None, Nil, Nil),
      DataSet("Mês Atual", MESID, s"Cubo_1.html#$MESID", RID,
        Some("CuboInteligente"), None, List(aTempo(MESID)),
        List(mCusto(MESID), mCicloA(MESID))),
      DataSet("Fantasma", GHOSTID, "", RID, Some(""), None, Nil, Nil)),
    Some(Owner("Alice Admin", ALICEID, s"Pasta_1.html#$ALICEID",
      Some("Alice Admin"), Some("owner"))),
    List(
      AccessControlEntry("Alice Admin", "Full Control", Some("Alice Admin"),
        Some(ALICEID), Some(s"Pasta_1.html#$ALICEID")),
      AccessControlEntry("7572142", "View", Some("Bob Builder (7572142)"),
        Some(BOBID), Some(s"Pasta_1.html#$BOBID"))))

  val expectedR2 = Relatorio("Relatório Vazio", RID2, s"Documento_1.html#$RID2",
    List(DataSet("Fantasma", GHOSTID, "", RID2, Some(""), None, Nil, Nil)),
    Some(Owner("Carlos Cedilha", CARLOSID, s"Pasta_1.html#$CARLOSID",
      Some("Carlos Çedilha"), Some("owner"))),
    Nil)

  private def engine(): MstrEngine = {
    val loc = MstrLocale.ptBR
    val parsed = scala.collection.mutable.Map.empty[String, Option[Soup]]
    val files: String => Option[Soup] =
      f => parsed.getOrElseUpdate(f, corpus.get(f).map(Soup.parse))
    new MstrEngine(MstrPipeline.buildIndexes(corpus, loc), files, loc)
  }

  test("full report extraction matches the hand-derived golden tree") {
    val eng = engine()
    val links = MstrPipeline.buildIndexes(corpus, MstrLocale.ptBR).documento.links
    assert(links.size == 2)
    val r1 = eng.extractReport(links(0)).get
    val r2 = eng.extractReport(links(1)).get
    assert(r1 == expectedR1, s"\nGOT:\n${JsonExport.exportOne(r1)}\nEXPECTED:\n${JsonExport.exportOne(expectedR1)}")
    assert(r2 == expectedR2, s"\nGOT:\n${JsonExport.exportOne(r2)}\nEXPECTED:\n${JsonExport.exportOne(expectedR2)}")
  }

  test("JSON export is byte-identical to the golden serialization") {
    val eng = engine()
    val links = MstrPipeline.buildIndexes(corpus, MstrLocale.ptBR).documento.links
    val got = JsonExport.exportAll(links.flatMap(eng.extractReport).toList)
    val expected = JsonExport.exportAll(List(expectedR1, expectedR2))
    assert(got.getBytes("UTF-8").sameElements(expected.getBytes("UTF-8")))
  }

  test("latin-1 pages roundtrip: corpusFromPages reproduces the corpus") {
    val rebuilt = MstrPipeline.corpusFromPages(pages)
    assert(rebuilt == corpus)
  }

  test("cycle expansion terminates and prunes exactly one level") {
    val eng = engine()
    val m = eng.extractMetric("Ciclo A", s"MetricaCICLOA_1.html#$CICLOAID",
      "DS", Some(CICLOAID), scala.collection.mutable.Set.empty).get
    assert(m.metricas.map(_.name) == List("Ciclo B"))
    assert(m.metricas.head.metricas.isEmpty)
  }

  test("fuzzy owner lookup: accent-normalized and parenthesized-id users") {
    val idx = MstrPipeline.buildIndexes(corpus, MstrLocale.ptBR)
    assert(idx.pasta.findByName("Carlos Cedilha").map(_.name) == Some("Carlos Çedilha"))
    assert(idx.pasta.findByName("7572142") == None)
    assert(idx.pasta.findUserByParenthesizedName("7572142").map(_.anchor) == Some(BOBID))
  }

  test("metric link containment resolution (both directions)") {
    val idx = MstrPipeline.buildIndexes(corpus, MstrLocale.ptBR)
    assert(idx.metrica.findMetricLink("Média", Some(MEDIAREF)).map(_.name) == Some("Métrica Média"))
    assert(idx.metrica.findMetricLink("", Some(RECTOTID)).map(_.name) == Some("Receita Total"))
  }

  test("spark MstrPipeline: distributed extraction, nodes/edges, integrity") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val (reports, nodes, edges) = MstrPipeline.run(spark, pages, "pt-BR", numPartitions = 3)
    val rows = reports.collect().sortBy(_.report_id)
    assert(rows.length == 2)
    val byId = rows.map(r => r.report_id -> r.json).toMap
    assert(byId(RID) == JsonExport.exportOne(expectedR1))
    assert(byId(RID2) == JsonExport.exportOne(expectedR2))
    // integrity: no label+id with conflicting names (A10)
    assert(MstrPipeline.duplicateIdCheck(nodes).count() == 0)
    // summary sanity (A9)
    val summary = MstrPipeline.summary(nodes, edges).as[(String, Long)].collect().toMap
    assert(summary("Report") == 2)
    assert(summary("Metric") == 7) // RT, Custo, Margem, CicloA, CicloB, Média, Derived X
    assert(summary("Attribute") == 2)
    assert(summary("COMPOSED_OF") == 3) // Margem→RT, Margem→Custo, CicloA→CicloB
    assert(summary("OWNS") == 2)
    assert(summary("VIEW") == 1)
    assert(summary("FULL_CONTROL") == 1)
    // environment rooting: ONE Environment node; every distinct entity
    // node has a BELONGS_TO edge to it (load_to_neo4j.py:195-221,237-740)
    assert(summary("Environment") == 1)
    val entityKeys = nodes.collect().filter(_.label != "Environment")
      .map(n => (n.label, n.id)).toSet
    val belongsSrc = edges.collect().filter(_.edge_type == "BELONGS_TO")
      .map(e => (e.src_label, e.src_id)).toSet
    assert(edges.collect().filter(_.edge_type == "BELONGS_TO")
      .forall(e => e.dst_label == "Environment" && e.dst_id == "default"))
    assert(belongsSrc == entityKeys)
  }
}
