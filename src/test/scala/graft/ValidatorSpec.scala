package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.mstr._

/** The validation stage must flag exactly the Pydantic rules the
  * reference enforces (data_validator.py:18-138) — field patterns,
  * enums, and the warning-level structural checks.
  */
class ValidatorSpec extends AnyFunSuite {

  private val goodId = "A" * 32
  private val goodTable = LogicTable("T1", "B" * 32, Some("t.html#X"), Some("C1"))
  private val goodFact = FactRef("F", "C" * 32, "f.html#Y", List(goodTable))
  private val goodFn = FunctionRef("Sum", "D" * 32, "fn.html#Z")

  private def metric(id: String = "E" * 32, tipo: String = "simples",
                     fact: Option[FactRef] = Some(goodFact),
                     children: List[Metrica] = Nil): Metrica =
    Metrica("M", id, "m.html#A", "ds", tipo, None, None, Some(goodFn), fact, children)

  private def report(id: String = goodId, datasets: List[DataSet]): Relatorio =
    Relatorio("R", id, "r.html#A", datasets, None, Nil)

  private def dataset(metricas: List[Metrica]): DataSet =
    DataSet("D", "F" * 32, "d.html#B", goodId, Some("Report"), None,
      List(Atributo("At", "At", "0" * 32, "a.html#C", "ds", None,
        List(Formulario("1" * 32, "ID", List(goodTable))))),
      metricas)

  test("healthy tree has no violations") {
    val r = report(datasets = List(dataset(List(metric()))))
    assert(Validator.validate(r).isEmpty)
  }

  test("every rule fires on a deliberately broken tree") {
    val broken = Relatorio(
      name = "",                       // name_min_length (error)
      id = "a" * 32,                   // id_pattern — lowercase (error)
      filePath = "",                   // file_path_min_length (error)
      datasets = List(
        DataSet("D", "zz", "d.html#B", goodId, None, None, // id_pattern (error)
          Nil,                         // dataset_without_atributos (warning)
          List(
            metric(tipo = "embedded"), // tipo_enum (error)
            metric(tipo = "simples", fact = None),     // simple_without_fact
            metric(tipo = "composto", children = Nil), // composite_without_children
            metric(fact = Some(goodFact.copy(logicTables = Nil))), // fact_without_tables
            metric(fact = Some(goodFact.copy(
              logicTables = List(goodTable.copy(id = "xyz")))))))), // lt id_pattern
      owner = None, accessControl = Nil)
    val v = Validator.validate(broken)
    val rules = v.map(x => (x.entity, x.rule, x.severity)).toSet
    assert(rules.contains(("Report", "name_min_length", "error")))
    assert(rules.contains(("Report", "id_pattern", "error")))
    assert(rules.contains(("Report", "file_path_min_length", "error")))
    assert(rules.contains(("Dataset", "id_pattern", "error")))
    assert(rules.contains(("Dataset", "dataset_without_atributos", "warning")))
    assert(rules.contains(("Metric", "tipo_enum", "error")))
    assert(rules.contains(("Metric", "simple_without_fact", "warning")))
    assert(rules.contains(("Metric", "composite_without_children", "warning")))
    assert(rules.contains(("Fact", "fact_without_tables", "warning")))
    assert(rules.contains(("LogicTable", "id_pattern", "error")))
  }

  test("empty datasets is a report-level error (Pydantic raise, not warn)") {
    val v = Validator.validate(report(datasets = Nil))
    assert(v.exists(x => x.rule == "report_without_datasets" && x.severity == "error"))
  }

  test("distributed validation over the fixture corpus flags the embedded metric") {
    val spark = SparkTestSession.spark
    val v = MstrPipeline.validation(spark, graft.fixtures.MstrCorpus.pages, "pt-BR", 2)
      .collect()
    // the fixture's Derived X metric carries tipo='embedded'
    // (report_extractor.py:263-285 fallback) — a tipo_enum violation
    // under the reference's validation schema
    assert(v.exists(x => x.rule == "tipo_enum" && x.severity == "error"))
    // all violations carry a report id from the corpus
    assert(v.forall(_.report_id.nonEmpty))
  }
}
