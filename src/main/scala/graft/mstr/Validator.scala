package graft.mstr

/** Validation stage over the extracted entity tree — the Pydantic
  * schema's analog (data_validator.py:18-138). Every rule from the
  * reference's models is re-expressed as a row-local check producing
  * violation rows instead of log lines, so the result is a queryable
  * `violations` table (data_validator.py:175-248 aggregates the same
  * information into a ValidationResult).
  *
  * severity "error" mirrors Pydantic field failures (patterns /
  * min_length / required); severity "warning" mirrors the `@validator`
  * warnings (fact without logic tables data_validator.py:40-44, simple
  * metric without fact 63-67, composite without components 69-75, form
  * without tables 83-88, attribute without forms 103-108, dataset
  * without atributos/metricas 121-126).
  */
final case class ViolationRow(report_id: String, entity: String, entity_id: String,
                              severity: String, rule: String, detail: String)

object Validator {

  private val HexId = "^[A-F0-9]{32}$".r
  // datasets may carry a deterministic GUID fallback (F10) — the
  // reference allows UUID shapes here (ValidatedDataSet.id pattern)
  private val DatasetId = "^[A-F0-9a-f-]{32,36}$".r

  def validate(r: Relatorio): Seq[ViolationRow] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[ViolationRow]
    def err(entity: String, id: String, rule: String, detail: String): Unit =
      out += ViolationRow(r.id, entity, id, "error", rule, detail)
    def warn(entity: String, id: String, rule: String, detail: String): Unit =
      out += ViolationRow(r.id, entity, id, "warning", rule, detail)

    def requireName(entity: String, id: String, name: String): Unit =
      if (name.isEmpty) err(entity, id, "name_min_length", "empty name")
    def requireHexId(entity: String, id: String): Unit =
      if (HexId.findFirstIn(id).isEmpty)
        err(entity, id, "id_pattern", s"id not ^[A-F0-9]{32}$$: '$id'")
    def requireFilePath(entity: String, id: String, fp: String): Unit =
      if (fp.isEmpty) err(entity, id, "file_path_min_length", "empty file_path")

    def walkLogicTable(owner: String, lt: LogicTable): Unit = {
      requireName("LogicTable", lt.id, lt.name)
      requireHexId("LogicTable", lt.id)
    }

    def walkMetric(m: Metrica): Unit = {
      requireName("Metric", m.id, m.name)
      requireHexId("Metric", m.id)
      requireFilePath("Metric", m.id, m.filePath)
      if (m.tipo != "simples" && m.tipo != "composto")
        err("Metric", m.id, "tipo_enum", s"tipo not simples|composto: '${m.tipo}'")
      if (m.tipo == "simples" && m.fact.isEmpty)
        warn("Metric", m.id, "simple_without_fact", s"simple metric '${m.name}' has no fact")
      if (m.tipo == "composto" && m.metricas.isEmpty)
        warn("Metric", m.id, "composite_without_children",
          s"composite metric '${m.name}' has no components")
      m.function.foreach { f =>
        requireName("Function", f.id, f.name)
        requireFilePath("Function", f.id, f.filePath)
      }
      m.fact.foreach { f =>
        requireName("Fact", f.id, f.name)
        requireHexId("Fact", f.id)
        requireFilePath("Fact", f.id, f.filePath)
        if (f.logicTables.isEmpty)
          warn("Fact", f.id, "fact_without_tables", s"fact '${f.name}' has no logic tables")
        f.logicTables.foreach(walkLogicTable(f.id, _))
      }
      m.metricas.foreach(walkMetric)
    }

    def walkAttribute(a: Atributo): Unit = {
      requireName("Attribute", a.id, a.name)
      if (a.nameOnDataset.isEmpty)
        err("Attribute", a.id, "name_on_dataset_min_length", "empty name_on_dataset")
      requireHexId("Attribute", a.id)
      requireFilePath("Attribute", a.id, a.filePath)
      if (a.formularios.isEmpty)
        warn("Attribute", a.id, "attribute_without_forms",
          s"attribute '${a.name}' has no forms")
      a.formularios.foreach { f =>
        requireName("Form", f.id, f.name)
        if (f.logicTables.isEmpty)
          warn("Form", f.id, "form_without_tables", s"form '${f.name}' has no logic tables")
        f.logicTables.foreach(walkLogicTable(f.id, _))
      }
    }

    requireName("Report", r.id, r.name)
    requireHexId("Report", r.id)
    requireFilePath("Report", r.id, r.filePath)
    if (r.datasets.isEmpty)
      err("Report", r.id, "report_without_datasets", "Report must have at least one dataset")
    r.datasets.foreach { d =>
      requireName("Dataset", d.id, d.name)
      if (DatasetId.findFirstIn(d.id).isEmpty)
        err("Dataset", d.id, "id_pattern", s"id not hex/uuid shaped: '${d.id}'")
      if (d.atributos.isEmpty)
        warn("Dataset", d.id, "dataset_without_atributos", s"dataset '${d.name}' has no atributos")
      if (d.metricas.isEmpty)
        warn("Dataset", d.id, "dataset_without_metricas", s"dataset '${d.name}' has no metricas")
      d.atributos.foreach(walkAttribute)
      d.metricas.foreach(walkMetric)
    }
    out.toSeq
  }
}
