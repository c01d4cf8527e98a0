package graft.mstr

/** Entity model mirroring the reference's dataclass tree
  * (core/models.py:7-136). The recursive `metricas` list lives only in
  * these row-local values and the JSON sink — the Spark-facing shape is
  * the flattened node/edge tables (Catalyst schemas cannot recurse,
  * SURVEY.md §7.4.2).
  */
final case class LinkResult(name: String, file: String, anchor: String,
                            href: String, id: String)

final case class LogicTable(name: String, id: String,
                            filePath: Option[String], columnName: Option[String])

final case class Formulario(id: String, name: String, logicTables: List[LogicTable])

final case class Atributo(name: String, nameOnDataset: String, id: String,
                          filePath: String, datasetId: String,
                          applicationSchema: Option[String],
                          formularios: List[Formulario])

final case class FunctionRef(name: String, id: String, filePath: String)

final case class FactRef(name: String, id: String, filePath: String,
                         logicTables: List[LogicTable])

final case class Metrica(name: String, id: String, filePath: String,
                         datasetId: String, tipo: String,
                         applicationObject: Option[String],
                         formula: Option[String],
                         function: Option[FunctionRef],
                         fact: Option[FactRef],
                         metricas: List[Metrica])

final case class Owner(name: String, id: String, filePath: String,
                       fullname: Option[String], access: Option[String])

final case class AccessControlEntry(name: String, access: String,
                                    fullname: Option[String], id: Option[String],
                                    filePath: Option[String])

final case class DataSet(name: String, id: String, filePath: String,
                         relatorioId: String, applicationObject: Option[String],
                         graphic: Option[String],
                         atributos: List[Atributo], metricas: List[Metrica])

final case class Relatorio(name: String, id: String, filePath: String,
                           datasets: List[DataSet], owner: Option[Owner],
                           accessControl: List[AccessControlEntry])

/** Intermediate parse results (reference core/types.py). */
final case class MetricDefinition(tipo: String, formula: Option[String],
                                  functionId: Option[String], factId: Option[String],
                                  childMetricIds: List[String])

final case class TemplateObjectRef(nameOnDataset: String, href: String, id: Option[String])
