package graft.mstr

/** Byte-exact serializer matching the reference exporter's output:
  * Python `json.dump(..., indent=2, ensure_ascii=False)` with the key
  * order of json_exporter.py:19-179. Goldens are byte-compared against
  * this output.
  */
object JsonExport {

  sealed trait J
  final case class JStr(s: String) extends J
  case object JNull extends J
  final case class JArr(items: List[J]) extends J
  final case class JObj(fields: List[(String, J)]) extends J

  /** Python json string escaping (ensure_ascii=False): short escapes for
    * `"` `\` \b \t \n \f \r; other C0 controls as \u00XX; everything
    * else verbatim.
    */
  def escape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\b' => sb.append("\\b")
      case '\t' => sb.append("\\t")
      case '\n' => sb.append("\\n")
      case '\f' => sb.append("\\f")
      case '\r' => sb.append("\\r")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  def render(j: J, indent: Int = 0): String = {
    val pad = "  " * indent
    val padIn = "  " * (indent + 1)
    j match {
      case JNull => "null"
      case JStr(s) => "\"" + escape(s) + "\""
      case JArr(Nil) => "[]"
      case JArr(items) =>
        items.map(i => padIn + render(i, indent + 1))
          .mkString("[\n", ",\n", s"\n$pad]")
      case JObj(Nil) => "{}"
      case JObj(fields) =>
        fields.map { case (k, v) =>
          padIn + "\"" + escape(k) + "\": " + render(v, indent + 1)
        }.mkString("{\n", ",\n", s"\n$pad}")
    }
  }

  private def js(s: String): J = if (s == null) JNull else JStr(s)
  private def jo(o: Option[String]): J = o.map(JStr).getOrElse(JNull)

  /** `base_path/` prefix on every file_path (json_exporter.py:12-16). */
  private def path(p: String, basePath: String): J =
    if (p == null) JNull else JStr(s"$basePath/$p")
  private def path(p: Option[String], basePath: String): J =
    p.map(v => JStr(s"$basePath/$v")).getOrElse(JNull)

  private def logicTable(lt: LogicTable, bp: String): J = JObj(List(
    "name" -> js(lt.name),
    "id" -> js(lt.id),
    "migration_stage" -> JNull,
    "decision" -> JNull,
    "file_path" -> path(lt.filePath, bp),
    "column_name" -> jo(lt.columnName)))

  /** serialize_metric (json_exporter.py:19-72), recursive. */
  def metric(m: Metrica, bp: String): J = JObj(List(
    "name" -> js(m.name),
    "id" -> js(m.id),
    "migration_stage" -> JNull,
    "decision" -> JNull,
    "file_path" -> path(m.filePath, bp),
    "applicationObject" -> jo(m.applicationObject),
    "tipo" -> js(m.tipo),
    "formula" -> jo(m.formula),
    "function" -> m.function.map(f => JObj(List(
      "name" -> js(f.name),
      "id" -> js(f.id),
      "migration_stage" -> JNull,
      "decision" -> JNull,
      "file_path" -> path(f.filePath, bp)))).getOrElse(JNull),
    "fact" -> m.fact.map(f => JObj(List(
      "name" -> js(f.name),
      "id" -> js(f.id),
      "migration_stage" -> JNull,
      "decision" -> JNull,
      "file_path" -> path(f.filePath, bp),
      "logic_tables" -> JArr(f.logicTables.map(logicTable(_, bp)))))).getOrElse(JNull),
    "metricas" -> JArr(m.metricas.map(metric(_, bp)))))

  def relatorio(r: Relatorio, bp: String): J = JObj(List(
    "name" -> js(r.name),
    "id" -> js(r.id),
    "migration_stage" -> JNull,
    "decision" -> JNull,
    "file_path" -> path(r.filePath, bp),
    "datasets" -> JArr(r.datasets.map { d =>
      JObj(List(
        "name" -> js(d.name),
        "id" -> js(d.id),
        "migration_stage" -> JNull,
        "decision" -> JNull,
        "file_path" -> path(d.filePath, bp),
        "applicationObject" -> jo(d.applicationObject),
        "graphic" -> jo(d.graphic),
        "atributos" -> JArr(d.atributos.map { a =>
          JObj(List(
            "name" -> js(a.name),
            "name_on_dataset" -> js(a.nameOnDataset),
            "id" -> js(a.id),
            "migration_stage" -> JNull,
            "decision" -> JNull,
            "file_path" -> path(a.filePath, bp),
            "applicationSchema" -> jo(a.applicationSchema),
            "formularios" -> JArr(a.formularios.map { f =>
              JObj(List(
                "id" -> js(f.id),
                "name" -> js(f.name),
                "migration_stage" -> JNull,
                "decision" -> JNull,
                "logic_tables" -> JArr(f.logicTables.map(logicTable(_, bp)))))
            })))
        }),
        "metricas" -> JArr(d.metricas.map(metric(_, bp)))))
    }),
    "owner" -> r.owner.map(o => JObj(List(
      "name" -> js(o.name),
      "id" -> js(o.id),
      "file_path" -> path(o.filePath, bp),
      "fullname" -> jo(o.fullname),
      "access" -> jo(o.access),
      "migration_stage" -> JNull,
      "decision" -> JNull))).getOrElse(JNull),
    "access_control" -> JArr(r.accessControl.map(ac => JObj(List(
      "name" -> js(ac.name),
      "access" -> js(ac.access),
      "fullname" -> jo(ac.fullname),
      "id" -> jo(ac.id),
      "migration_stage" -> JNull,
      "decision" -> JNull,
      "file_path" -> path(ac.filePath, bp)))))))

  /** export_to_json (json_exporter.py:75-179): whole-corpus document. */
  def exportAll(rs: List[Relatorio], basePath: String = ""): String =
    render(JObj(List("relatorios" -> JArr(rs.map(relatorio(_, basePath))))))

  /** Single-report JSON (one row per report in the Spark output table). */
  def exportOne(r: Relatorio, basePath: String = ""): String =
    render(relatorio(r, basePath))
}
