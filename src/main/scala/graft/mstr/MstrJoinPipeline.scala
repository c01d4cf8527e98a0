package graft.mstr

import graft.pipeline.PageRow
import graft.text.TextOps
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, count, substring_index}
import scala.collection.mutable

/** Join-based MSTR extraction for corpora too big to broadcast — the
  * documented escape hatch of [[MstrPipeline]] (which broadcasts the
  * whole content corpus, a bounded-documentation-export assumption).
  *
  * Shape: the content pages stay DISTRIBUTED as a `Dataset[PageRow]`;
  * only the 9 index files (small dims by construction) are collected
  * and broadcast. Extraction proceeds in staged passes mirroring the
  * engine's call graph (report → dataset → attribute/metric → fact,
  * report_extractor.py:155-297); each stage joins a compact REQUEST
  * table (entity-scale, broadcast) against the pages table on file
  * name — the pages scan streams, nothing corpus-sized ever shuffles,
  * and every requested page is parsed once per stage. Composite-metric
  * recursion (A3) is an iterative stage loop carrying the visited PATH
  * per branch, exactly the engine's per-branch `visited.copy()`
  * semantics. Fragments are assembled into the nested tree per report
  * in one `groupByKey(report_id)` pass.
  *
  * Missing-file semantics match the engine: report/dataset/metric
  * requests whose file is absent simply drop out of the inner join
  * (engine returns None); fact tables default to empty (the engine
  * keeps the FactRef with no logic tables), overridden when the fact
  * page is found.
  *
  * Same parsers, same broadcast indexes, same output: byte-identical
  * report JSON via both paths (MstrJoinSpec).
  */
object MstrJoinPipeline {

  // ---- stage records (all non-recursive → Catalyst-encodable) ----

  final case class PageHtml(file: String, url: String, html: String)

  final case class ReportReq(file: String, name: String, href: String, ord: Int)
  final case class DsReq(report_id: String, ds_ord: Int, ds_name: String,
                         ds_id: String, ds_file: String, file: String, source: String)
  final case class AttrReq(report_id: String, ds_ord: Int, ord: Int, official: String,
                           name_on_ds: String, file: String, anchor: String, ds_id: String)
  final case class MetricReq(report_id: String, ds_ord: Int, pos: Seq[Int], ds_id: String,
                             name: String, file: String, anchor: String,
                             id_opt: Option[String], path: Seq[String])
  final case class FactReq(report_id: String, ds_ord: Int, pos: Seq[Int],
                           file: String, anchor: String)

  final case class SkelFrag(name: String, file_path: String,
                            owner: Option[Owner], acl: Seq[AccessControlEntry])
  final case class DsFrag(ds_ord: Int, name: String, id: String, file_path: String,
                          application_object: Option[String], graphic: Option[String])
  final case class AttrFrag(ds_ord: Int, ord: Int, attr: Atributo)
  final case class MetricNodeFrag(ds_ord: Int, pos: Seq[Int], name: String, id: String,
                                  file_path: String, tipo: String,
                                  application_object: Option[String], formula: Option[String],
                                  function: Option[FunctionRef], fact: Option[FactRef])
  final case class FactFrag(ds_ord: Int, pos: Seq[Int], tables: Seq[LogicTable])

  /** Fragment envelope: the typed payloads above ride as a compact
    * java-serialized blob. Keeping the Spark-facing schema at three
    * primitive columns (vs five deeply nested optional structs) cuts
    * Catalyst analysis time per internal job by an order of magnitude —
    * the payloads are internal to this pipeline, never queried
    * columnar, and the recursive tree they feed can't be a Catalyst
    * schema anyway (SURVEY.md §7.4.2).
    */
  final case class Frag(report_id: String, blob: Array[Byte])

  object Frag {
    def of(reportId: String, payload: Serializable): Frag = {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(payload)
      oos.close()
      Frag(reportId, bos.toByteArray)
    }
    def read(f: Frag): AnyRef =
      new java.io.ObjectInputStream(
        new java.io.ByteArrayInputStream(f.blob)).readObject()
  }

  final case class RStageOut(frag: Option[Frag], ds: Option[DsReq])
  final case class DStageOut(frag: Option[Frag], attr: Option[AttrReq],
                             metric: Option[MetricReq])
  final case class MStageOut(frag: Option[Frag], child: Option[MetricReq],
                             factReq: Option[FactReq])

  private def fileName(url: String): String = url.substring(url.lastIndexOf('/') + 1)
  private def filePathOf(l: LinkResult): String =
    if (l.anchor.nonEmpty) s"${l.file}#${l.anchor}" else l.file
  private def splitPath(p: String): (String, String) = {
    val parts = p.split("#", 2)
    (parts(0), if (parts.length > 1) parts(1) else "")
  }
  private def guid(seed: String): String = TextOps.md5HexUpper(seed)

  /** `internalShufflePartitions` sizes the request-side shuffles: every
    * internal exchange here carries entity-scale request/fragment rows
    * (never pages), so a narrow width collapses the orchestration
    * latency of the many small jobs on small corpora; raise it when the
    * entity count warrants. The pages scan itself is never shuffled
    * (duplicate-basename anomalies excepted — see the dedup pass).
    *
    * The returned Dataset is PERSISTED (run() materializes eagerly so
    * all internal jobs execute under the scoped conf); a long-lived
    * session issuing many runs should `unpersist()` results it is done
    * with.
    */
  def run(spark: SparkSession, pagesDs: Dataset[PageRow],
          lang: String = "pt-BR",
          internalShufflePartitions: Int = 4,
          select: Option[LinkIndex => Seq[LinkResult]] = None): Dataset[ReportJsonRow] = {
    import spark.implicits._
    // Duplicate-basename detection is a corpus-wide aggregation (one
    // key per page in the worst case), so it runs OUTSIDE the scoped
    // conf at the session's full shuffle width with AQE on — only the
    // entity-scale internal jobs get the narrow width below. The scan
    // is pruned to the url column; html is never read here.
    val indexFiles = indexFileSet(MstrLocale.forLang(lang))
    val dupFiles: Set[String] = pagesDs.toDF()
      .select(substring_index(col("url"), "/", -1).as("file"))
      .filter(!col("file").isin(indexFiles.toSeq: _*))
      .groupBy(col("file")).agg(count(col("file")).as("n"))
      .filter(col("n") > 1).select(col("file")).as[String].collect().toSet

    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    val prevCodegen = spark.conf.get("spark.sql.codegen.wholeStage")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.shuffle.partitions", internalShufflePartitions.toString)
    // the ~30 internal jobs are tiny and all distinct plans: janino
    // compilation per plan costs more than interpreted eval saves here
    // (the expensive work — html parsing — is opaque to codegen anyway),
    // and AQE's per-shuffle re-planning is pure overhead at a fixed
    // 4-partition width
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try runScoped(spark, pagesDs, lang, select, dupFiles)
    finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      spark.conf.set("spark.sql.codegen.wholeStage", prevCodegen)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  private def indexFileSet(loc: MstrLocale): Set[String] =
    Set(loc.documento, loc.relatorio, loc.cuboInteligente,
      loc.atalho, loc.metrica, loc.fato, loc.funcao, loc.atributo, loc.tabelaLogica,
      loc.pasta)

  private def runScoped(spark: SparkSession, pagesDs: Dataset[PageRow],
                        lang: String,
                        select: Option[LinkIndex => Seq[LinkResult]],
                        dupFiles: Set[String]): Dataset[ReportJsonRow] = {
    import spark.implicits._
    val loc = MstrLocale.forLang(lang)
    val indexFiles: Set[String] = indexFileSet(loc)

    // the ONLY collected data: the 9 locale index files (small dims)
    val indexPages = pagesDs.filter(p => indexFiles.contains(fileName(p.url))).collect()
    val indexes = MstrPipeline.buildIndexes(
      MstrPipeline.corpusFromPages(indexPages.toSeq), loc)
    val bIdx = spark.sparkContext.broadcast(indexes)

    val pagesRaw: Dataset[PageHtml] = pagesDs
      .filter(p => !indexFiles.contains(fileName(p.url)))
      .map(p => PageHtml(fileName(p.url), p.url, TextOps.decodeLatin1(p.html)))

    // Duplicate-basename dedup (greatest url wins — same rule as
    // corpusFromPages) happens ONCE, and only anomalous files pay (the
    // detection ran in run() at session parallelism): corpora with
    // unique file keys skip the reduction entirely — the pages side
    // then streams through every stage join unshuffled.
    val pages: Dataset[PageHtml] =
      if (dupFiles.isEmpty) pagesRaw
      else {
        val bDup = spark.sparkContext.broadcast(dupFiles)
        val clean = pagesRaw.filter(p => !bDup.value.contains(p.file))
        val dedupedDups = pagesRaw.filter(p => bDup.value.contains(p.file))
          .groupByKey(_.file)
          .reduceGroups((a, b) => if (a.url >= b.url) a else b)
          .map(_._2)
        clean.union(dedupedDups)
      }

    /** One pass: requests grouped per file (small side, broadcast),
      * inner-joined against the pages table; each matched page is
      * parsed ONCE and all its requests applied row-locally.
      */
    // grouped-request encoders derived ONCE per run — TypeTag reflection
    // per stage call would otherwise re-pay the derivation every metric
    // level (the metric loop calls stage once per recursion depth)
    import org.apache.spark.sql.Encoder
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    implicit val encReport: Encoder[(String, Seq[ReportReq])] = ExpressionEncoder()
    implicit val encDs: Encoder[(String, Seq[DsReq])] = ExpressionEncoder()
    implicit val encAttr: Encoder[(String, Seq[AttrReq])] = ExpressionEncoder()
    implicit val encMetric: Encoder[(String, Seq[MetricReq])] = ExpressionEncoder()
    implicit val encFact: Encoder[(String, Seq[FactReq])] = ExpressionEncoder()

    def stage[R, O: Encoder](
        reqs: Dataset[R])(fileOf: R => String)(
        f: (Soup, MstrIndexes, Seq[R]) => Seq[O])(
        implicit grouped: Encoder[(String, Seq[R])]): Dataset[O] = {
      val perFile = reqs.groupByKey(fileOf).mapGroups((file, it) => (file, it.toSeq))
      // pages was already deduped once up front, so this join sees at
      // most one row per file and the parse runs map-side at scan
      // parallelism — no page row ever crosses an exchange
      pages.joinWith(broadcast(perFile), pages("file") === perFile("_1"))
        .flatMap { case (pg, (_, rs)) => f(Soup.parse(pg.html), bIdx.value, rs) }
    }

    // ---- stage R: report skeletons + dataset routing ----
    // `select` = the CLI's --filter/--report/--report-id narrowing,
    // applied to the work list exactly as in MstrPipeline.run
    val workLinks = select.map(f => f(indexes.documento))
      .getOrElse(indexes.documento.links)
    // one request PER INDEX LINK: a report id listed twice in the
    // documento index must yield one output row per link, exactly like
    // the broadcast engine's per-link flatMap — so the internal group
    // key is (report_id, link ordinal), folded into one string that all
    // downstream request/fragment rows carry opaquely
    val reportReqs = spark.createDataset(
      workLinks.zipWithIndex.map { case (l, i) =>
        ReportReq(l.file, l.name, l.href, i)
      }.toSeq)

    val rOut = stage(reportReqs)(_.file) { (soup, idx, rs) =>
      rs.flatMap { rq =>
        val (_, reportId) = Soup.splitHref(rq.href)
        if (reportId.isEmpty) Nil
        else {
          val owner = MstrParsers.extractOwnerName(soup, loc, Some(reportId)).map { on =>
            idx.pasta.findByName(on) match {
              case Some(link) =>
                val oid = link.anchor
                Owner(on, oid, if (oid.nonEmpty) s"${link.file}#$oid" else link.file,
                  Some(link.name), Some("owner"))
              case None => Owner(on, "", "", None, Some("owner"))
            }
          }
          val acl = MstrParsers.extractAccessRows(soup, loc, Some(reportId)).map {
            case (userName, access) =>
              idx.pasta.findByName(userName)
                .orElse(idx.pasta.findUserByParenthesizedName(userName)) match {
                case Some(link) =>
                  val uid = link.anchor
                  AccessControlEntry(userName, access, Some(link.name), Some(uid),
                    Some(if (uid.nonEmpty) s"${link.file}#$uid" else link.file))
                case None => AccessControlEntry(userName, access, None, None, None)
              }
          }
          val groupKey = s"$reportId" + "\u0000" + rq.ord
          val skel = RStageOut(Some(Frag.of(groupKey, SkelFrag(
            rq.name, s"${rq.file}#$reportId", owner, acl))), None)
          val dsInfo = MstrParsers.extractDatasetsFromReport(soup, loc, rq.name,
            Some(reportId))
          skel +: dsInfo.zipWithIndex.flatMap { case ((dsName, dsIdOpt, _), ord) =>
            routeDataset(idx, groupKey, reportId, ord, dsName, dsIdOpt)
          }
        }
      }
    }.persist()

    val skelFrags = rOut.flatMap(_.frag)
    val dsReqs = rOut.flatMap(_.ds)

    // ---- stage D: dataset pages → template objects → attr/metric reqs ----
    val dOut = stage(dsReqs)(_.file) { (soup, idx, rs) =>
      rs.flatMap { rq =>
        val isReport = MstrParsers.isReportDataset(soup, loc, rq.ds_id)
        val (appObject, graphic, attrsInfo, metricsInfo) =
          if (isReport) {
            val g = MstrParsers.extractGraphicType(soup, loc, rq.ds_id)
            val (a, m) = MstrParsers.extractTemplateObjectsReport(soup, loc, rq.ds_id)
            (Some("Report"), g, a, m)
          } else {
            val ao = if (rq.source == "CuboInteligente") Some("CuboInteligente") else None
            val (a, m) = MstrParsers.extractTemplateObjects(soup, loc, rq.ds_name,
              Some(rq.ds_id))
            (ao, None, a, m)
          }
        val dsFrag = DStageOut(Some(Frag.of(rq.report_id, DsFrag(
          rq.ds_ord, rq.ds_name, rq.ds_id, rq.ds_file, appObject, graphic))), None, None)
        val attrs = attrsInfo.zipWithIndex.flatMap { case (ai, i) =>
          idx.atributo.findLink(ai.id, Some(ai.nameOnDataset)).map { link =>
            DStageOut(None, Some(AttrReq(rq.report_id, rq.ds_ord, i, link.name,
              ai.nameOnDataset, link.file, link.anchor, rq.ds_id)), None)
          }
        }
        val mets = metricsInfo.zipWithIndex.map { case (mi, i) =>
          idx.metrica.findMetricLink(mi.nameOnDataset, mi.id) match {
            case Some(link) =>
              val anchorOpt = if (link.anchor.nonEmpty) Some(link.anchor) else mi.id
              val (f, a) = splitPath(filePathOf(link))
              DStageOut(None, None, Some(MetricReq(rq.report_id, rq.ds_ord, Seq(i),
                rq.ds_id, link.name, f, a, anchorOpt, Nil)))
            case None =>
              // embedded/derived metric (report_extractor.py:263-285)
              DStageOut(Some(Frag.of(rq.report_id, MetricNodeFrag(
                rq.ds_ord, Seq(i), mi.nameOnDataset, mi.id.getOrElse(""), mi.href,
                "embedded", Some("DerivedMetric"), None, None, None))), None, None)
          }
        }
        dsFrag +: (attrs ++ mets)
      }
    }.persist()

    val dsFrags = dOut.flatMap(_.frag)
    val attrReqs = dOut.flatMap(_.attr)

    // ---- stage A: attribute pages → forms (attribute_extractor.py) ----
    val attrFrags = stage(attrReqs)(_.file) { (soup, idx, rs) =>
      rs.map { rq =>
        val attrId =
          if (rq.anchor.nonEmpty) rq.anchor
          else rq.file.replace(".html", "").replace("_1", "")
        val fullPath = if (rq.anchor.nonEmpty) s"${rq.file}#${rq.anchor}" else rq.file
        val forms = MstrParsers.extractAttributeForms(soup, loc,
          Some(rq.anchor).filter(_.nonEmpty)).map { case (fn, lts) =>
          val resolved = lts.map { lt =>
            val link = idx.tabelaLogica.findLink(Some(lt.id), Some(lt.name))
            lt.copy(filePath = link.map(filePathOf).orElse(lt.filePath))
          }
          Formulario(guid(s"${attrId}_$fn"), fn, resolved)
        }
        Frag.of(rq.report_id, AttrFrag(rq.ds_ord, rq.ord,
          Atributo(rq.official, rq.name_on_ds, attrId, fullPath, rq.ds_id,
            Some("Atributo"), forms)))
      }
    }

    // ---- stage M (iterated): metric definitions + recursion frontier ----
    def metricStage(soup: Soup, idx: MstrIndexes, rs: Seq[MetricReq]): Seq[MStageOut] =
      rs.flatMap { rq =>
        // cycle check on the branch path (extractor_helpers.py:19-38)
        val cycleId = rq.id_opt.getOrElse(rq.anchor)
        if (cycleId.nonEmpty && rq.path.contains(cycleId)) Nil
        else {
          val outId =
            if (rq.anchor.nonEmpty) rq.anchor
            else rq.file.replace(".html", "").replace("_1", "")
          val fullPath = if (rq.anchor.nonEmpty) s"${rq.file}#${rq.anchor}" else rq.file
          val defn = MstrParsers.extractMetricDefinition(soup, loc, rq.name,
            Some(rq.anchor).filter(_.nonEmpty))
          val tipo = if (defn.tipo.nonEmpty) defn.tipo else "simples"
          if (tipo == "composto") {
            val newPath = if (cycleId.nonEmpty) rq.path :+ cycleId else rq.path
            // first-wins child dedup; deterministic corpus ⇒ equal to the
            // engine's success-gated `added` set (a retried duplicate
            // re-fails identically)
            val added = mutable.Set.empty[String]
            val kids = defn.childMetricIds.zipWithIndex.flatMap { case (cid, k) =>
              if (added.contains(cid) || newPath.contains(cid)) None
              else idx.metrica.findMetricLink("", Some(cid)).map { link =>
                added += cid
                val (f, a) = splitPath(filePathOf(link))
                MStageOut(None, Some(MetricReq(rq.report_id, rq.ds_ord, rq.pos :+ k,
                  rq.ds_id, link.name, f, a, Some(cid), newPath)), None)
              }
            }
            MStageOut(Some(Frag.of(rq.report_id, MetricNodeFrag(rq.ds_ord,
              rq.pos, rq.name, outId, fullPath, tipo, Some("Metrica"), defn.formula,
              None, None))), None, None) +: kids
          } else {
            val function = defn.functionId.flatMap { fid =>
              idx.funcao.findById(fid).map(l => FunctionRef(l.name, fid, filePathOf(l)))
            }
            val (fact, factReq) = defn.factId.flatMap { fid =>
              idx.fato.findLink(Some(fid), None).map { l =>
                val factPath = filePathOf(l)
                val factId =
                  if (factPath.contains("#")) factPath.split("#", 2)(1) else fid
                val factAnchor =
                  if (factPath.contains("#")) factPath.split("#", 2)(1) else ""
                // default: missing fact page keeps the FactRef, tables empty
                (Option(FactRef(l.name, factId, factPath, Nil)),
                  Option(FactReq(rq.report_id, rq.ds_ord, rq.pos,
                    factPath.split("#", 2)(0), factAnchor)))
              }
            }.getOrElse((None, None))
            Seq(MStageOut(Some(Frag.of(rq.report_id, MetricNodeFrag(rq.ds_ord,
              rq.pos, rq.name, outId, fullPath, tipo, Some("Metrica"), defn.formula,
              function, fact))), None, factReq))
          }
        }
      }

    // each level's emptiness probe rides the SAME action that
    // materializes the level (count of non-null children) — one job per
    // level instead of a separate isEmpty pass
    var frontier = dOut.flatMap(_.metric)
    var nFrontier = dOut.select(count(col("metric"))).first().getLong(0)
    var mnodeFrags = spark.emptyDataset[Frag]
    var factReqs = spark.emptyDataset[FactReq]
    val persisted = scala.collection.mutable.ArrayBuffer[Dataset[_]](rOut, dOut)
    var depth = 0
    while (nFrontier > 0 && depth < 64) {
      depth += 1
      val out = stage(frontier)(_.file)(metricStage).persist()
      persisted += out
      nFrontier = out.select(count(col("child"))).first().getLong(0)
      mnodeFrags = mnodeFrags.union(out.flatMap(_.frag))
      factReqs = factReqs.union(out.flatMap(_.factReq))
      frontier = out.flatMap(_.child)
    }
    // a >64-deep acyclic composite chain must fail LOUDLY, not emit a
    // silently truncated tree diverging from the broadcast-path engine
    if (nFrontier > 0)
      throw new IllegalStateException(
        s"composite-metric recursion exceeded depth 64 with $nFrontier pending requests")

    // ---- stage F: fact pages → logic tables (fact_parser.py) ----
    val factFrags = stage(factReqs)(_.file) { (soup, idx, rs) =>
      rs.map { rq =>
        val lts = MstrParsers.extractFactLogicTables(soup, loc,
          Some(rq.anchor).filter(_.nonEmpty)).map { lt =>
          val tl = idx.tabelaLogica.findLink(Some(lt.id), Some(lt.name))
          lt.copy(filePath = tl.map(filePathOf))
        }
        Frag.of(rq.report_id, FactFrag(rq.ds_ord, rq.pos, lts))
      }
    }

    // ---- assembly: one group per report builds the nested tree ----
    val allFrags = skelFrags.union(dsFrags).union(attrFrags)
      .union(mnodeFrags).union(factFrags)

    val assembled = allFrags.groupByKey(_.report_id).flatMapGroups { (key, it) =>
      // the group key is report_id + NUL + link ordinal (one group —
      // hence one output row — per documento-index LINK, even when the
      // same report id is listed twice); strip the ordinal back off for
      // the emitted rows
      val rid = key.takeWhile(_ != '\u0000')
      val fs = it.map(Frag.read).toSeq
      fs.collectFirst { case s: SkelFrag => s }.map { sk =>
        val attrsByDs = fs.collect { case f: AttrFrag => f }.groupBy(_.ds_ord)
        val nodesByDs = fs.collect { case f: MetricNodeFrag => f }.groupBy(_.ds_ord)
        val factsByDs = fs.collect { case f: FactFrag => f }.groupBy(_.ds_ord)
        val datasets = fs.collect { case f: DsFrag => f }.sortBy(_.ds_ord).map { d =>
          val atributos = attrsByDs.getOrElse(d.ds_ord, Nil)
            .sortBy(_.ord).map(_.attr).toList
          val nodeByPos = nodesByDs.getOrElse(d.ds_ord, Nil)
            .map(n => n.pos.toList -> n).toMap
          val tablesByPos = factsByDs.getOrElse(d.ds_ord, Nil)
            .map(f => f.pos.toList -> f.tables).toMap
          val childPoses: Map[List[Int], Seq[List[Int]]] =
            nodeByPos.keys.toSeq.groupBy(_.dropRight(1))
          def build(p: List[Int]): Metrica = {
            val n = nodeByPos(p)
            val kids = childPoses.getOrElse(p, Nil).sortBy(_.last).map(build).toList
            val fact = n.fact.map { fr =>
              tablesByPos.get(p).map(ts => fr.copy(logicTables = ts.toList)).getOrElse(fr)
            }
            Metrica(n.name, n.id, n.file_path, d.id, n.tipo, n.application_object,
              n.formula, n.function, fact, kids)
          }
          val metricas = childPoses.getOrElse(Nil, Nil).sortBy(_.last).map(build).toList
          DataSet(d.name, d.id, d.file_path, rid, d.application_object, d.graphic,
            atributos, metricas)
        }.toList
        val r = Relatorio(sk.name, rid, sk.file_path, datasets, sk.owner, sk.acl.toList)
        ReportJsonRow(rid, sk.name, sk.file_path, JsonExport.exportOne(r))
      }
    }
    // materialize eagerly so every internal job runs under the scoped
    // shuffle width; callers get the cached result
    val result = assembled.persist()
    result.count()
    // the intermediate caches served their purpose during assembly —
    // release them so repeated run() calls don't pin blocks for the
    // session lifetime (the result itself stays cached)
    persisted.foreach(_.unpersist(blocking = false))
    result
  }

  /** Pre-file dataset routing — extractDataset's index-only prefix
    * (dataset_extractor.py:21-143): unresolved → empty dataset with
    * deterministic fallback id; Shortcut → terminal dataset; else a
    * request against the dataset's content file.
    */
  private def routeDataset(idx: MstrIndexes, groupKey: String, reportId: String,
                           ord: Int, dsName: String,
                           dsIdOpt: Option[String]): Seq[RStageOut] = {
    val dsId0 = dsIdOpt.getOrElse("")
    // fallback GUIDs seed from the PLAIN report id (engine parity), while
    // request/fragment rows carry the per-link group key
    MstrIndexes.resolveDatasetLink(idx, Some(dsId0).filter(_.nonEmpty), Some(dsName)) match {
      case None =>
        val id = if (dsId0.nonEmpty) dsId0 else guid(s"$reportId:$dsName")
        Seq(RStageOut(Some(Frag.of(groupKey, DsFrag(ord, dsName, id, "",
          Some(""), None))), None))
      case Some((dsFile, source)) =>
        var dsId = dsId0
        if (dsId.isEmpty && dsFile.contains("#")) dsId = dsFile.split("#", 2)(1)
        if (dsId.isEmpty) dsId = guid(s"$reportId:$dsName")
        if (source == "Shortcut")
          Seq(RStageOut(Some(Frag.of(groupKey, DsFrag(ord, dsName, dsId, dsFile,
            Some("Shortcut"), None))), None))
        else
          Seq(RStageOut(None, Some(DsReq(groupKey, ord, dsName, dsId, dsFile,
            dsFile.split("#", 2)(0), source))))
    }
  }
}
