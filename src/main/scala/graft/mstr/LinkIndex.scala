package graft.mstr

import graft.text.TextOps
import Soup.{idFromPlaceholder, splitHref}

/** Broadcast-friendly index of one MSTR index file's links — the
  * dimension-table replacement for the reference's per-lookup file scans
  * (LinkResolver, link_resolver.py:18-258). Lookup cascade order is
  * preserved exactly: id → exact name → normalized name → fuzzy ≥0.8.
  *
  * Scale note: the reference resolves every lookup with a linear scan,
  * which is O(requests × index size) — quadratic in corpus size (this
  * measurably dominated a 50k-report run). Every first-match-in-
  * document-order rule here is therefore answered from hash maps built
  * once per JVM (`@transient lazy` — broadcasts ship only the links;
  * each executor builds its own maps on first use), with the semantics
  * of the original scans reproduced exactly: maps record the FIRST
  * position per key, combined legs take the minimum position with the
  * original per-link check order as the tie-break, and the rare legs a
  * hash can't answer (fuzzy match, substring containment, degenerate
  * non-GUID ids) keep a scan — over PRE-normalized names, and bounded
  * by the best hash candidate's position where one exists.
  */
final class LinkIndex(val links: IndexedSeq[LinkResult]) extends Serializable {

  // ---- one-time per-JVM precomputation ----

  /** splitHref once per link (scans re-split per call in the reference). */
  @transient private lazy val splits: Array[(String, String)] =
    links.iterator.map(l => splitHref(l.href)).toArray

  /** normalizeForMatching once per link — NFKD per link per lookup was
    * the single hottest path at 50k reports.
    */
  @transient private lazy val norms: Array[String] =
    links.iterator.map(l => TextOps.normalizeForMatching(l.name)).toArray

  @transient private lazy val namesSeq: IndexedSeq[String] = links.map(_.name)

  private def firstMap[K](pairs: Iterator[(K, Int)]): java.util.HashMap[K, Integer] = {
    val m = new java.util.HashMap[K, Integer]()
    pairs.foreach { case (k, p) => m.putIfAbsent(k, p) }
    m
  }

  /** findById key space: anchor (upper) and placeholder id (upper), in
    * document order, anchor-before-placeholder within a link. The value
    * encodes position and which leg matched (negative = placeholder).
    */
  @transient private lazy val idFirst: java.util.HashMap[String, (Int, Boolean)] = {
    val m = new java.util.HashMap[String, (Int, Boolean)]()
    var i = 0
    while (i < links.length) {
      val l = links(i)
      val anchor = splits(i)._2
      m.putIfAbsent(anchor.toUpperCase(java.util.Locale.ROOT), (i, false))
      if (l.href.contains("[$$$$"))
        idFromPlaceholder(l.href).foreach { pid =>
          m.putIfAbsent(pid.toUpperCase(java.util.Locale.ROOT), (i, true))
        }
      i += 1
    }
    m
  }

  /** First position per exact name / per normalized name. */
  @transient private lazy val nameFirst: java.util.HashMap[String, Integer] =
    firstMap(links.iterator.map(_.name).zipWithIndex)
  @transient private lazy val normFirst: java.util.HashMap[String, Integer] =
    firstMap(norms.iterator.zipWithIndex)

  /** findMetricLink's id leg matches the ANCHOR only (no placeholder). */
  @transient private lazy val metricAnchorFirst: java.util.HashMap[String, Integer] =
    firstMap(splits.iterator.map(_._2.toUpperCase(java.util.Locale.ROOT)).zipWithIndex)

  /** First position per 32-hex-char window of each href — answers the
    * dataset-link substring rule `href.contains(id)` exactly for
    * GUID-shaped ids: any occurrence of a 32-hex string inside an href
    * lies within a maximal hex run, so indexing every 32-wide window of
    * runs ≥32 chars (case-sensitively, like `contains`) is complete.
    */
  @transient private lazy val hexWindowFirst: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    val run = "[0-9A-Fa-f]{32,}".r
    var i = 0
    while (i < links.length) {
      run.findAllIn(links(i).href).foreach { r =>
        var off = 0
        while (off + 32 <= r.length) {
          m.putIfAbsent(r.substring(off, off + 32), Int.box(i))
          off += 1
        }
      }
      i += 1
    }
    m
  }

  private def isHex32(s: String): Boolean =
    s.length == 32 && s.forall(c =>
      (c >= '0' && c <= '9') || (c >= 'A' && c <= 'F') || (c >= 'a' && c <= 'f'))

  // ---- lookups (scan semantics, map speed) ----

  /** find_by_id (link_resolver.py:46-87): anchor match (case-insensitive),
    * else placeholder match — checked per link in document order.
    */
  def findById(objectId: String): Option[LinkResult] = {
    val target = objectId.toUpperCase(java.util.Locale.ROOT)
    Option(idFirst.get(target)).map { case (i, viaPlaceholder) =>
      val l = links(i)
      val (file, anchor) = splits(i)
      if (!viaPlaceholder) LinkResult(l.name, file, anchor, l.href, anchor)
      else {
        val pid = idFromPlaceholder(l.href).get
        LinkResult(l.name, file, if (anchor.nonEmpty) anchor else pid, l.href, pid)
      }
    }
  }

  private def mk(l: LinkResult): LinkResult = {
    val (file, anchor) = splitHref(l.href)
    val pid = if (l.href.contains("[$$$$")) idFromPlaceholder(l.href) else None
    LinkResult(l.name, file, if (anchor.nonEmpty) anchor else pid.getOrElse(""),
      l.href, pid.getOrElse(anchor))
  }

  /** find_by_name (link_resolver.py:89-183): exact → normalized → fuzzy. */
  def findByName(objectName: String): Option[LinkResult] = {
    Option(nameFirst.get(objectName)).map(i => mk(links(i))).orElse {
      val norm = TextOps.normalizeForMatching(objectName)
      Option(normFirst.get(norm)).map(i => mk(links(i)))
    }.orElse {
      TextOps.findBestMatch(objectName, namesSeq)
        .flatMap(best => Option(nameFirst.get(best))).map(i => mk(links(i)))
    }
  }

  /** find_link (link_resolver.py:185-222): id precedence. */
  def findLink(objectId: Option[String], objectName: Option[String]): Option[LinkResult] = {
    objectId.filter(_.nonEmpty).flatMap(findById)
      .orElse(objectName.filter(_.nonEmpty).flatMap(findByName))
  }

  /** find_metric_link (metric_parser.py:555-625): id by anchor only; name
    * fallback is a SINGLE pass checking normalized-exact then containment
    * per link (an early containment match beats a later exact one) — the
    * containment scan runs over pre-normalized names and stops at the
    * first exact match's position.
    */
  def findMetricLink(metricName: String, metricId: Option[String]): Option[LinkResult] = {
    def at(i: Int): LinkResult = {
      val l = links(i)
      val (file, anchor) = splits(i)
      LinkResult(l.name, file, anchor, l.href, anchor)
    }
    metricId.filter(_.nonEmpty).foreach { id =>
      val hit = metricAnchorFirst.get(id.toUpperCase(java.util.Locale.ROOT))
      if (hit != null) return Some(at(hit))
    }
    val nameNorm = TextOps.normalizeForMatching(metricName)
    val pExact = nameFirstOr(normFirst, nameNorm, links.length)
    var i = 0
    while (i < pExact) {
      val lNorm = norms(i)
      if (lNorm.nonEmpty && nameNorm.nonEmpty &&
        (lNorm.contains(nameNorm) || nameNorm.contains(lNorm)))
        return Some(at(i))
      i += 1
    }
    if (pExact < links.length) Some(at(pExact)) else None
  }

  private def nameFirstOr(m: java.util.HashMap[String, Integer], k: String,
                          dflt: Int): Int = {
    val v = m.get(k); if (v == null) dflt else v.intValue()
  }

  /** First link matching the dataset-link rule (id substring in href,
    * else exact name), as a position — the per-index body of
    * resolve_dataset_link (report_parser.py:208-308). Per link the id
    * check precedes the name check, so on a tie the id leg wins.
    * GUID-shaped ids come from the hex-window map; degenerate ids fall
    * back to the original scan.
    */
  private[mstr] def firstDatasetMatch(datasetId: Option[String],
                                      datasetName: Option[String]): Option[(Int, Boolean)] = {
    val id = datasetId.filter(_.nonEmpty)
    // contains("#"+id) || contains(id) ≡ contains(id)
    val pId: Int = id match {
      case Some(s) if isHex32(s) => nameFirstOr(hexWindowFirst, s, links.length)
      case Some(s) =>
        val i = links.indexWhere(_.href.contains(s))
        if (i < 0) links.length else i
      case None => links.length
    }
    val pName: Int = datasetName match {
      case Some(nm) => nameFirstOr(nameFirst, nm, links.length)
      case None => links.length
    }
    val p = math.min(pId, pName)
    if (p >= links.length) None else Some((p, pId <= pName))
  }

  private[mstr] def splitAt(i: Int): (String, String) = splits(i)

  /** Pasta numeric-id fallback (report_parser.py:629-643): first MAINBODY
    * link whose text contains "(name)".
    */
  def findUserByParenthesizedName(userName: String): Option[LinkResult] = {
    val needle = s"($userName)"
    links.find(l => l.name.contains(needle) && l.href.contains("#")).map { l =>
      val (file, anchor) = splitHref(l.href)
      LinkResult(l.name, file, anchor, l.href, anchor)
    }
  }
}

/** All broadcast dimensions an extraction pass needs: the nine index
  * files (reference base_parser.py:307-342 preload set) keyed by role.
  */
final case class MstrIndexes(
    documento: LinkIndex, relatorio: LinkIndex, cuboInteligente: LinkIndex,
    atalho: LinkIndex, metrica: LinkIndex, fato: LinkIndex, funcao: LinkIndex,
    atributo: LinkIndex, tabelaLogica: LinkIndex, pasta: LinkIndex) extends Serializable

object MstrIndexes {
  val empty: LinkIndex = new LinkIndex(IndexedSeq.empty)

  /** resolve_dataset_link (report_parser.py:208-308): priority cascade
    * CuboInteligente → Relatório(Documento tag) → Atalho(Shortcut tag);
    * per index: substring id match on href, else exact name match, over
    * ALL links in document order.
    */
  def resolveDatasetLink(idx: MstrIndexes, datasetId: Option[String],
                         datasetName: Option[String]): Option[(String, String)] = {
    def searchIn(index: LinkIndex, tag: String): Option[(String, String)] =
      index.firstDatasetMatch(datasetId, datasetName).map { case (p, viaId) =>
        val (file, anchor0) = index.splitAt(p)
        val anchor =
          if (viaId && anchor0.isEmpty) datasetId.getOrElse("") else anchor0
        (if (anchor.nonEmpty) s"$file#$anchor" else file, tag)
      }
    // NOTE: the reference iterates raw <a> tags (not only MAINBODY); our
    // index files contain only MAINBODY links, so the sets coincide.
    searchIn(idx.cuboInteligente, "CuboInteligente")
      .orElse(searchIn(idx.relatorio, "Documento"))
      .orElse(searchIn(idx.atalho, "Shortcut"))
  }
}
