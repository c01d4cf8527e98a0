package graft.mstr

import graft.text.TextOps
import Soup.{idFromPlaceholder, splitHref}

/** Broadcast-friendly index of one MSTR index file's links — the
  * dimension-table replacement for the reference's per-lookup file scans
  * (LinkResolver, link_resolver.py:18-258). Lookup cascade order is
  * preserved exactly: id → exact name → normalized name → fuzzy ≥0.8.
  */
final class LinkIndex(val links: IndexedSeq[LinkResult]) extends Serializable {

  /** find_by_id (link_resolver.py:46-87): anchor match (case-insensitive),
    * else placeholder match — checked per link in document order.
    */
  def findById(objectId: String): Option[LinkResult] = {
    val target = objectId.toUpperCase(java.util.Locale.ROOT)
    links.foreach { l =>
      val (file, anchor) = splitHref(l.href)
      if (anchor.toUpperCase(java.util.Locale.ROOT) == target)
        return Some(LinkResult(l.name, file, anchor, l.href, anchor))
      if (l.href.contains("[$$$$")) {
        idFromPlaceholder(l.href).foreach { pid =>
          if (pid.toUpperCase(java.util.Locale.ROOT) == target)
            return Some(LinkResult(l.name, file,
              if (anchor.nonEmpty) anchor else pid, l.href, pid))
        }
      }
    }
    None
  }

  private def mk(l: LinkResult): LinkResult = {
    val (file, anchor) = splitHref(l.href)
    val pid = if (l.href.contains("[$$$$")) idFromPlaceholder(l.href) else None
    LinkResult(l.name, file, if (anchor.nonEmpty) anchor else pid.getOrElse(""),
      l.href, pid.getOrElse(anchor))
  }

  /** find_by_name (link_resolver.py:89-183): exact → normalized → fuzzy. */
  def findByName(objectName: String): Option[LinkResult] = {
    links.find(_.name == objectName).map(mk).orElse {
      val norm = TextOps.normalizeForMatching(objectName)
      links.find(l => TextOps.normalizeForMatching(l.name) == norm).map(mk)
    }.orElse {
      TextOps.findBestMatch(objectName, links.map(_.name))
        .flatMap(best => links.find(_.name == best)).map(mk)
    }
  }

  /** find_link (link_resolver.py:185-222): id precedence. */
  def findLink(objectId: Option[String], objectName: Option[String]): Option[LinkResult] = {
    objectId.filter(_.nonEmpty).flatMap(findById)
      .orElse(objectName.filter(_.nonEmpty).flatMap(findByName))
  }

  /** find_metric_link (metric_parser.py:555-625): id by anchor only; name
    * fallback is a SINGLE pass checking normalized-exact then containment
    * per link (an early containment match beats a later exact one).
    */
  def findMetricLink(metricName: String, metricId: Option[String]): Option[LinkResult] = {
    metricId.filter(_.nonEmpty).foreach { id =>
      val target = id.toUpperCase(java.util.Locale.ROOT)
      links.foreach { l =>
        val (file, anchor) = splitHref(l.href)
        if (anchor.toUpperCase(java.util.Locale.ROOT) == target)
          return Some(LinkResult(l.name, file, anchor, l.href, anchor))
      }
    }
    val nameNorm = TextOps.normalizeForMatching(metricName)
    links.foreach { l =>
      val lNorm = TextOps.normalizeForMatching(l.name)
      val (file, anchor) = splitHref(l.href)
      if (lNorm == nameNorm)
        return Some(LinkResult(l.name, file, anchor, l.href, anchor))
      if (lNorm.nonEmpty && nameNorm.nonEmpty &&
        (lNorm.contains(nameNorm) || nameNorm.contains(lNorm)))
        return Some(LinkResult(l.name, file, anchor, l.href, anchor))
    }
    None
  }

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
    def searchIn(links: IndexedSeq[LinkResult], tag: String): Option[(String, String)] = {
      links.foreach { l =>
        val href = l.href
        datasetId.filter(_.nonEmpty).foreach { id =>
          if (href.contains(s"#$id") || href.contains(id)) {
            val (file, anchor0) = splitHref(href)
            val anchor = if (anchor0.nonEmpty) anchor0 else id
            return Some((if (anchor.nonEmpty) s"$file#$anchor" else file, tag))
          }
        }
        datasetName.foreach { nm =>
          if (l.name == nm) {
            val (file, anchor) = splitHref(href)
            return Some((if (anchor.nonEmpty) s"$file#$anchor" else file, tag))
          }
        }
      }
      None
    }
    // NOTE: the reference iterates raw <a> tags (not only MAINBODY); our
    // index files contain only MAINBODY links, so the sets coincide.
    searchIn(idx.cuboInteligente.links, "CuboInteligente")
      .orElse(searchIn(idx.relatorio.links, "Documento"))
      .orElse(searchIn(idx.atalho.links, "Shortcut"))
  }
}
