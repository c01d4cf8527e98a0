package graft.extract

import graft.html.TagTree
import graft.text.TextOps
import scala.collection.mutable.ArrayBuffer

/** Generic tag-path span extraction over web pages (north star:
  * "tag-path span extraction for structured entities — tables,
  * headings, metadata blocks"): document-order structured views of a
  * parsed page, independent of any corpus-specific schema. Row-local,
  * allocation-light; intended to run inside the same `mapPartitions`
  * pass as main-content extraction.
  */
object Spans {

  final case class Heading(level: Int, text: String)
  /** One table = rows of cell texts (th and td, document order). */
  final case class PageSpans(
      title: Option[String],
      headings: Seq[Heading],
      tables: Seq[Seq[Seq[String]]],
      metas: Seq[(String, String)])

  private val headingNames = Map(
    "h1" -> 1, "h2" -> 2, "h3" -> 3, "h4" -> 4, "h5" -> 5, "h6" -> 6)

  def extract(tree: TagTree): PageSpans = {
    val headings = ArrayBuffer.empty[Heading]
    val tables = ArrayBuffer.empty[Seq[Seq[String]]]
    val metas = ArrayBuffer.empty[(String, String)]
    var title: Option[String] = None

    var i = 0
    val n = tree.size
    while (i < n) {
      if (tree.isElem(i)) {
        val nm = tree.name(i)
        headingNames.get(nm) match {
          case Some(level) =>
            headings += Heading(level, TextOps.collapseWs(tree.textRaw(i)))
            i = tree.end(i)
          case None => nm match {
            case "title" =>
              if (title.isEmpty) title = Some(TextOps.collapseWs(tree.textRaw(i)))
              i = tree.end(i)
            case "meta" =>
              val k = {
                val v = tree.attr(i, "name")
                if (v != null) v else tree.attr(i, "property")
              }
              val v = tree.attr(i, "content")
              if (k != null && v != null) metas += (k -> v)
              i += 1
            case "table" =>
              tables += extractTable(tree, i)
              i = tree.end(i) // nested tables are cells of the outer one
            case "script" | "style" | "noscript" | "template" =>
              i = tree.end(i)
            case _ => i += 1
          }
        }
      } else i += 1
    }
    PageSpans(title, headings.toSeq, tables.toSeq, metas.toSeq)
  }

  /** Rows (tr) of cell (td/th) texts for the table rooted at `ti`;
    * only cells belonging directly to this table (not to a nested
    * table) are taken, mirroring the reference's row-local semantics
    * (base_parser.py:167-189).
    */
  def extractTable(tree: TagTree, ti: Int): Seq[Seq[String]] = {
    val rows = ArrayBuffer.empty[Seq[String]]
    val (from, until) = tree.subtree(ti)
    var i = from
    while (i < until) {
      if (tree.isElem(i) && tree.name(i) == "table") {
        i = tree.end(i) // skip nested table rows
      } else if (tree.isElem(i) && tree.name(i) == "tr") {
        val cells = ArrayBuffer.empty[String]
        val (cf, cu) = tree.subtree(i)
        var j = cf
        while (j < cu) {
          if (tree.isElem(j) && (tree.name(j) == "td" || tree.name(j) == "th")) {
            cells += TextOps.collapseWs(tree.textRaw(j))
            j = tree.end(j)
          } else if (tree.isElem(j) && tree.name(j) == "table") {
            j = tree.end(j)
          } else j += 1
        }
        rows += cells.toSeq
        i = tree.end(i)
      } else i += 1
    }
    rows.toSeq
  }

  def extract(html: String): PageSpans = extract(TagTree.parse(html))
}
