package graft

import graft.fixtures.WebCorpus
import graft.html.TagTree
import graft.extract.MainContent
import graft.text.TextOps

/** Coarse single-thread stage profile of the extraction hot path
  * (Test/runMain graft.ExtractProfile): decode | tokenize+tree |
  * segment | classify+join. Guides allocation work on the core.
  */
object ExtractProfile {
  def main(args: Array[String]): Unit = {
    val pages = (0 until 4000).map(i => WebCorpus.generateOne(i).page)
    val htmls = pages.map(p => new String(p.html, java.nio.charset.StandardCharsets.UTF_8))
    val bytes = pages.map(_.html.length.toLong).sum

    def time(name: String, reps: Int)(f: => Unit): Unit = {
      f // warm
      f
      val t0 = System.nanoTime()
      var r = 0
      while (r < reps) { f; r += 1 }
      val sec = (System.nanoTime() - t0) / 1e9 / reps
      println(f"$name%-22s ${sec * 1000}%8.1f ms  ${pages.length / sec}%9.0f docs/sec  ${bytes / sec / 1e6}%7.1f MB/s")
    }

    time("decode", 5) { pages.foreach(p => TextOps.decodeUtf8Replace(p.html)) }
    time("tokenize+tree", 5) { htmls.foreach(TagTree.parse) }
    val trees = htmls.map(TagTree.parse)
    time("segment", 5) { trees.foreach(MainContent.segment) }
    val blockss = trees.map(MainContent.segment)
    time("classify+join", 5) { blockss.foreach { b =>
      val k = MainContent.classify(b)
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < b.length) { if (k(i)) sb.append(b(i).text); i += 1 }
    } }
    time("end-to-end", 5) { pages.foreach(p =>
      MainContent.extractText(TextOps.decodeUtf8Replace(p.html))) }
  }
}
