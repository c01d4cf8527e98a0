package graft.pdf

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.Deflater

/** Deterministic synthetic PDF builder — produces small but fully valid
  * PDFs (header, catalog/pages/page/font objects, content stream, xref
  * table, trailer) whose extracted text is known exactly. Used for the
  * PDF leg of the byte-identity roundtrip and for PdfSpec fixtures.
  * No RNG, no timestamps.
  */
object PdfGen {

  /** Escape a literal PDF string: backslash, parens; Latin-1 payload. */
  def escape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '(' => sb.append("\\(")
      case ')' => sb.append("\\)")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** Content stream: one BT/ET block; each element of `lines` becomes a
    * text line via `Td`; long lines are split into several Tj runs to
    * exercise same-line concatenation.
    */
  def contentStream(lines: Seq[String]): String = {
    val sb = new StringBuilder
    sb.append("BT\n/F1 11 Tf\n1 0 0 1 72 720 Tm\n")
    lines.zipWithIndex.foreach { case (line, i) =>
      if (i > 0) sb.append("0 -14 Td\n")
      // split the line into ≤40-char chunks at spaces, emitted as
      // separate Tj on the SAME line (no vertical move between them)
      var rest = line
      var firstChunk = true
      while (rest.nonEmpty) {
        val cut =
          if (rest.length <= 40) rest.length
          else {
            val sp = rest.lastIndexOf(' ', 40)
            if (sp <= 0) math.min(40, rest.length) else sp + 1
          }
        val (chunk, tail) = rest.splitAt(cut)
        if (!firstChunk) sb.append("12 0 Td\n") // horizontal move: same line
        if (chunk.exists(_ > 0xFF)) {
          // non-Latin-1 text: PDF-spec UTF-16BE hex string with BOM
          val b = chunk.getBytes(StandardCharsets.UTF_16BE)
          sb.append("<FEFF")
          b.foreach(x => sb.append(f"${x & 0xff}%02X"))
          sb.append("> Tj\n")
        } else {
          sb.append('(').append(escape(chunk)).append(") Tj\n")
        }
        firstChunk = false
        rest = tail
      }
    }
    sb.append("ET")
    sb.toString
  }

  /** A complete single-page PDF whose extracted text is
    * `lines.mkString("\n")`.
    */
  def pdf(lines: Seq[String], flate: Boolean): Array[Byte] = {
    val latin1 = StandardCharsets.ISO_8859_1
    val content = contentStream(lines).getBytes(latin1)
    val streamData: Array[Byte] =
      if (flate) {
        val d = new Deflater()
        d.setInput(content); d.finish()
        val buf = new Array[Byte](content.length + 64)
        val out = new ByteArrayOutputStream()
        while (!d.finished()) {
          val n = d.deflate(buf)
          out.write(buf, 0, n)
        }
        d.end()
        out.toByteArray
      } else content

    val filter = if (flate) " /Filter /FlateDecode" else ""
    val objs = Seq(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
      s"<< /Length ${streamData.length}$filter >>", // stream object: body appended below
      "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(latin1))
    w("%PDF-1.4\n")
    val offsets = new Array[Int](objs.length + 1)
    objs.zipWithIndex.foreach { case (dict, idx) =>
      offsets(idx + 1) = out.size()
      w(s"${idx + 1} 0 obj\n$dict\n")
      if (idx == 3) {
        w("stream\n")
        out.write(streamData)
        w("\nendstream\n")
      }
      w("endobj\n")
    }
    val xrefPos = out.size()
    w(s"xref\n0 ${objs.length + 1}\n")
    w("0000000000 65535 f \n")
    (1 to objs.length).foreach(i => w(f"${offsets(i)}%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${objs.length + 1} /Root 1 0 R >>\nstartxref\n$xrefPos\n%%EOF\n")
    out.toByteArray
  }
}
