package graft.pdf

import java.util.zip.Inflater
import scala.collection.mutable.ArrayBuffer

/** Text extraction from PDF byte streams — the north rule's "PDF/layout
  * parse" leg. Pure Scala, zero dependencies, deterministic; designed to
  * run row-local inside the same `mapPartitions` as the HTML extractor.
  *
  * Supported subset (covers classic digitally-born single-layer PDFs and
  * the [[PdfGen]] fixture corpus exactly):
  *
  *  - object scan: every `N G obj … endobj` body found by sequential
  *    scan — no xref needed (robust to linearized/appended files);
  *  - streams: raw or `/FlateDecode` (JDK Inflater);
  *  - content streams: recognized by containing a `BT … ET` text block;
  *  - text operators: `Tj`, `TJ` (kerning numbers ignored), `'`, `"`,
  *    with line layout from `Td`, `TD`, `T*`, `Tm` (a new line whenever
  *    the text cursor moves to a new y);
  *  - strings: literal `(…)` with octal/char escapes and balanced
  *    nested parens, and hex `<…>`;
  *  - bytes decode as Latin-1 (PDFDocEncoding's printable range).
  *
  * Lines are emitted in content-stream order, joined with `\n`.
  */
object PdfTextExtractor {

  def isPdf(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 5 &&
      bytes(0) == '%' && bytes(1) == 'P' && bytes(2) == 'D' &&
      bytes(3) == 'F' && bytes(4) == '-'

  /** All text of the document (every BT/ET block of every content
    * stream, stream order), lines joined by '\n'.
    */
  def extractText(bytes: Array[Byte]): String = {
    val out = new StringBuilder
    var first = true
    streams(bytes).foreach { data =>
      val s = extractFromContent(data)
      if (s.nonEmpty) {
        if (!first) out.append('\n')
        out.append(s)
        first = false
      }
    }
    out.toString
  }

  // ---- object/stream scan ----

  private def indexOf(hay: Array[Byte], needle: String, from: Int): Int = {
    val n = needle.getBytes("ISO-8859-1")
    var i = from
    val last = hay.length - n.length
    while (i <= last) {
      var j = 0
      while (j < n.length && hay(i + j) == n(j)) j += 1
      if (j == n.length) return i
      i += 1
    }
    -1
  }

  /** Decoded bytes of every stream object that looks like a content
    * stream (contains "BT"). Dict inspected only for /FlateDecode.
    */
  private def streams(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val found = ArrayBuffer.empty[Array[Byte]]
    var pos = 0
    while (pos >= 0 && pos < bytes.length) {
      val s = indexOf(bytes, "stream", pos)
      if (s < 0) { pos = -1 }
      else {
        // "endstream" also contains "stream" — require start-of-token
        val tokStart = s == 0 || !Character.isLetter((bytes(s - 1) & 0xff).toChar)
        if (!tokStart) { pos = s + 6 }
        else {
          // stream data starts after CRLF or LF following the keyword
          var d = s + 6
          if (d < bytes.length && bytes(d) == '\r') d += 1
          if (d < bytes.length && bytes(d) == '\n') d += 1
          val e = indexOf(bytes, "endstream", d)
          if (e < 0) { pos = -1 }
          else {
            // trailing EOL before "endstream" belongs to the keyword
            var dataEnd = e
            if (dataEnd > d && bytes(dataEnd - 1) == '\n') dataEnd -= 1
            if (dataEnd > d && bytes(dataEnd - 1) == '\r') dataEnd -= 1
            val raw = java.util.Arrays.copyOfRange(bytes, d, dataEnd)
            // the object's dict sits between the previous "obj" and "stream"
            val dictStart = {
              var k = s - 3
              while (k >= 0 && !(bytes(k) == 'o' && bytes(k + 1) == 'b' && bytes(k + 2) == 'j')) k -= 1
              math.max(0, k)
            }
            val dict = new String(bytes, dictStart, s - dictStart, "ISO-8859-1")
            val data =
              if (dict.contains("/FlateDecode")) inflate(raw).getOrElse(Array.emptyByteArray)
              else raw
            if (indexOf(data, "BT", 0) >= 0) found += data
            pos = e + 9
          }
        }
      }
    }
    found.toSeq
  }

  private def inflate(raw: Array[Byte]): Option[Array[Byte]] = {
    val inf = new Inflater()
    try {
      inf.setInput(raw)
      val buf = new Array[Byte](8192)
      val out = new java.io.ByteArrayOutputStream()
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (n == 0 && !inf.finished()) return Some(out.toByteArray) // truncated
      }
      Some(out.toByteArray)
    } catch { case _: Exception => None }
    finally inf.end() // native zlib memory — do not wait for the finalizer
  }

  // ---- content-stream interpreter ----

  private final class Lexer(data: Array[Byte]) {
    var i = 0
    def eof: Boolean = i >= data.length
    def peek: Char = (data(i) & 0xff).toChar

    def skipWs(): Unit = {
      while (!eof && (peek == ' ' || peek == '\n' || peek == '\r' || peek == '\t' ||
        peek == '\f' || peek == 0.toChar)) i += 1
      if (!eof && peek == '%') { // comment to EOL
        while (!eof && peek != '\n' && peek != '\r') i += 1
        skipWs()
      }
    }

    /** Next token: operator name, number, name (/X), string payload
      * (tagged), or array bracket.
      */
    def next(): Option[PdfTok] = {
      skipWs()
      if (eof) return None
      peek match {
        case '(' => Some(PdfStr(literalString()))
        case '<' =>
          if (i + 1 < data.length && (data(i + 1) & 0xff).toChar == '<') {
            i += 2; Some(PdfOther("<<"))
          } else Some(PdfStr(hexString()))
        case '>' =>
          if (i + 1 < data.length && (data(i + 1) & 0xff).toChar == '>') {
            i += 2; Some(PdfOther(">>"))
          } else { i += 1; Some(PdfOther(">")) }
        case '[' => i += 1; Some(PdfOther("["))
        case ']' => i += 1; Some(PdfOther("]"))
        case '/' =>
          val sb = new StringBuilder("/"); i += 1
          while (!eof && !delim(peek)) { sb.append(peek); i += 1 }
          Some(PdfOther(sb.toString))
        case c if c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9') =>
          val sb = new StringBuilder
          while (!eof && (peek == '+' || peek == '-' || peek == '.' ||
            (peek >= '0' && peek <= '9'))) { sb.append(peek); i += 1 }
          Some(PdfNum(sb.toString.toDoubleOption.getOrElse(0.0)))
        case _ =>
          val sb = new StringBuilder
          while (!eof && !delim(peek)) { sb.append(peek); i += 1 }
          if (sb.isEmpty) { i += 1; next() } else Some(PdfOp(sb.toString))
      }
    }

    private def delim(c: Char): Boolean =
      c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0.toChar ||
        c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
        c == '/' || c == '%'

    private def literalString(): String = {
      i += 1 // '('
      val sb = new StringBuilder
      var depth = 1
      while (!eof && depth > 0) {
        val c = peek
        if (c == '\\') {
          i += 1
          if (!eof) {
            val e = peek
            e match {
              case 'n' => sb.append('\n'); i += 1
              case 'r' => sb.append('\r'); i += 1
              case 't' => sb.append('\t'); i += 1
              case 'b' => sb.append('\b'); i += 1
              case 'f' => sb.append('\f'); i += 1
              case '(' => sb.append('('); i += 1
              case ')' => sb.append(')'); i += 1
              case '\\' => sb.append('\\'); i += 1
              case '\r' => i += 1; if (!eof && peek == '\n') i += 1 // line continuation
              case '\n' => i += 1
              case d if d >= '0' && d <= '7' =>
                var v = 0; var k = 0
                while (k < 3 && !eof && peek >= '0' && peek <= '7') {
                  v = v * 8 + (peek - '0'); i += 1; k += 1
                }
                sb.append((v & 0xff).toChar)
              case other => sb.append(other); i += 1
            }
          }
        } else if (c == '(') { depth += 1; sb.append(c); i += 1 }
        else if (c == ')') {
          depth -= 1
          if (depth > 0) sb.append(c)
          i += 1
        } else { sb.append(c); i += 1 }
      }
      sb.toString
    }

    private def hexString(): String = {
      i += 1 // '<'
      val digits = new StringBuilder
      while (!eof && peek != '>') {
        val c = peek
        if (Character.digit(c, 16) >= 0) digits.append(c)
        i += 1
      }
      if (!eof) i += 1 // '>'
      if (digits.length % 2 == 1) digits.append('0')
      val bytes = new Array[Byte](digits.length / 2)
      var k = 0
      while (k + 2 <= digits.length) {
        bytes(k / 2) = Integer.parseInt(digits.substring(k, k + 2), 16).toByte
        k += 2
      }
      // PDF text strings: UTF-16BE when the BOM leads, else per-byte
      // (PDFDocEncoding ≈ Latin-1 for the printable range)
      if (bytes.length >= 2 && bytes(0) == 0xFE.toByte && bytes(1) == 0xFF.toByte)
        new String(bytes, 2, bytes.length - 2, java.nio.charset.StandardCharsets.UTF_16BE)
      else
        new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    }
  }

  private sealed trait PdfTok
  private final case class PdfOp(name: String) extends PdfTok
  private final case class PdfNum(v: Double) extends PdfTok
  private final case class PdfStr(s: String) extends PdfTok
  private final case class PdfOther(s: String) extends PdfTok

  /** Interpret one content stream; returns its text (lines \n-joined). */
  def extractFromContent(data: Array[Byte]): String = {
    val lex = new Lexer(data)
    val lines = ArrayBuffer.empty[StringBuilder]
    var cur: StringBuilder = null
    var inText = false
    var y = Double.NaN

    def newLineAt(newY: Double): Unit = {
      if (cur == null || cur.nonEmpty || lines.isEmpty) {
        cur = new StringBuilder
        lines += cur
      }
      y = newY
    }
    def ensureLine(): Unit = if (cur == null) { cur = new StringBuilder; lines += cur }
    def show(s: String): Unit = { ensureLine(); cur.append(s) }

    // operand stack of the most recent numbers/strings (PDF is postfix)
    val nums = ArrayBuffer.empty[Double]
    val strs = ArrayBuffer.empty[String]
    var inArray = false
    val arrStrs = ArrayBuffer.empty[String]

    var tok = lex.next()
    while (tok.isDefined) {
      tok.get match {
        case PdfNum(v) => if (!inArray) nums += v
        case PdfStr(s) => if (inArray) arrStrs += s else strs += s
        case PdfOther("[") => inArray = true; arrStrs.clear()
        case PdfOther("]") => inArray = false
        case PdfOther(_) => // names, dict tokens — ignore
        case PdfOp(op) =>
          op match {
            case "BT" =>
              inText = true; y = Double.NaN; cur = null
            case "ET" =>
              inText = false; cur = null
            case "Td" | "TD" if inText =>
              val dy = if (nums.length >= 2) nums(nums.length - 1) else 0.0
              if (dy != 0.0 || y.isNaN) newLineAt(if (y.isNaN) dy else y + dy)
            case "T*" if inText =>
              newLineAt(if (y.isNaN) 0.0 else y - 1.0)
            case "Tm" if inText =>
              val newY = if (nums.length >= 1) nums(nums.length - 1) else 0.0
              if (y.isNaN || newY != y) newLineAt(newY)
            case "Tj" if inText =>
              if (strs.nonEmpty) show(strs.last)
            case "'" if inText =>
              newLineAt(if (y.isNaN) 0.0 else y - 1.0)
              if (strs.nonEmpty) show(strs.last)
            case "\"" if inText =>
              newLineAt(if (y.isNaN) 0.0 else y - 1.0)
              if (strs.nonEmpty) show(strs.last)
            case "TJ" if inText =>
              arrStrs.foreach(show)
              arrStrs.clear()
            case _ => // Tf, Tc, Tw, graphics ops… — no text effect here
          }
          nums.clear(); strs.clear()
      }
      tok = lex.next()
    }
    lines.map(_.toString).mkString("\n")
  }
}
