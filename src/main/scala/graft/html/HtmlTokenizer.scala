package graft.html

/** Allocation-light streaming HTML tokenizer.
  *
  * Re-expresses the tokenization behavior the reference gets from
  * Python's `html.parser` (with `convert_charrefs=True`): lowercased
  * tag/attribute names, entity decoding inside text and attribute
  * values (named + numeric char refs), comments surfaced as events,
  * `script`/`style` treated as raw-text elements, and tolerance of
  * malformed markup (stray `<` becomes text; unterminated constructs
  * consume to EOF without throwing). cf. reference base_parser.py:22-82.
  *
  * Pure function of the decoded string — no Spark dependency, safe to
  * run per-row inside `mapPartitions`.
  */
object HtmlTokenizer {

  trait Sink {
    /** `attrNames`/`attrValues` are null when the tag has no attributes;
      * when non-null they are freshly allocated (safe to keep).
      */
    def startTag(name: String, attrNames: Array[String],
                 attrValues: Array[String], selfClosing: Boolean): Unit
    def endTag(name: String): Unit
    def text(t: String): Unit
    def comment(t: String): Unit
  }

  /** Canonical interned names for the hot path: tag/attr names resolve
    * to shared constants via case-insensitive region compare — zero
    * allocation for every common tag (`substring` + `toLowerCase` per
    * tag otherwise dominates tokenizer garbage).
    */
  private val canonicalNames: Array[String] = Array(
    "a", "abbr", "address", "article", "aside", "b", "blockquote", "body",
    "br", "button", "center", "col", "dd", "div", "dl", "dt", "em",
    "fieldset", "figcaption", "figure", "footer", "form", "h1", "h2", "h3",
    "h4", "h5", "h6", "head", "header", "hr", "html", "i", "img", "input",
    "li", "link", "main", "meta", "nav", "noscript", "ol", "option", "p",
    "pre", "script", "section", "select", "small", "span", "strong",
    "style", "table", "tbody", "td", "template", "tfoot", "th", "thead",
    "title", "tr", "u", "ul",
    // common attribute names share the table
    "alt", "charset", "class", "content", "height", "href", "id", "lang",
    "name", "property", "rel", "src", "type", "valign", "value", "width")

  private val canonByFirst: Array[Array[String]] = {
    val out = new Array[Array[String]](26)
    var c = 0
    while (c < 26) {
      out(c) = canonicalNames.filter(_.charAt(0) == ('a' + c).toChar)
      c += 1
    }
    out
  }

  /** Lowercased name of html[start,end) — an interned constant when the
    * name is common, a fresh lowercase string otherwise.
    */
  private def canonName(html: String, start: Int, end: Int): String = {
    val len = end - start
    if (len > 0) {
      val c0 = Character.toLowerCase(html.charAt(start))
      if (c0 >= 'a' && c0 <= 'z') {
        val cands = canonByFirst(c0 - 'a')
        var k = 0
        while (k < cands.length) {
          val cand = cands(k)
          if (cand.length == len && html.regionMatches(true, start, cand, 0, len))
            return cand
          k += 1
        }
      }
    }
    html.substring(start, end).toLowerCase(java.util.Locale.ROOT)
  }

  private val namedEntities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "copy" -> "©", "reg" -> "®",
    "trade" -> "™", "hellip" -> "…", "mdash" -> "—",
    "ndash" -> "–", "lsquo" -> "‘", "rsquo" -> "’",
    "ldquo" -> "“", "rdquo" -> "”", "laquo" -> "«",
    "raquo" -> "»", "sect" -> "§", "para" -> "¶",
    "middot" -> "·", "bull" -> "•", "deg" -> "°",
    "plusmn" -> "±", "times" -> "×", "divide" -> "÷",
    "frac12" -> "½", "frac14" -> "¼", "frac34" -> "¾",
    "cent" -> "¢", "pound" -> "£", "euro" -> "€",
    "yen" -> "¥", "iexcl" -> "¡", "iquest" -> "¿",
    "szlig" -> "ß",
    // Latin-1 accented letters (both cases) — the set html.parser knows
    // that matters for pt-BR / Latin-script corpora.
    "Agrave" -> "À", "Aacute" -> "Á", "Acirc" -> "Â",
    "Atilde" -> "Ã", "Auml" -> "Ä", "Aring" -> "Å",
    "AElig" -> "Æ", "Ccedil" -> "Ç", "Egrave" -> "È",
    "Eacute" -> "É", "Ecirc" -> "Ê", "Euml" -> "Ë",
    "Igrave" -> "Ì", "Iacute" -> "Í", "Icirc" -> "Î",
    "Iuml" -> "Ï", "Ntilde" -> "Ñ", "Ograve" -> "Ò",
    "Oacute" -> "Ó", "Ocirc" -> "Ô", "Otilde" -> "Õ",
    "Ouml" -> "Ö", "Oslash" -> "Ø", "Ugrave" -> "Ù",
    "Uacute" -> "Ú", "Ucirc" -> "Û", "Uuml" -> "Ü",
    "Yacute" -> "Ý", "agrave" -> "à", "aacute" -> "á",
    "acirc" -> "â", "atilde" -> "ã", "auml" -> "ä",
    "aring" -> "å", "aelig" -> "æ", "ccedil" -> "ç",
    "egrave" -> "è", "eacute" -> "é", "ecirc" -> "ê",
    "euml" -> "ë", "igrave" -> "ì", "iacute" -> "í",
    "icirc" -> "î", "iuml" -> "ï", "ntilde" -> "ñ",
    "ograve" -> "ò", "oacute" -> "ó", "ocirc" -> "ô",
    "otilde" -> "õ", "ouml" -> "ö", "oslash" -> "ø",
    "ugrave" -> "ù", "uacute" -> "ú", "ucirc" -> "û",
    "uuml" -> "ü", "yacute" -> "ý", "yuml" -> "ÿ")

  /** Decode `&name;`, `&#NNN;`, `&#xHH;` refs; unknown refs pass through
    * verbatim (html.parser leaves unrecognized refs as-is).
    */
  def unescape(s: String): String = {
    if (s == null || s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 32) {
          val body = s.substring(i + 1, semi)
          val decoded: String =
            if (body.startsWith("#x") || body.startsWith("#X")) {
              try {
                val cp = Integer.parseInt(body.substring(2), 16)
                if (Character.isValidCodePoint(cp)) new String(Character.toChars(cp)) else null
              } catch { case _: Exception => null }
            } else if (body.startsWith("#")) {
              try {
                val cp = Integer.parseInt(body.substring(1))
                if (Character.isValidCodePoint(cp)) new String(Character.toChars(cp)) else null
              } catch { case _: Exception => null }
            } else namedEntities.getOrElse(body, null)
          if (decoded != null) { sb.append(decoded); i = semi + 1 }
          else { sb.append(c); i += 1 }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def isNameStart(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  private def isNameChar(c: Char): Boolean =
    isNameStart(c) || (c >= '0' && c <= '9') || c == '-' || c == '_' || c == ':' || c == '.'

  /** Tokenize `html` into `sink`. Never throws on malformed input. */
  def tokenize(html: String, sink: Sink): Unit = {
    val n = html.length
    var i = 0
    var textStart = 0
    // per-call attr scratch (grown on demand, copied out per tag)
    var scratchN = new Array[String](8)
    var scratchV = new Array[String](8)

    def flushText(until: Int): Unit =
      if (until > textStart) sink.text(unescape(html.substring(textStart, until)))

    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) { i = n }
      else if (lt + 1 >= n) { i = n }
      else {
        val c1 = html.charAt(lt + 1)
        if (c1 == '!') {
          if (html.startsWith("<!--", lt)) {
            flushText(lt)
            val close = html.indexOf("-->", lt + 4)
            val end = if (close < 0) n else close
            sink.comment(html.substring(lt + 4, end))
            i = if (close < 0) n else close + 3
            textStart = i
          } else {
            // doctype / CDATA-ish declaration: skip to '>'
            flushText(lt)
            val close = html.indexOf('>', lt + 2)
            i = if (close < 0) n else close + 1
            textStart = i
          }
        } else if (c1 == '?') {
          flushText(lt)
          val close = html.indexOf('>', lt + 2)
          i = if (close < 0) n else close + 1
          textStart = i
        } else if (c1 == '/') {
          var j = lt + 2
          val nameStart = j
          while (j < n && isNameChar(html.charAt(j))) j += 1
          if (j == nameStart) { i = lt + 1 } // "</" not a tag: keep as text
          else {
            flushText(lt)
            val name = canonName(html, nameStart, j)
            val close = html.indexOf('>', j)
            i = if (close < 0) n else close + 1
            sink.endTag(name)
            textStart = i
          }
        } else if (isNameStart(c1)) {
          // start tag
          var j = lt + 1
          while (j < n && isNameChar(html.charAt(j))) j += 1
          val name = canonName(html, lt + 1, j)
          var nAttrs = 0
          var selfClosing = false
          var done = false
          var broken = false
          while (!done && j < n) {
            while (j < n && Character.isWhitespace(html.charAt(j))) j += 1
            if (j >= n) { broken = true; done = true }
            else {
              val cj = html.charAt(j)
              if (cj == '>') { j += 1; done = true }
              else if (cj == '/' && j + 1 < n && html.charAt(j + 1) == '>') {
                selfClosing = true; j += 2; done = true
              } else if (isNameChar(cj)) {
                val as = j
                while (j < n && isNameChar(html.charAt(j))) j += 1
                val aname = canonName(html, as, j)
                while (j < n && Character.isWhitespace(html.charAt(j))) j += 1
                var avalue = ""
                if (j < n && html.charAt(j) == '=') {
                  j += 1
                  while (j < n && Character.isWhitespace(html.charAt(j))) j += 1
                  if (j < n && (html.charAt(j) == '"' || html.charAt(j) == '\'')) {
                    val q = html.charAt(j)
                    val vs = j + 1
                    val ve = html.indexOf(q, vs)
                    if (ve < 0) { avalue = html.substring(vs, n); j = n; broken = true; done = true }
                    else { avalue = html.substring(vs, ve); j = ve + 1 }
                  } else {
                    val vs = j
                    while (j < n && !Character.isWhitespace(html.charAt(j)) &&
                      html.charAt(j) != '>' && html.charAt(j) != '/') j += 1
                    avalue = html.substring(vs, j)
                  }
                }
                if (nAttrs == scratchN.length) {
                  scratchN = java.util.Arrays.copyOf(scratchN, nAttrs * 2)
                  scratchV = java.util.Arrays.copyOf(scratchV, nAttrs * 2)
                }
                scratchN(nAttrs) = aname
                scratchV(nAttrs) = unescape(avalue)
                nAttrs += 1
              } else {
                j += 1 // junk char inside tag: skip
              }
            }
          }
          if (broken && j >= n && !done) { i = n }
          flushText(lt)
          if (nAttrs == 0) sink.startTag(name, null, null, selfClosing)
          else sink.startTag(name, java.util.Arrays.copyOf(scratchN, nAttrs),
            java.util.Arrays.copyOf(scratchV, nAttrs), selfClosing)
          i = j
          textStart = i
          // raw-text elements: consume to the matching close tag verbatim
          if (!selfClosing && (name == "script" || name == "style")) {
            val needle = "</" + name
            var closeIdx = -1
            var k = i
            // jump between '<' occurrences instead of probing every char
            while (closeIdx < 0 && k <= n - needle.length) {
              val lt2 = html.indexOf('<', k)
              if (lt2 < 0 || lt2 > n - needle.length) k = n
              else if (html.regionMatches(true, lt2, needle, 0, needle.length)) closeIdx = lt2
              else k = lt2 + 1
            }
            val end = if (closeIdx < 0) n else closeIdx
            if (end > i) sink.text(html.substring(i, end)) // raw: no unescape
            if (closeIdx < 0) { i = n } else {
              val gt = html.indexOf('>', closeIdx)
              i = if (gt < 0) n else gt + 1
            }
            sink.endTag(name)
            textStart = i
          }
        } else {
          // stray '<' — treat as text, continue after it
          i = lt + 1
        }
      }
    }
    flushText(n)
  }
}
