package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.TextOps

/** Table-driven parity spec: every row was produced by CPython
  * (str.strip / unicodedata.normalize NFKD / combining-filter /
  * str.upper / str.lower) — the semantics the reference engine
  * inherits from Python (text_normalizer.py, base_parser.py).
  */
class TextOpsParitySpec extends AnyFunSuite {
  // (input, strip, nfkd, removeAccents, forComparison, normalizeForMatching)
  val vectors: Seq[(String, String, String, String, String, String)] = Seq(
    ("  hello  ", "hello", "  hello  ", "  hello  ", "  HELLO  ", "hello"),
    ("\u00a0x\u00a0", "x", " x ", " x ", " X ", "x"),
    ("EXPRESS\u00c3O", "EXPRESS\u00c3O", "EXPRESSA\u0303O", "EXPRESSAO", "EXPRESSAO", "expressao"),
    ("EXPRESS\u00c3\u0083O", "EXPRESS\u00c3\u0083O", "EXPRESSA\u0303\u0083O", "EXPRESSA\u0083O", "EXPRESSA\u0083O", "expressa\u0083o"),
    ("M\u00e9trica", "M\u00e9trica", "Me\u0301trica", "Metrica", "METRICA", "metrica"),
    ("a\u00e7\u00e3o cora\u00e7\u00e3o", "a\u00e7\u00e3o cora\u00e7\u00e3o", "ac\u0327a\u0303o corac\u0327a\u0303o", "acao coracao", "ACAO CORACAO", "acao coracao"),
    ("\u0009\u000a\u2028 mixed \u3000", "mixed", "\u0009\u000a\u2028 mixed  ", "\u0009\u000a\u2028 mixed  ", "\u0009\u000a\u2028 MIXED  ", "mixed"),
    ("\u00df", "\u00df", "\u00df", "\u00df", "SS", "\u00df"),
    ("\ufb01re", "\ufb01re", "fire", "fire", "FIRE", "fire"),
    ("\u00bd", "\u00bd", "1\u20442", "1\u20442", "1\u20442", "1\u20442"),
    ("M\u00eas", "M\u00eas", "Me\u0302s", "Mes", "MES", "mes"),
    ("cr\u00e8me br\u00fbl\u00e9e", "cr\u00e8me br\u00fbl\u00e9e", "cre\u0300me bru\u0302le\u0301e", "creme brulee", "CREME BRULEE", "creme brulee"),
    ("\u03a3\u038a\u03a3\u03a5\u03a6\u039f\u03a3", "\u03a3\u038a\u03a3\u03a5\u03a6\u039f\u03a3", "\u03a3\u0399\u0301\u03a3\u03a5\u03a6\u039f\u03a3", "\u03a3\u0399\u03a3\u03a5\u03a6\u039f\u03a3", "\u03a3\u0399\u03a3\u03a5\u03a6\u039f\u03a3", "\u03c3\u03b9\u03c3\u03c5\u03c6\u03bf\u03c2"),
    ("\u0451\u043b\u043a\u0430", "\u0451\u043b\u043a\u0430", "\u0435\u0308\u043b\u043a\u0430", "\u0435\u043b\u043a\u0430", "\u0415\u041b\u041a\u0410", "\u0435\u043b\u043a\u0430"),
    ("a\u0301", "a\u0301", "a\u0301", "a", "A", "a"),
    ("\u0e33", "\u0e33", "\u0e4d\u0e32", "\u0e4d\u0e32", "\u0e4d\u0e32", "\u0e4d\u0e32"),
    ("\ud55c\uad6d\uc5b4", "\ud55c\uad6d\uc5b4", "\u1112\u1161\u11ab\u1100\u116e\u11a8\u110b\u1165", "\u1112\u1161\u11ab\u1100\u116e\u11a8\u110b\u1165", "\u1112\u1161\u11ab\u1100\u116e\u11a8\u110b\u1165", "\u1112\u1161\u11ab\u1100\u116e\u11a8\u110b\u1165"),
    ("\uff76\uff80\uff76\uff85", "\uff76\uff80\uff76\uff85", "\u30ab\u30bf\u30ab\u30ca", "\u30ab\u30bf\u30ab\u30ca", "\u30ab\u30bf\u30ab\u30ca", "\u30ab\u30bf\u30ab\u30ca"),
    ("\u216b", "\u216b", "XII", "XII", "XII", "xii"),
    ("x\u200bx", "x\u200bx", "x\u200bx", "x\u200bx", "X\u200bX", "x\u200bx"),
    ("", "", "", "", "", ""),
    (" ", "", " ", " ", " ", ""),
    ("\u2115 \u2286 \u211d", "\u2115 \u2286 \u211d", "N \u2286 R", "N \u2286 R", "N \u2286 R", "n \u2286 r"),
    ("word\u00a0with\u00a0nbsp", "word\u00a0with\u00a0nbsp", "word with nbsp", "word with nbsp", "WORD WITH NBSP", "word with nbsp"),
    ("  \u00a0 \u0009 ", "", "    \u0009 ", "    \u0009 ", "    \u0009 ", ""),
    ("Controle de Acesso", "Controle de Acesso", "Controle de Acesso", "Controle de Acesso", "CONTROLE DE ACESSO", "controle de acesso"),
    ("Propriet\u00e1rio", "Propriet\u00e1rio", "Proprieta\u0301rio", "Proprietario", "PROPRIETARIO", "proprietario")
  )

  test("stripPy matches CPython str.strip") {
    for ((in, strip, _, _, _, _) <- vectors) assert(TextOps.stripPy(in) == strip, s"input=<$in>")
  }
  test("nfkd matches CPython unicodedata NFKD") {
    for ((in, _, nfkd, _, _, _) <- vectors) assert(TextOps.nfkd(in) == nfkd, s"input=<$in>")
  }
  test("removeAccents matches CPython combining filter") {
    for ((in, _, _, ra, _, _) <- vectors) assert(TextOps.removeAccents(in) == ra, s"input=<$in>")
  }
  test("forComparison matches reference for_comparison") {
    for ((in, _, _, _, fc, _) <- vectors) assert(TextOps.forComparison(in) == fc, s"input=<$in>")
  }
  test("normalizeForMatching matches reference normalize_for_matching") {
    for ((in, _, _, _, _, fm) <- vectors) assert(TextOps.normalizeForMatching(in) == fm, s"input=<$in>")
  }
}
