package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All `numHashes` minhash values of a document's word-3-gram shingle
  * set in ONE pass — semantically identical to
  *
  * {{{
  *   min over shingles of substr(md5(k || ':' || shingle), 1, 16)
  * }}}
  *
  * for k in [0, numHashes): the first 16 hex chars of an md5 compare
  * lexicographically exactly like the unsigned 64-bit value of the
  * first 8 digest bytes, so the per-shingle work is one cheap
  * `MessageDigest` update per k and an unsigned-long min — no hex
  * string, no UTF8String, no per-hash Catalyst expression tree. This
  * replaces an explode(1M shingles) → 8×md5 → hash-aggregate plan
  * (one full shuffle + ~12µs/hash of expression overhead) with a
  * shuffle-free projection.
  *
  * Shingles: split on single space (trailing empties kept — mirrors
  * both Spark `split(text, ' ')` and DuckDB `string_split`), 3-word
  * windows joined by ' '; docs with <3 words use the whole text.
  *
  * CodegenFallback is fine: one eval per DOCUMENT (not per shingle);
  * parsing dominates.
  */
case class MinHashSigs(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sigs"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string column")

  override def nullSafeEval(input: Any): Any = {
    val sigs = MinHashCore.sigs(input.asInstanceOf[UTF8String].toString, numHashes)
    val out = new Array[Any](numHashes)
    var k = 0
    while (k < numHashes) {
      out(k) = UTF8String.fromString(sigs(k))
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Row-local MinHash core — the ONE implementation of the signature
  * arithmetic, shared by the Catalyst expression ([[MinHashSigs]]) and
  * the streaming near-dup state
  * ([[graft.streaming.StreamingExtract.nearDupVotes]]): batch LSH and
  * the stream MUST produce identical signatures, or a recrawl deduped
  * in one path survives the other.
  */
object MinHashCore {
  // shared across tasks in one JVM → digest state must be per-thread
  private val mdLocal =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))
  private val bufLocal =
    ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](16))
  // keyed by k, not a single slot: two signature families in one query
  // (e.g. minhash_sigs(text, 8) and minhash_sigs(text, 16) in one
  // projection) must not thrash-rebuild the table per row
  private val prefixCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Array[Byte]]]()
  private def prefixes(k: Int): Array[Array[Byte]] =
    prefixCache.computeIfAbsent(k, kk => Array.tabulate(kk)(i =>
      s"$i:".getBytes(java.nio.charset.StandardCharsets.UTF_8)))

  /** Unsigned-compare key of the first 8 digest bytes; adding Long.MinValue
    * maps unsigned order onto signed Long order.
    */
  @inline private def key8(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v + Long.MinValue
  }

  /** The `numHashes` minhash values as 16-hex-char strings — equal to
    * `min over shingles of substr(md5(k || ':' || shingle), 1, 16)`.
    */
  def sigs(text: String, numHashes: Int): Array[String] = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val md = mdLocal.get()
    val digestBuf = bufLocal.get()
    val pre = prefixes(numHashes)

    def absorb(shingle: String): Unit = {
      val sb = shingle.getBytes(utf8)
      var k = 0
      while (k < numHashes) {
        md.reset()
        md.update(pre(k))
        md.update(sb)
        md.digest(digestBuf, 0, 16)
        val v = key8(digestBuf)
        if (v < mins(k)) mins(k) = v
        k += 1
      }
    }

    Shingling.foreach(text)(absorb)
    Array.tabulate(numHashes)(k => f"${mins(k) - Long.MinValue}%016x")
  }

  /** The word-3-gram shingle set of a text — exposed so callers that
    * verify one text against MANY (the streaming near-dup exact mode)
    * can build each side's set once instead of re-shingling per
    * comparison.
    */
  def shingleSetOf(text: String): java.util.HashSet[String] = {
    val set = new java.util.HashSet[String]()
    Shingling.foreach(text)(s => { set.add(s); () })
    set
  }

  /** Jaccard of two prebuilt shingle sets (empty-union ⇒ 0.0, matching
    * [[ShingleJaccard]]).
    */
  def jaccardSets(sa: java.util.HashSet[String], sb: java.util.HashSet[String]): Double = {
    var inter = 0
    val it = sa.iterator()
    while (it.hasNext) if (sb.contains(it.next())) inter += 1
    val union = sa.size + sb.size - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** Exact word-3-gram Jaccard of two texts — the row-local form of
    * [[ShingleJaccard]] (same shingling, same formula), used by the
    * streaming near-dup verification.
    */
  def shingleJaccard(a: String, b: String): Double =
    jaccardSets(shingleSetOf(a), shingleSetOf(b))
}

/** The ONE word-3-gram shingling rule, shared by LSH candidate
  * generation ([[MinHashSigs]]) and exact verification
  * ([[ShingleJaccard]]) — the two must shingle identically for
  * LSH-then-verify dedup to be sound. Split on single space (trailing
  * empties kept, mirroring Spark `split(text, ' ')` and DuckDB
  * `string_split`), 3-word windows joined by ' ', whole text when
  * <3 words.
  */
private[functions] object Shingling {
  def foreach(text: String)(f: String => Unit): Unit = {
    val words = text.split(" ", -1)
    if (words.length >= 3) {
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i + 2 < words.length) {
        sb.setLength(0)
        sb.append(words(i)).append(' ').append(words(i + 1)).append(' ').append(words(i + 2))
        f(sb.toString)
        i += 1
      }
    } else f(text)
  }
}

object MinHashFunctions {
  def minhash_sigs(text: Column, numHashes: Int): Column =
    GraftSqlBridge.column(MinHashSigs(GraftSqlBridge.expression(text), numHashes))

  /** SQL builder shared by the session registry and the
    * SparkSessionExtensions path: arity check + integer-literal k.
    */
  def buildFromExprs(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"minhash_sigs requires 2 arguments (text, k), got ${exprs.length}")
    val k = exprs(1).eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"minhash_sigs: k must be an integer literal, got $other")
    }
    MinHashSigs(exprs.head, k)
  }
}
