package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 16-bit SimHash of a document's token stream in ONE pass —
  * semantically identical to the compositional plan
  *
  * {{{
  *   explode(split(text, ' ')) → md5(tok) →
  *   groupBy(doc_id).agg(sum per hex digit of ±1 votes) →
  *   concat(when(v_i >= 0, '1').otherwise('0'))
  * }}}
  *
  * (kept as [[graft.ops.DedupOps.simhashCompositional]], parity-pinned
  * in VectorExprSpec): bit i of a token's hash is whether hex digit i
  * of md5(token) is >= '8' — i.e. the top bit of nibble i of the
  * digest — and the signature bit is the sign (>= 0 → '1') of the
  * per-bit vote sum over ALL token occurrences (multiplicity counts,
  * exactly like the explode). Tokens are `split(text, ' ')` with
  * trailing empties kept, mirroring Spark and DuckDB.
  *
  * Scale rationale: the compositional form explodes EVERY token of the
  * corpus and shuffles them keyed by doc_id — a full-corpus exchange
  * whose row count is the token count (~10^15 at 10^12 docs). This
  * expression folds the votes inside a projection: zero shuffle, one
  * md5 per token, no UTF8String per token.
  *
  * CodegenFallback is fine: one eval per DOCUMENT; hashing dominates.
  */
case class SimHash16(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash16"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string column")

  // shared generated code across tasks in one JVM → per-thread digest
  @transient private lazy val mdLocal =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))
  @transient private lazy val bufLocal =
    ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](16))

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val md = mdLocal.get()
    val digest = bufLocal.get()
    val votes = new Array[Int](16)
    // split(text, ' ') with limit -1: n separators → n+1 tokens, empties
    // included — every occurrence votes, like the exploded plan
    var start = 0
    var done = false
    while (!done) {
      val sep = text.indexOf(' ', start)
      val tok = if (sep < 0) { done = true; text.substring(start) }
                else text.substring(start, sep)
      start = sep + 1
      md.reset()
      md.update(tok.getBytes(utf8))
      md.digest(digest, 0, 16)
      var i = 0
      while (i < 16) {
        // hex digit i >= '8' ⇔ top bit of nibble i (high nibble for even
        // i, low for odd) is set
        val nibbleTop =
          if ((i & 1) == 0) (digest(i >> 1) & 0x80) != 0
          else (digest(i >> 1) & 0x08) != 0
        votes(i) += (if (nibbleTop) 1 else -1)
        i += 1
      }
    }
    val bits = new Array[Char](16)
    var i = 0
    while (i < 16) { bits(i) = if (votes(i) >= 0) '1' else '0'; i += 1 }
    UTF8String.fromString(new String(bits))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashFunctions {
  def simhash16(text: Column): Column =
    GraftSqlBridge.column(SimHash16(GraftSqlBridge.expression(text)))
}
