package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact word-3-gram Jaccard similarity of two texts:
  * |distinct(shingles(a)) ∩ distinct(shingles(b))| / |union|.
  *
  * Shingling matches [[MinHashSigs]] (split on single space, 3-word
  * windows joined by ' ', whole text when <3 words) and the DuckDB
  * oracle's list_distinct/list_intersect/list_concat formula.
  *
  * Evaluated per candidate PAIR (LSH output ≪ corpus size), this beats
  * materializing a distinct-shingle array column for every document:
  * at 10^12 docs the array column is ~200 strings/doc of shuffle width,
  * while candidates are a few per thousand docs.
  */
case class ShingleJaccard(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "shingle_jaccard"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires two string columns")

  private def shingleSet(text: String): java.util.HashSet[String] = {
    val set = new java.util.HashSet[String]()
    Shingling.foreach(text)(s => { set.add(s); () })
    set
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val sa = shingleSet(l.asInstanceOf[UTF8String].toString)
    val sb = shingleSet(r.asInstanceOf[UTF8String].toString)
    var inter = 0
    val it = sa.iterator()
    while (it.hasNext) if (sb.contains(it.next())) inter += 1
    val union = sa.size + sb.size - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ShingleFunctions {
  def shingle_jaccard(a: Column, b: Column): Column =
    GraftSqlBridge.column(ShingleJaccard(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
