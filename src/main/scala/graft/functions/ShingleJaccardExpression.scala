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

  override def nullSafeEval(l: Any, r: Any): Any =
    MinHashCore.shingleJaccard(l.asInstanceOf[UTF8String].toString,
      r.asInstanceOf[UTF8String].toString)

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ShingleFunctions {
  def shingle_jaccard(a: Column, b: Column): Column =
    GraftSqlBridge.column(ShingleJaccard(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
