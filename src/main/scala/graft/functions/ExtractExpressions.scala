package graft.functions

import graft.extract.MainContent
import graft.pipeline.ExtractPipeline
import graft.text.TextOps
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expressions exposing the extraction core at the SQL/Column
  * level (SURVEY.md §7.3 "optional SQL surface"): composable in any
  * query, registered for `spark.sql` via [[GraftFunctions.register]].
  *
  * The heavy lifting is the same pure-Scala tokenizer/classifier used by
  * the typed pipeline; `CodegenFallback` is appropriate here — per-row
  * cost is dominated by parsing, not call overhead, and the expression
  * still sits inside whole-stage-codegen'd plans as a leaf call.
  */
case class ExtractMainText(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "extract_main_text"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (binary, string), got (${left.dataType}, ${right.dataType})")

  override def nullSafeEval(htmlBytes: Any, charset: Any): Any = {
    val bytes = htmlBytes.asInstanceOf[Array[Byte]]
    val cs = charset.asInstanceOf[UTF8String].toString
    val html = ExtractPipeline.decode(bytes, cs)
    UTF8String.fromString(MainContent.extractText(html))
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Python-parity NFKD + combining-strip + upper (reference
  * text_normalizer.py:12-31) as a scalar expression.
  */
case class NormalizeForComparison(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_for_comparison"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires string input")

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(TextOps.forComparison(v.asInstanceOf[UTF8String].toString))
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GraftFunctions {

  def extract_main_text(html: Column, charset: Column): Column =
    GraftSqlBridge.column(ExtractMainText(
      GraftSqlBridge.expression(html), GraftSqlBridge.expression(charset)))

  def normalize_for_comparison(c: Column): Column =
    GraftSqlBridge.column(NormalizeForComparison(GraftSqlBridge.expression(c)))

  /** Register for SQL: `SELECT extract_main_text(html, 'utf-8') …`.
    * Session-scoped equivalent of [[graft.GraftExtensions]] (which is
    * the cluster-wide `spark.sql.extensions` path).
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def withArity(name: String, arity: Int)(
        b: Seq[Expression] => Expression): Seq[Expression] => Expression =
      exprs => {
        if (exprs.length != arity) throw new IllegalArgumentException(
          s"$name requires $arity argument(s), got ${exprs.length}")
        b(exprs)
      }
    reg.createOrReplaceTempFunction("extract_main_text",
      withArity("extract_main_text", 2)(e => ExtractMainText(e.head, e(1))), "scala_udf")
    reg.createOrReplaceTempFunction("normalize_for_comparison",
      withArity("normalize_for_comparison", 1)(e => NormalizeForComparison(e.head)), "scala_udf")
    reg.createOrReplaceTempFunction("vec_dot",
      withArity("vec_dot", 2)(e => VecDot(e.head, e(1))), "scala_udf")
    reg.createOrReplaceTempFunction("shingle_jaccard",
      withArity("shingle_jaccard", 2)(e => ShingleJaccard(e.head, e(1))), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_sigs",
      withArity("minhash_sigs", 2)(MinHashFunctions.buildFromExprs), "scala_udf")
    reg.createOrReplaceTempFunction("srp_sigs",
      withArity("srp_sigs", 3)(SrpSigs.buildFromExprs), "scala_udf")
  }
}
