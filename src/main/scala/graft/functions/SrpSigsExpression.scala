package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Sign-random-projection bucket key over `nPlanes` md5-derived
  * hyperplanes (indices [firstPlane, firstPlane + nPlanes)), fused into
  * ONE pass over the embedding: element-outer, plane-inner over a
  * transposed signs matrix, so each vector element (and its null check)
  * is read exactly once while all plane accumulators advance together.
  * The compositional form — `concat` of `nPlanes` independent
  * `when(vec_dot(emb, plane_p) >= 0, '1').otherwise('0')` branches —
  * walks the vector once per plane and carries a plan node per plane.
  *
  * Exact semantics of the compositional form are preserved, bit for
  * bit, including the edges:
  *  - per-plane accumulation is the same left-to-right double fold
  *    (element-outer accumulation adds the identical term sequence);
  *  - a NaN projection yields '1' — Spark SQL `>=` uses NaN-is-greater
  *    ordering (SQLOrderingUtil), as does the DuckDB oracle;
  *  - a NULL vector, a length-mismatched vector, or a null element
  *    NULL-poisons every per-plane vec_dot, and `when(NULL >= 0, ...)`
  *    falls through to '0' — so the bucket is the all-'0' string,
  *    never NULL (this expression is non-nullable).
  */
case class SrpSigs(child: Expression, firstPlane: Int, nPlanes: Int,
                   dim: Int = 64) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "srp_sigs"

  private def elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = elemType match {
    case FloatType | DoubleType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> input, got ${child.dataType}")
  }

  @transient private lazy val isFloat = elemType == FloatType

  /** Transposed [dim][nPlanes] sign matrix — plane-inner access is then
    * a contiguous row per element. Deterministic; recomputed cheaply
    * after executor deserialization.
    */
  @transient private lazy val signsT: Array[Array[Double]] =
    Array.tabulate(dim, nPlanes)((j, p) => SrpSigs.planeSign(firstPlane + p, j).toDouble)

  @transient private lazy val allZeros = "0" * nPlanes

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) UTF8String.fromString(allZeros) else nullSafeEval(v)
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() != dim) return UTF8String.fromString(allZeros)
    val acc = new Array[Double](nPlanes)
    var j = 0
    while (j < dim) {
      if (a.isNullAt(j)) return UTF8String.fromString(allZeros)
      val v = if (isFloat) a.getFloat(j).toDouble else a.getDouble(j)
      val w = signsT(j)
      var p = 0
      while (p < nPlanes) { acc(p) += v * w(p); p += 1 }
      j += 1
    }
    val sb = new java.lang.StringBuilder(nPlanes)
    var p = 0
    while (p < nPlanes) {
      val s = acc(p)
      // NaN-is-greater: matches Spark SQL `>=` and the DuckDB oracle
      sb.append(if (java.lang.Double.isNaN(s) || s >= 0.0) '1' else '0')
      p += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val signsRef = ctx.addReferenceObj("srpSignsT", signsT, "double[][]")
    val zerosRef = ctx.addReferenceObj("srpZeros", UTF8String.fromString(allZeros),
      classOf[UTF8String].getName)
    val getter = if (isFloat) "getFloat" else "getDouble"
    val childGen = child.genCode(ctx)
    val a = childGen.value
    val p = ctx.freshName("p")
    val j = ctx.freshName("j")
    val v = ctx.freshName("v")
    val acc = ctx.freshName("acc")
    val sb = ctx.freshName("sb")
    val poisoned = ctx.freshName("poisoned")
    val body =
      code"""
         |${childGen.code}
         |UTF8String ${ev.value};
         |boolean $poisoned = ${childGen.isNull} || $a.numElements() != $dim;
         |double[] $acc = new double[$nPlanes];
         |for (int $j = 0; $j < $dim && !$poisoned; $j++) {
         |  if ($a.isNullAt($j)) { $poisoned = true; break; }
         |  double $v = (double) $a.$getter($j);
         |  for (int $p = 0; $p < $nPlanes; $p++) {
         |    $acc[$p] += $v * $signsRef[$j][$p];
         |  }
         |}
         |if ($poisoned) {
         |  ${ev.value} = $zerosRef;
         |} else {
         |  java.lang.StringBuilder $sb = new java.lang.StringBuilder($nPlanes);
         |  for (int $p = 0; $p < $nPlanes; $p++) {
         |    $sb.append((Double.isNaN($acc[$p]) || $acc[$p] >= 0.0) ? '1' : '0');
         |  }
         |  ${ev.value} = UTF8String.fromString($sb.toString());
         |}
       """.stripMargin
    ev.copy(code = body, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SrpSigs {
  /** Deterministic pseudo-random hyperplane sign: component j of plane
    * p is +1 if hex digit (j mod 16) of md5("plane:p:" || j/16) is >=
    * '8' else -1 — derived entirely from md5 so the DuckDB oracle can
    * rebuild it (SparkEntry annLshOracle / embedNearDupOracle planes).
    */
  def planeSign(p: Int, j: Int): Int = {
    val block = org.apache.commons.codec.digest.DigestUtils.md5Hex(s"plane:$p:${j / 16}")
    if (Character.digit(block.charAt(j % 16), 16) >= 8) 1 else -1
  }

  def srp_sigs(emb: Column, firstPlane: Int, nPlanes: Int): Column =
    GraftSqlBridge.column(SrpSigs(GraftSqlBridge.expression(emb), firstPlane, nPlanes))

  /** SQL-surface builder shared by the session registry and
    * [[graft.GraftExtensions]] — plane arguments must be int/long
    * literals (same rule as minhash_sigs' k).
    */
  def buildFromExprs(exprs: Seq[Expression]): Expression = {
    def intLit(x: Expression, what: String): Int =
      if (x.foldable) x.eval() match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"srp_sigs $what must be an integer literal, got $other")
      } else throw new IllegalArgumentException(s"srp_sigs $what must be a literal")
    SrpSigs(exprs.head, intLit(exprs(1), "firstPlane"), intLit(exprs(2), "nPlanes"))
  }
}
