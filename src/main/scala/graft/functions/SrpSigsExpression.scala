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
  * ONE pass over the embedding: the compositional form — `concat` of
  * `nPlanes` independent `when(vec_dot(emb, plane_p) >= 0, ...)`
  * branches — walks the vector once per plane and carries a plan node
  * per plane; this expression reads the vector once, streaming all
  * plane accumulators together (cache-resident signs matrix), and stays
  * inside whole-stage codegen. Arithmetic is bit-identical to the
  * compositional form: per plane a left-to-right double fold and a
  * `>= 0` sign test (NaN → '0'), so the DuckDB oracle is unchanged.
  *
  * Vector length must equal `dim` (the plane dimensionality, matching
  * the oracle's generate_series(0, 63)); mismatch or a null element →
  * NULL, the same poisoning as the vec_dot form.
  */
case class SrpSigs(child: Expression, firstPlane: Int, nPlanes: Int,
                   dim: Int = 64) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
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

  // deterministic, recomputed cheaply after executor deserialization
  @transient private lazy val signs: Array[Array[Double]] =
    Array.tabulate(nPlanes, dim)((p, j) => SrpSigs.planeSign(firstPlane + p, j).toDouble)

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() != dim) return null
    val sb = new java.lang.StringBuilder(nPlanes)
    var p = 0
    while (p < nPlanes) {
      val w = signs(p)
      var s = 0.0
      var j = 0
      while (j < dim) {
        if (a.isNullAt(j)) return null
        s += (if (isFloat) a.getFloat(j).toDouble else a.getDouble(j)) * w(j)
        j += 1
      }
      sb.append(if (s >= 0) '1' else '0')
      p += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("srpSigns", signs, "double[][]")
    val getter = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val sb = ctx.freshName("sb")
      s"""
         |if ($a.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  java.lang.StringBuilder $sb = new java.lang.StringBuilder($nPlanes);
         |  for (int $p = 0; $p < $nPlanes && !${ev.isNull}; $p++) {
         |    double $s = 0.0;
         |    for (int $j = 0; $j < $dim; $j++) {
         |      if ($a.isNullAt($j)) { ${ev.isNull} = true; break; }
         |      $s += ((double) $a.$getter($j)) * $signsRef[$p][$j];
         |    }
         |    if (!${ev.isNull}) $sb.append($s >= 0.0 ? '1' : '0');
         |  }
         |  if (!${ev.isNull}) ${ev.value} = UTF8String.fromString($sb.toString());
         |}
       """.stripMargin
    })
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
}
