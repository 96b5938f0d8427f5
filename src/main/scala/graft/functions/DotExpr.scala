package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the dense double-vector dot product —
  * the inner loop of every similarity/ANN operator (e1/e2/d6).
  *
  * The composed alternatives are measurably worse at scale: an unrolled
  * element_at chain emits per-element bounds checks and caps at a fixed
  * dimensionality, and `aggregate(zip_with(...))` allocates an
  * intermediate array per pair. This expression is one fused loop over
  * both ArrayData buffers, left-associated like the DuckDB oracle's
  * `list_sum(list_transform(range(...), i -> a[i]*b[i]))` so sums stay
  * bit-identical. SURVEY §2.11's "custom Expression where perf matters"
  * case, same as [[Hash32]].
  *
  * A null ELEMENT in either consumed prefix makes the result null (r17):
  * the expression previously read null slots as primitive garbage, which
  * was safe only because every call site sat behind vecs()'s nrm gate —
  * but norm() itself now routes through this expression, so it must
  * reproduce the composed fold's null-propagation (`acc + null = null`)
  * rather than fabricate a value. Null-free vectors (every tested
  * corpus) take the identical arithmetic path. Length mismatch folds
  * over the shorter prefix.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"
  // nullable even over non-null array columns: a null ELEMENT nulls the
  // result, which child-column nullability cannot express
  override def nullable: Boolean = true

  // wrong-typed SQL args fail at ANALYSIS time with the expected
  // signature instead of ClassCastException / silent garbage at runtime;
  // array<float> (the raw embeddings column type) is read natively —
  // no cast pass over the vector
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<double>/array<float> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (lf, rf) = (isFloat(left), isFloat(right))
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      def get(arr: String, e: Expression) =
        if (isFloat(e)) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $s += ${get(a, left)} * ${get(b, right)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
