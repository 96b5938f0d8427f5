package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression for the PQ asymmetric-distance fold:
  * `adc(codes, lut) = Σ_m lut[m][codes[m]]` — the inner loop of every
  * ADC scan (e3 / pqSearchRerank / ivfPqSearch), executed N×Q times.
  *
  * The composed form `aggregate(zip_with(codes, lut, (c, l) ->
  * element_at(l, c+1)), ...)` is a higher-order-function chain: HOFs stay
  * OUTSIDE whole-stage codegen and allocate a zipped intermediate array
  * per row-pair. This expression is one fused loop over the two ArrayData
  * buffers with no allocation, summed in the same ascending-m
  * left-associated order, so results are bit-identical to the composed
  * form and to the DuckDB oracle's `list_sum(list_transform(range(1,M+1),
  * m -> lut[m][codes[m]+1]))`.
  *
  * Codes are 0-based indices into their subspace's LUT row; both arrays
  * must be non-null with non-null elements (PQ encode/LUT generation
  * guarantees this). Folds over the common prefix on length mismatch,
  * like [[DotProduct]]. Because `graft_adc` is registered as a general
  * SQL function, each code is bounds-checked against its LUT row before
  * the read — UnsafeArrayData.getDouble does NOT check, so an
  * out-of-range code from user input would otherwise silently read
  * out-of-bounds memory; we raise instead.
  */
case class AdcFold(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_adc"

  override def checkInputDataTypes(): TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<int>, array<array<double>>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val n = math.min(codes.numElements(), lut.numElements())
    var s = 0.0
    var m = 0
    while (m < n) {
      val row = lut.getArray(m)
      val c = codes.getInt(m)
      if (c < 0 || c >= row.numElements())
        throw new IllegalArgumentException(
          s"graft_adc: code $c out of range for LUT row of ${row.numElements()} at subspace $m")
      s += row.getDouble(c)
      m += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val m = ctx.freshName("m")
      val row = ctx.freshName("row")
      val c = ctx.freshName("c")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $m = 0; $m < $n; $m++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $row = $b.getArray($m);
         |  int $c = $a.getInt($m);
         |  if ($c < 0 || $c >= $row.numElements()) {
         |    throw new IllegalArgumentException(
         |      "graft_adc: code " + $c + " out of range for LUT row of " +
         |      $row.numElements() + " at subspace " + $m);
         |  }
         |  $s += $row.getDouble($c);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcFold =
    copy(left = newLeft, right = newRight)
}
