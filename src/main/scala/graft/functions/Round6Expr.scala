package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native `round(x, 6)` for doubles, bit-identical to Spark's expression.
  *
  * Spark's `Round` converts every double to `scala.math.BigDecimal`
  * (shortest-decimal-string) and `setScale(6, HALF_UP)`s it — one
  * BigDecimal + MathContext allocation per value. The ANN queries round a
  * similarity PER CANDIDATE PAIR (32 M+ rows at the 100× replica; the
  * same allocation profile that made IVF assignment BigDecimal-bound
  * before the two-pass argmax fix). This expression does the arithmetic
  * in doubles — `floor(x*1e6 + 0.5)` style — EXCEPT when `x*1e6` lands
  * within 1e-6 of an exact half, where shortest-decimal-vs-binary
  * representation can flip the digit; those rows (and any |x| > 1e6,
  * where the ×1e6 ulp approaches the band width) fall back to the exact
  * BigDecimal path. Outside the band both methods agree on the nearest
  * 6-dp value, so the result is bit-identical for EVERY input
  * (fuzz-gated, including planted exact halves). NaN/±Inf pass through
  * exactly like Spark's Round. */
case class Round6(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_round6"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects double, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    Round6Util.round6(v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.Round6Util.round6($a)")

  override protected def withNewChildInternal(newChild: Expression): Round6 =
    copy(child = newChild)
}

object Round6Util {
  /** Exact replica of Spark Round(x, 6) semantics for doubles. */
  def round6(x: Double): Double = {
    if (x.isNaN || x.isInfinite) return x
    val ax = math.abs(x)
    if (ax > 1e6) return exact(x)
    val y = x * 1e6
    val f = math.floor(y)
    val frac = y - f
    // near an exact decimal half the shortest-decimal representation can
    // disagree with binary arithmetic — delegate to the exact path. The
    // band must scale with ulp(y): at |x| ~ 4.5e3, ulp(x*1e6) already
    // exceeds a fixed 1e-6, and exact-decimal halves above that escaped
    // a constant band (e.g. x=33546.9128745 fast-rounded down while
    // BigDecimal HALF_UP rounds up).
    val band = math.max(1e-6, 4.0 * Math.ulp(y))
    if (frac > 0.5 - band && frac < 0.5 + band) exact(x)
    // + 0.0 normalizes -0.0 to +0.0, matching BigDecimal's unsigned zero
    else (if (frac >= 0.5) f + 1.0 else f) / 1e6 + 0.0
  }

  private def exact(x: Double): Double =
    scala.math.BigDecimal(x)
      .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
}
