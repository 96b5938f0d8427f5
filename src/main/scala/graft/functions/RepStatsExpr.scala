package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for x14's repetition stats over a token-hash
  * array: `struct(n_tokens, top_tok, top_big)` where `top_tok` is the max
  * multiplicity of any token hash and `top_big` the max multiplicity of
  * any arithmetic 2-gram hash (`(h[i]*991 + h[i+1]) % 4294967291`,
  * [[Text.shingleHashes2]]'s combine).
  *
  * The composed form ([[Text.maxRunCount]] over two `array_sort`s plus a
  * `transform` for the 2-grams) is FIVE interpreted HOF passes per row —
  * HOFs never enter codegen, and the index fold pays two `element_at`
  * calls per element (38 s standalone at the 100× replica, vs 65 s for
  * the even-worse explode+groupBy shuffle form). This is one fused call:
  * copy to a primitive long[], `Arrays.sort`, run-scan, build the 2-gram
  * long[], sort, run-scan — inside whole-stage codegen. Same case as
  * [[SimHash]]/[[TokenHashes]] (SURVEY §2.11).
  *
  * Bit-identical to the composed form: sorting makes equal values
  * adjacent, so the longest run IS the highest count; the 2-gram combine
  * uses the same non-overflowing long arithmetic (h < 2^32, h*991 < 2^42).
  * Null array → null (the composed form's sorts would also null out).
  * Token hashes are never null elements ([[TokenHashes]] contract). */
case class RepetitionStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = RepStatsUtil.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_repstats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint>, got ${other.simpleString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else RepStatsUtil.compute(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = ${c.isNull};
      InternalRow ${ev.value} = ${ev.isNull} ? null :
        graft.functions.RepStatsUtil.compute(${c.value});""")
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepStatsUtil {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("top_tok", LongType, nullable = false),
    StructField("top_big", LongType, nullable = false)))

  private def maxRun(sorted: Array[Long]): Long = {
    val n = sorted.length
    if (n == 0) return 0L
    var mx = 1L; var run = 1L
    var i = 1
    while (i < n) {
      if (sorted(i) == sorted(i - 1)) run += 1 else run = 1
      if (run > mx) mx = run
      i += 1
    }
    mx
  }

  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val h = arr.toLongArray()
    val big = if (n >= 2) {
      val b = new Array[Long](n - 1)
      var i = 0
      while (i < n - 1) {
        b(i) = (h(i) * 991L + h(i + 1)) % Text.MinhashP
        i += 1
      }
      b
    } else Array.emptyLongArray
    java.util.Arrays.sort(h)
    java.util.Arrays.sort(big)
    new GenericInternalRow(Array[Any](n.toLong, maxRun(h), maxRun(big)))
  }
}
