package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression for SimHash over a token-hash array.
  *
  * The composed form ([[Text.simhashBuiltin]]) folds the array once PER
  * BIT — 16 interpreted `aggregate` passes over every document's hashes
  * (HOFs never enter codegen), which made d5 the third-costliest query at
  * the 100× probe. This is ONE fused loop accumulating all bit counters
  * per element, inside whole-stage codegen. SURVEY §2.11's "custom
  * Expression where perf matters" case, same as [[Hash32]]/[[DotProduct]].
  *
  * Bit-identical to the built-in form and the DuckDB oracle
  * (`CASE WHEN list_sum(list_transform(h, x -> ((x >> j) & 1)*2 - 1)) > 0
  * THEN 1<<j ELSE 0 END` summed over j): bit j is set iff strictly more
  * elements have bit j set than clear. A null ELEMENT — and likewise a
  * null ARRAY — nullifies every per-bit sum in the HOF form, making each
  * `> 0` test false, so the result collapses to 0 (never null); this
  * expression reproduces both exactly. */
case class SimHash(child: Expression, bits: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_simhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if bits >= 1 && bits <= 64 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint> and 1 <= bits <= 64, got " +
        s"${child.dataType.simpleString} with bits=$bits")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else SimHashUtil.compute(v.asInstanceOf[ArrayData], bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        long ${ev.value} = ${c.isNull} ? 0L :
          graft.functions.SimHashUtil.compute(${c.value}, $bits);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

object SimHashUtil {
  /** One pass over the hash array, all bit counters at once. */
  def compute(arr: ArrayData, bits: Int): Long = {
    val n = arr.numElements()
    val cnt = new Array[Int](bits)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return 0L // HOF-form semantics: null poisons all bitsums
      val h = arr.getLong(i)
      var j = 0
      while (j < bits) {
        cnt(j) += ((((h >>> j) & 1L) << 1) - 1L).toInt
        j += 1
      }
      i += 1
    }
    var r = 0L
    var j = 0
    while (j < bits) {
      if (cnt(j) > 0) r |= 1L << j
      j += 1
    }
    r
  }
}
