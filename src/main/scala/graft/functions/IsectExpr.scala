package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native intersection size of two SORTED, DISTINCT long arrays — a linear
  * two-pointer merge over primitive long[], inside whole-stage codegen.
  *
  * d4's Jaccard verify evaluates `size(array_intersect(a, b))` once per
  * LSH candidate pair — ~22 M interpreted evaluations each allocating a
  * hash set at the 100× replica. Sorting each doc's shingle set ONCE at
  * build time (each doc participates in many pairs) and merging here
  * drops the per-pair cost to ~60 long compares with zero allocation.
  * Interleaved A/B at that replica: NEUTRAL (49.7/51.5 s native vs
  * 49.0 s hash-set) — the synthetic docs are ~28 shingles and the 22 M
  * pair-row join shuffle dominates either way. Kept because the per-pair
  * eval scales with DOC LENGTH: real corpora run 100-10000 shingles per
  * doc, where an O(n) alloc-free merge vs a hash set per pair is the
  * difference that shows. (Same honest-neutral precedent as
  * [[TokenHashes]].)
  *
  * Bit-identical to `size(array_intersect(a, b))` on sorted distinct
  * inputs: both count the common distinct values. Null array → null
  * (matching array_intersect's null propagation). Inputs MUST be
  * distinct and ascending — [[Text.sortedShingleSet]] is the builder. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_isect"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<bigint>, got ${l.simpleString}, ${r.simpleString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    IsectUtil.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.IsectUtil.count($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object IsectUtil {
  /** Two-pointer merge count; arrays must be ascending and distinct. */
  def count(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}
