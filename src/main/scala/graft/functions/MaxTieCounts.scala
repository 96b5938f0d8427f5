package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** "Rows tying the group maximum, counted per tag" as ONE partial-aggregable
  * aggregate — the skew-flat alternative to `max().over(window) ->
  * filter(v == max) -> count by tag`.
  *
  * The window form shuffles EVERY row of a group into a single task and
  * sorts it; a hot group key becomes one multi-million-row task no AQE
  * split can touch — window partitions are indivisible. This aggregate
  * carries only (current max, tag -> tie count) per group, so map-side
  * partial aggregation collapses a hot key inside each input task before
  * anything ships (the j8 count-before-join argument, applied to
  * group-max semantics).
  *
  * WHEN TO USE (r12, measured at the 100x replicas, interleaved A/B
  * against the window form on j2's lineitem shape): NOT when the group
  * key is near-unique — there the per-group buffers gain nothing from
  * combine and the kryo serialization + ObjectHashAggregate's sort-based
  * fallback (past spark.sql.objectHashAggregate.sortBased.fallbackThreshold
  * = 128 groups/partition) made this form 15.7-16.6 s vs the window's
  * 5.1-6.3 s at uniform, and only neutral (12.1-12.7 vs 10.4-11.5 s) on
  * the skew replica whose hot key the window already fans out over a
  * second column. It wins when groups are LARGE and duplicate-dominated
  * (dedup-shaped data: few distinct (value, tag) combos per group), where
  * map-side combine collapses the hot key to one buffer per task and the
  * window would sort millions of rows in one task. j2 therefore ships the
  * window form; this stays as the library operator for the other regime.
  *
  * Buffer transitions are order-independent: a strictly larger value
  * resets the counts, an equal value increments its tag, a smaller one is
  * ignored; merge keeps the larger max or sums counts on a tie. So any
  * partitioning/merge order yields the same result — replayable as plain
  * groupBy-max + equi-join SQL.
  *
  * Contract: null-free inputs (the query layer's tables guarantee both
  * columns; doubles compare exactly, so ties are well-defined on
  * parquet-roundtripped values). Doubles order by Double.compare's total
  * order (NaN above +Infinity — deterministic under any partitioning,
  * spec-pinned) with -0.0 collapsed to 0.0 on entry for SQL `=` parity;
  * note a SQL oracle's `MAX` puts NaN above +Inf too (both engines), so
  * the replay stays exact even on NaN-bearing columns. */
class MaxTieCounts
    extends Aggregator[(Double, String), MaxTieBuf, Map[String, Long]] {

  override def zero: MaxTieBuf = new MaxTieBuf(0.0, mutable.HashMap.empty)

  // java.lang.Double.compare, not the IEEE operators: under > and ==, a
  // NaN value fails BOTH branches, so a NaN-seeded buffer silently drops
  // every later real maximum while a NaN arriving later is ignored — the
  // result would depend on which partition saw the NaN first, breaking
  // the order-invariance contract. compare's total order (NaN above
  // +Infinity, consistently on update and merge) keeps any partitioning
  // deterministic: NaN-bearing groups report their NaN tie counts.
  override def reduce(b: MaxTieBuf, a: (Double, String)): MaxTieBuf = {
    // collapse -0.0 to 0.0 first: Double.compare orders -0.0 BELOW 0.0,
    // but SQL's = treats them equal — a mixed-zero group must tie
    val v = if (a._1 == 0.0) 0.0 else a._1
    val tag = a._2
    val cmp = if (b.counts.isEmpty) 1 else java.lang.Double.compare(v, b.m)
    if (cmp > 0) {
      b.m = v
      b.counts.clear()
      b.counts(tag) = 1L
    } else if (cmp == 0) {
      b.counts(tag) = b.counts.getOrElse(tag, 0L) + 1L
    }
    b
  }

  override def merge(x: MaxTieBuf, y: MaxTieBuf): MaxTieBuf = {
    if (x.counts.isEmpty) y
    else if (y.counts.isEmpty) x
    else {
      val cmp = java.lang.Double.compare(y.m, x.m)
      if (cmp > 0) y
      else if (cmp < 0) x
      else {
        y.counts.foreach { case (t, c) =>
          x.counts(t) = x.counts.getOrElse(t, 0L) + c
        }
        x
      }
    }
  }

  override def finish(b: MaxTieBuf): Map[String, Long] = b.counts.toMap

  override def bufferEncoder: Encoder[MaxTieBuf] = Encoders.kryo[MaxTieBuf]
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}

/** Mutable (max, tag -> tie count) buffer for [[MaxTieCounts]]; empty
  * counts == uninitialized (no sentinel needed for any double domain). */
final class MaxTieBuf(var m: Double,
    val counts: mutable.HashMap[String, Long]) extends Serializable
