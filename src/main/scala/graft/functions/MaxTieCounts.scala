package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** "Rows tying the group maximum, counted per tag" as ONE partial-aggregable
  * aggregate — the skew-flat form of `max().over(window) -> filter(v == max)
  * -> count by tag`.
  *
  * The window form shuffles EVERY row of a group into a single task and
  * sorts it; a hot group key (the skew replica's one order key carrying 30%
  * of lineitem) becomes one multi-million-row task no AQE split can touch —
  * window partitions are indivisible. This aggregate carries only
  * (current max, tag -> tie count) per group, so map-side partial
  * aggregation collapses a hot key inside each input task before anything
  * ships: the shuffle sees one tiny buffer per (task, group), hash-
  * aggregated — no sort, no indivisible giant partition (the j8
  * count-before-join argument, applied to group-max semantics).
  *
  * Buffer transitions are order-independent: a strictly larger value
  * resets the counts, an equal value increments its tag, a smaller one is
  * ignored; merge keeps the larger max or sums counts on a tie. So any
  * partitioning/merge order yields the same result — the oracle replays
  * it as the plain groupBy-max + equi-join SQL.
  *
  * Contract: null-free inputs (the query layer's tables guarantee both
  * columns; doubles compare exactly, so `==` ties are well-defined on
  * parquet-roundtripped values). */
class MaxTieCounts
    extends Aggregator[(Double, String), MaxTieBuf, Map[String, Long]] {

  override def zero: MaxTieBuf = new MaxTieBuf(0.0, mutable.HashMap.empty)

  override def reduce(b: MaxTieBuf, a: (Double, String)): MaxTieBuf = {
    val (v, tag) = a
    if (b.counts.isEmpty || v > b.m) {
      b.m = v
      b.counts.clear()
      b.counts(tag) = 1L
    } else if (v == b.m) {
      b.counts(tag) = b.counts.getOrElse(tag, 0L) + 1L
    }
    b
  }

  override def merge(x: MaxTieBuf, y: MaxTieBuf): MaxTieBuf = {
    if (x.counts.isEmpty) y
    else if (y.counts.isEmpty) x
    else if (y.m > x.m) y
    else if (x.m > y.m) x
    else {
      y.counts.foreach { case (t, c) =>
        x.counts(t) = x.counts.getOrElse(t, 0L) + c
      }
      x
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
