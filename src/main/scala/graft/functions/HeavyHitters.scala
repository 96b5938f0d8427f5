package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** Mergeable Misra-Gries heavy-hitters sketch as a typed [[Aggregator]].
  *
  * The 100 TB shape of "which tokens are frequent per stratum": an exact
  * `groupBy(token)` shuffles EVERY distinct token (billions of keys); this
  * sketch holds at most `k` counters per group, aggregates partially
  * map-side like any hash aggregate (ObjectHashAggregate keeps the buffer
  * as a live object; kryo only at the shuffle boundary), and its merge is
  * the counter-sum + (k+1)-th-largest subtraction of Agarwal et al.'s
  * mergeable-summaries result.
  *
  * Guarantee (any partitioning, any merge order): every counter
  * underestimates its item's true count by at most N/(k+1), where N is
  * the group's total stream length. So any item with true count
  * > N/(k+1) retains a positive counter — the key set is a DETERMINISTIC
  * SUPERSET of the items above that frequency. A second exact pass over
  * just these candidates (broadcast semi-join + count) then yields the
  * exactly-correct frequent-item set: two-pass heavy hitters whose final
  * output is engine-reproducible even though intermediate counter values
  * are partitioning-dependent.
  */
class MisraGries(k: Int)
    extends Aggregator[String, mutable.HashMap[String, Long], Map[String, Long]] {

  override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  override def reduce(b: mutable.HashMap[String, Long], a: String): mutable.HashMap[String, Long] = {
    b.get(a) match {
      case Some(c) => b(a) = c + 1L
      case None if b.size < k => b(a) = 1L
      case None =>
        // classic MG step: a full sketch meeting a new item decrements
        // every counter (the new item is absorbed into the error budget).
        // In-place map/filter rather than mutation-during-keysIterator:
        // value writes happen to be safe on today's HashMap, but mutating
        // while iterating is contract-undefined.
        b.mapValuesInPlace((_, c) => c - 1L)
        b.filterInPlace((_, c) => c > 0L)
    }
    b
  }

  override def merge(x: mutable.HashMap[String, Long],
                     y: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    y.foreach { case (t, c) => x(t) = x.getOrElse(t, 0L) + c }
    if (x.size > k) {
      // subtract the (k+1)-th largest counter from all; strictly larger
      // counters survive — restores the k-counter bound with total added
      // error <= the subtracted value per item (mergeable-MG analysis)
      val pivot = x.values.toArray.sortInPlace()(Ordering[Long].reverse)(k)
      x.mapValuesInPlace((_, c) => c - pivot)
      x.filterInPlace((_, c) => c > 0L)
    }
    x
  }

  override def finish(b: mutable.HashMap[String, Long]): Map[String, Long] = b.toMap

  override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
