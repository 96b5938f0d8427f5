package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded worst-at-root binary heap over (sim, id) pairs — the partial
  * buffer for [[TopKBySim]]. Primitive arrays (no boxing on the hot
  * `offer` path); kryo touches it only at the shuffle boundary.
  * "Worse" = lower sim, then higher id — the exact inverse of the rank
  * order `(sim DESC, id ASC)`, so the root is always the next eviction. */
final class TopKBuf(val k: Int) extends Serializable {
  require(k > 0, s"TopKBuf requires k > 0, got $k")
  val sims = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c < 0 || (c == 0 && i1 > i2)
  }
  @inline private def swap(i: Int, j: Int): Unit = {
    val s = sims(i); sims(i) = sims(j); sims(j) = s
    val d = ids(i); ids(i) = ids(j); ids(j) = d
  }

  def offer(s: Double, id: Long): Unit = {
    if (size < k) { // grow: insert at the end, sift up
      var i = size; sims(i) = s; ids(i) = id; size += 1
      var done = false
      while (!done && i > 0) {
        val p = (i - 1) >> 1
        if (worse(sims(i), ids(i), sims(p), ids(p))) { swap(i, p); i = p }
        else done = true
      }
    } else if (worse(sims(0), ids(0), s, id)) { // beats the worst: replace root, sift down
      sims(0) = s; ids(0) = id
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = l + 1
        var w = i
        if (l < size && worse(sims(l), ids(l), sims(w), ids(w))) w = l
        if (r < size && worse(sims(r), ids(r), sims(w), ids(w))) w = r
        if (w == i) done = true else { swap(i, w); i = w }
      }
    }
  }
}

/** Map-side-partial top-k by `(sim DESC, id ASC)` as a typed
  * [[Aggregator]].
  *
  * The 100 TB shape of "top-k neighbors per query": a
  * `row_number() OVER (PARTITION BY qid ...)` window ships EVERY scored
  * candidate through an exchange whose parallelism is the QUERY count —
  * for a fixed 32-query batch over N vectors that is an N×32-row shuffle
  * sorted in 32 tasks, and it only gets worse as the collection grows.
  * This aggregate keeps a k-slot bounded heap per (partition, qid) in the
  * hash-aggregate buffer (ObjectHashAggregate holds it as a live object),
  * so the exchange carries `partitions × queries` k-entry buffers —
  * independent of N — and the merge is heap-into-heap. Ties resolve by id
  * ASC, identical to the window's deterministic ORDER BY, so the output
  * is bit-identical to the window form it replaces. NaN never reaches the
  * comparator in the ANN queries (zero-norm vectors are excluded at
  * ingest); `Double.compare` totalizes it anyway (NaN sorts worst). */
class TopKBySim(k: Int)
    extends Aggregator[(Double, Long), TopKBuf, Seq[(Double, Long)]] {

  override def zero: TopKBuf = new TopKBuf(k)

  override def reduce(b: TopKBuf, a: (Double, Long)): TopKBuf = {
    b.offer(a._1, a._2); b
  }

  override def merge(x: TopKBuf, y: TopKBuf): TopKBuf = {
    var i = 0
    while (i < y.size) { x.offer(y.sims(i), y.ids(i)); i += 1 }
    x
  }

  /** Best-first: rank r (1-based) = element r-1 of the result. */
  override def finish(b: TopKBuf): Seq[(Double, Long)] = {
    val out = (0 until b.size).map(i => (b.sims(i), b.ids(i))).toArray
    scala.util.Sorting.stableSort(out,
      (a: (Double, Long), c: (Double, Long)) => {
        val cmp = java.lang.Double.compare(c._1, a._1)
        cmp < 0 || (cmp == 0 && a._2 < c._2)
      })
    out.toSeq
  }

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.kryo[TopKBuf]
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
