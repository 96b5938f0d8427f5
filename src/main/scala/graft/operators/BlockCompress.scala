package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}

/** Input record for gVCF-style block compression: one row per reference
  * position run, sorted by (chrom, pos). */
case class GvcfRecord(chrom: String, pos: Long, end: Long, gq: Int, dp: Int,
                      pl: Seq[Int], pass: Boolean)

/** A compressed block: first pos, last end, min gq/dp, elementwise-min PL. */
case class GvcfBlock(chrom: String, pos: Long, end: Long, minGq: Int,
                     minDp: Int, pl: Seq[Int], nRecords: Long)

/** W2 — gVCF GQ-band block compression
  * (reference: ugvc/joint/compress_gvcf.py:81-216; break conditions at
  * :153-158, merge state at :192-212).
  *
  * The break condition references the running min/max GQ of the *open
  * block* — `max(gqs ∪ {next.gq}) - min(gqs ∪ {next.gq}) >= threshold` —
  * which `lag` cannot express (the state is an aggregate over a dynamic
  * extent). SURVEY.md §7.4 risk 1. So this is the one operator implemented
  * as an explicit automaton over sorted partitions:
  *
  *   repartition by chrom  →  sortWithinPartitions(chrom, pos)  →
  *   mapPartitions(linear scan, O(1) state per open block)
  *
  * Each chromosome lands in one partition, records stream through in
  * position order, and the automaton carries (minGq, maxGq, minDp,
  * elementwise-min PL). At genome scale this is a single range shuffle and
  * then a pure streaming pass — the same cost shape as the reference's
  * per-contig processes, minus the per-contig files.
  */
object BlockCompress {

  /** `refcallGqThreshold` is the reference's low/high RefCall band edge
    * (defaults 22, compress_gvcf.py:68-77): records on opposite sides of
    * it never merge, independent of the running min/max band width. */
  def compress(ds: Dataset[GvcfRecord], mergeGqThreshold: Int,
               refcallGqThreshold: Int = 22)
              (implicit spark: SparkSession): Dataset[GvcfBlock] = {
    import spark.implicits._
    ds.repartition(ds.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt, $"chrom")
      .sortWithinPartitions($"chrom", $"pos")
      .mapPartitions(iter => new BlockIterator(iter, mergeGqThreshold, refcallGqThreshold))
  }

  /** Streaming automaton. PASS records always break and emit as their own
    * 1-record block (they must survive verbatim). */
  private final class BlockIterator(in: Iterator[GvcfRecord], thr: Int,
                                    refcallThr: Int)
      extends Iterator[GvcfBlock] {
    private var open: GvcfBlock = null
    private var minGq = 0
    private var maxGq = 0
    private val pending = scala.collection.mutable.Queue.empty[GvcfBlock]

    private def startBlock(r: GvcfRecord): Unit = {
      open = GvcfBlock(r.chrom, r.pos, r.end, r.gq, r.dp, r.pl, 1L)
      minGq = r.gq; maxGq = r.gq
    }

    private def mergeable(r: GvcfRecord): Boolean =
      open != null && !r.pass && r.chrom == open.chrom &&
        (r.gq < refcallThr) == (minGq < refcallThr) &&
        math.max(maxGq, r.gq) - math.min(minGq, r.gq) < thr

    private def absorb(r: GvcfRecord): Unit = {
      minGq = math.min(minGq, r.gq); maxGq = math.max(maxGq, r.gq)
      open = GvcfBlock(open.chrom, open.pos, math.max(open.end, r.end),
        math.min(open.minGq, r.gq), math.min(open.minDp, r.dp),
        open.pl.zipAll(r.pl, Int.MaxValue, Int.MaxValue)
          .map { case (x, y) => math.min(x, y) },
        open.nRecords + 1)
    }

    private def advance(): Unit = {
      while (pending.isEmpty && in.hasNext) {
        val r = in.next()
        if (r.pass) {
          if (open != null) { pending.enqueue(open); open = null }
          pending.enqueue(GvcfBlock(r.chrom, r.pos, r.end, r.gq, r.dp, r.pl, 1L))
        } else if (mergeable(r)) absorb(r)
        else {
          if (open != null) pending.enqueue(open)
          startBlock(r)
        }
      }
      if (pending.isEmpty && open != null) { pending.enqueue(open); open = null }
    }

    override def hasNext: Boolean = { advance(); pending.nonEmpty }
    override def next(): GvcfBlock = { advance(); pending.dequeue() }
  }
}
