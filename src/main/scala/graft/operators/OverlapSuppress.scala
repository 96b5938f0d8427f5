package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}

/** Input for W3: a gVCF record with its genotype-called flag and the
  * deletion span it may cast over downstream records (0 for non-deletions). */
case class SuppressRecord(chrom: String, pos: Long, delLen: Long,
                          called: Boolean, uncalledGt: Boolean)

/** W3 — overlap-buffer suppression (reference:
  * ugvc/joint/cleanup_gvcf_before_calling.py:31-86, buffer logic 43-75):
  * while scanning position-sorted records, an upstream deletion spans
  * `pos + delLen`; all records starting inside that span are buffered, and
  * when the overlap group closes, records with uncalled `(None,None)`
  * genotypes are dropped IF any record in the group is a called variant.
  *
  * Like W2 this depends on running group state (the max extent AND the
  * any-called flag of the open group), so it is a sorted-partition
  * automaton: repartition by chrom → sortWithinPartitions → mapPartitions.
  */
object OverlapSuppress {

  def suppress(ds: Dataset[SuppressRecord])
              (implicit spark: SparkSession): Dataset[SuppressRecord] = {
    import spark.implicits._
    ds.repartition(ds.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt, $"chrom")
      .sortWithinPartitions($"chrom", $"pos")
      .mapPartitions(iter => new SuppressIterator(iter))
  }

  private final class SuppressIterator(in: Iterator[SuppressRecord])
      extends Iterator[SuppressRecord] {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[SuppressRecord]
    private var extent = Long.MinValue
    private var chrom: String = null
    private val out = scala.collection.mutable.Queue.empty[SuppressRecord]

    private def flush(): Unit = {
      val anyCalled = buf.exists(_.called)
      buf.foreach { r =>
        if (!(anyCalled && r.uncalledGt)) out.enqueue(r)
      }
      buf.clear()
    }

    private def advance(): Unit = {
      while (out.isEmpty && in.hasNext) {
        val r = in.next()
        if (chrom != r.chrom || r.pos >= extent) {
          flush()
          chrom = r.chrom
          extent = Long.MinValue
        }
        buf += r
        extent = math.max(extent, r.pos + math.max(r.delLen, 1))
      }
      if (out.isEmpty && !in.hasNext) flush()
    }

    override def hasNext: Boolean = { advance(); out.nonEmpty }
    override def next(): SuppressRecord = { advance(); out.dequeue() }
  }
}
