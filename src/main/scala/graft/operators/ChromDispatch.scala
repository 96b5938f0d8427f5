package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared regime-dispatch arithmetic for the per-chromosome automata
  * (BlockCompress, OverlapSuppress). The auto forms and the segmented
  * forms' candidate filters must agree on what "hot" means — a drifted
  * copy of the threshold would let auto choose the segmented path while
  * segmented finds no hot chroms and silently falls back (r13 review). */
private[operators] object ChromDispatch {

  /** A chrom is hot when hash placement cannot level it on its own: its
    * row count exceeds half a balanced partition's share. At most
    * ~2×parts chroms can qualify, so collects over the hot set are
    * bounded. */
  def hotMin(total: Long, parts: Int): Long = math.max(1L, total / parts / 2)

  /** The hot chroms of `df` from ONE per-chrom count pass (the tiny
    * counts frame is persisted for its two consumers — the global
    * total/max aggregate and the hot-row collect — then dropped).
    * Empty result = plain hash partitioning suffices, or empty input. */
  def hotChroms(df: DataFrame, parts: Int): Array[String] = {
    val counts = df.groupBy(col("chrom")).count()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val row = counts.agg(sum(col("count")).as("t"), max(col("count")).as("m")).head()
      if (row.isNullAt(0)) Array.empty
      else {
        val hm = hotMin(row.getLong(0), parts)
        if (row.getLong(1) <= hm) Array.empty
        else counts.filter(col("count") > hm).select("chrom")
          .collect().map(_.getString(0))
      }
    } finally counts.unpersist(false)
  }
}
