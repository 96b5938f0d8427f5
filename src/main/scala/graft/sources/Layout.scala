package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Locus-keyed storage layout for genomic fact tables at scale.
  *
  * A 100 TB variant/coverage store is read almost exclusively by
  * (chrom, pos-range) predicates (every reference pipeline stage operates
  * per-region: compress_gvcf.py processes chromosome slices,
  * convert_haploid_regions.py restricts to region lists). The layout that
  * makes those reads cheap is:
  *
  *  - **partition directories on `chrom`** → a chrom predicate prunes at
  *    the FILE INDEX level (directories never listed, `PartitionFilters`
  *    in the scan, zero IO for other chromosomes);
  *  - **rows sorted by `pos` within each file** → a pos-range predicate
  *    prunes at the PARQUET ROW-GROUP level (min/max statistics skip
  *    whole row groups; `PushedFilters` in the scan);
  *  - **`shardsPerChrom` files per chromosome** so a single hot
  *    chromosome still parallelizes across the cluster (sharding by
  *    range keeps each file a contiguous pos slice — a range read
  *    touches only the overlapping shards).
  *
  * This is the write-once step that turns every downstream region
  * restriction (P6/J9 and every per-chrom automaton) from a full scan
  * into a targeted read.
  */
object Layout {

  /** Write `df` as a chrom-partitioned, pos-sorted, range-sharded parquet
    * layout under `path`. `totalShards` sizes the range shuffle: shards
    * split on (chrom, pos) boundaries, so chromosomes get file counts
    * proportional to their row share (a hot chromosome parallelizes) and
    * each file covers a contiguous pos slice (a range read touches only
    * overlapping shards). At cluster scale set it from data volume
    * (bytes / target file size), like Curation.packShardCounts. */
  def writeLocusLayout(df: DataFrame, path: String,
                       chrom: String = "chrom", pos: String = "pos",
                       totalShards: Int = 32): Unit =
    df.repartitionByRange(totalShards, col(chrom), col(pos))
      .sortWithinPartitions(col(chrom), col(pos))
      .write.partitionBy(chrom).mode("overwrite").parquet(path)

  /** Targeted region read over a [[writeLocusLayout]] store: the chrom
    * equality prunes partition directories, the half-open pos range rides
    * parquet row-group statistics. */
  def readRegion(spark: SparkSession, path: String,
                 chromVal: String, start: Long, end: Long,
                 chrom: String = "chrom", pos: String = "pos"): DataFrame =
    spark.read.parquet(path)
      .filter(col(chrom) === chromVal && col(pos) >= start && col(pos) < end)
}
