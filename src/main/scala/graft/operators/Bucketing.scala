package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers (SURVEY.md §4 "co-locate joins via bucketing").
  *
  * At 100 TB the dominant recurring cost is re-shuffling fact tables on the
  * same join key pipeline after pipeline. Writing both sides bucketed by
  * that key (hash-partitioned files + sorted buckets) lets every subsequent
  * equi-join and groupBy on the key plan WITHOUT an Exchange — verified
  * structurally in BucketingSpec.
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two tables bucketed on the same key: with matching bucket counts
    * Spark plans a SortMergeJoin with zero Exchange on either side. */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    key: String, joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key), joinType)
}
