package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** BED interval reader/writer (SURVEY.md §2.1 S4/S11;
  * parse_intervals_file / BedWriter [absent; inferred — call sites
  * ugvc/pipelines/coverage_analysis.py:860-899, ugvc/joint/gvcf_bed.py:30-68]).
  * Half-open `[start, end)` coordinates, tab-separated, optional extra
  * value columns preserved as strings. */
object Bed {

  val schema: StructType = StructType(Seq(
    StructField("chrom", StringType),
    StructField("start", LongType),
    StructField("end", LongType),
    StructField("name", StringType),
    StructField("score", StringType)))

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("sep", "\t").option("comment", "#")
      .schema(schema)
      .csv(path)
      // tolerate 3-column BED: trailing nulls are fine, coordinates must exist
      .filter(col("chrom").isNotNull && col("start").isNotNull && col("end").isNotNull)

  val intervalListSchema: StructType = StructType(Seq(
    StructField("chrom", StringType),
    StructField("start", LongType),
    StructField("end", LongType),
    StructField("strand", StringType),
    StructField("name", StringType)))

  /** Native Picard `.interval_list` reader — the reference reaches these
    * inputs by shelling out to `picard IntervalListToBed` first
    * (ugvc/pipelines/coverage_analysis.py:860-899); this removes that
    * external conversion step. SAM-style `@`-prefixed headers (@HD, @SQ)
    * are skipped; data lines are 1-based CLOSED
    * `chrom<TAB>start<TAB>end<TAB>strand<TAB>name`, converted here to
    * BED's 0-based half-open [start, end) so the frame is
    * coordinate-compatible with [[read]] and the Intervals operators. */
  def readIntervalList(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("sep", "\t").option("comment", "@")
      .schema(intervalListSchema)
      .csv(path)
      .filter(col("chrom").isNotNull && col("start").isNotNull && col("end").isNotNull)
      .withColumn("start", col("start") - 1)

  def write(df: DataFrame, path: String): Unit =
    df.select("chrom", "start", "end")
      .repartitionByRange(col("chrom"), col("start"))
      .sortWithinPartitions("chrom", "start")
      .write.mode("overwrite").option("sep", "\t").csv(path)
}
