package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loaders for the driver-provided TPC-H-ish test tables (see TESTDATA.md).
  *
  * All queries in [[SparkEntry]] take an `sfDir` (e.g. `/root/testdata/sf0.01`)
  * and read one parquet file per table. At cluster scale these would be
  * partitioned directories; the read path is identical.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  /** events.parquet stores `ts` as parquet TIMESTAMP(NANOS), which Spark
    * reads only as a long (spark.sql.legacy.parquet.nanosAsLong=true, set in
    * [[Spark.session]]); convert to a microsecond TimestampType here so all
    * queries see a real timestamp.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      // integer `div`, NOT `/`: long/long in Spark is DOUBLE division, and
      // at ~1.7e18 ns a double's ulp is 256 — rounding there shifts some
      // rows by a whole microsecond vs DuckDB's exact epoch_us truncation
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // parquet written without a timezone flag (e.g. DuckDB replicas)
      // arrives as TIMESTAMP_NTZ, which unix_micros rejects; session TZ is
      // UTC so the cast is a pure type change, not a wall-clock shift
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _                => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
