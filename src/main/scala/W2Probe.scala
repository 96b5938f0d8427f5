import org.apache.spark.sql.functions._
import graft.operators.{BlockCompress, GvcfRecord}

/** W2 shape A/B at the 100x replica (round 13, mirror of W3Probe): the
  * events-derived record stream has one chrom per user_id (~150k at 100x),
  * so compressSegmented's anchor machinery (per-chrom solo sampling at
  * rate 1 -> a driver collect of every solo record) buys nothing over
  * plain hash partitioning. Measures, cold per variant:
  *   - segmented(shipped r12): the pre-hot-filter segmented path shape
  *     is gone; this probe measures the CURRENT segmented (hot-filtered),
  *     plain, and auto forms
  * Usage: runMain W2Probe /tmp/sf100 [reps]
  */
object W2Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf100")
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = graft.Spark.session("w2-probe")
    import spark.implicits._
    implicit val s: org.apache.spark.sql.SparkSession = spark

    def recs = {
      val pos = unix_micros(col("ts")) * 1000L + col("event_id") % 1000L
      graft.Tables.events(spark, d).select(
        col("user_id").cast("string").as("chrom"),
        pos.as("pos"),
        (pos + 1L).as("end"),
        (col("value").cast("long") % 60).cast("int").as("gq"),
        lit(30).as("dp"),
        array(lit(0), lit(10), lit(100)).as("pl"),
        (col("value") > 450).as("pass"),
        (col("value") < 50).as("isRefCall")).as[GvcfRecord]
    }

    def timed(name: String)(f: => Unit): Double = {
      graft.Bench.coldReset(spark)
      val t0 = System.nanoTime()
      f
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[w2probe] $name%-22s $t%7.2f s")
      t
    }
    def sink(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm-up (JIT + parquet footers)
    recs.agg(count(lit(1))).collect()

    for (rep <- 1 to reps) {
      println(s"[w2probe] --- rep $rep ---")
      timed("plain") { sink(BlockCompress.compress(recs, 10).toDF()) }
      timed("segmented(hotfilter)") { sink(BlockCompress.compressSegmented(recs, 10).toDF()) }
      timed("auto") { sink(BlockCompress.compressAuto(recs, 10).toDF()) }
    }
    spark.stop()
  }
}
