import org.apache.spark.sql.functions._
import graft.operators.{OverlapSuppress, SuppressRecord}

/** W3 stage profile (round-13 verdict task 5): where do the ~30 s of
  * w3_overlap_suppress at the 100x replica actually go, and does the
  * segmented path earn its overhead when the chrom count already exceeds
  * the parallelism? Measures, cold per variant (Bench.coldReset between
  * runs):
  *   - segmented: the shipped suppressSegmented (persist + per-chrom
  *     stats + guard-window invalidation + anchor collect + automaton)
  *   - plain: one repartition(chrom) + sortWithinPartitions + automaton
  *   - stages of the segmented path, timed individually
  * Usage: runMain W3Probe /tmp/sf100 [reps]
  */
object W3Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf100")
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = graft.Spark.session("w3-probe")
    import spark.implicits._
    implicit val s: org.apache.spark.sql.SparkSession = spark

    def recs = graft.Tables.events(spark, d).select(
      col("user_id").cast("string").as("chrom"),
      (unix_micros(col("ts")) * 1000L + col("event_id") % 1000L).as("pos"),
      ((col("value").cast("long") % 10) * 200000000000L).as("delLen"),
      (col("value") > 250).as("called"),
      (col("value").cast("long") % 3 === 0).as("uncalledGt")).as[SuppressRecord]

    def timed(name: String)(f: => Unit): Double = {
      graft.Bench.coldReset(spark)
      val t0 = System.nanoTime()
      f
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[w3probe] $name%-22s $t%7.2f s")
      t
    }
    def sink(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm-up (JIT + parquet footers)
    sink(recs.toDF().limit(1000).toDF())
    recs.agg(count(lit(1))).collect()

    for (rep <- 1 to reps) {
      println(s"[w3probe] --- rep $rep ---")
      timed("segmented(shipped)") { sink(OverlapSuppress.suppressSegmented(recs).toDF()) }
      timed("plain") { sink(OverlapSuppress.suppress(recs).toDF()) }
      // segmented stages, separately (each cold): the persist+count,
      // the per-chrom stats agg, the invalidation join + anchor collect
      timed("stage:persist+count") {
        val c = recs.persist(); c.count(); c.unpersist()
      }
      timed("stage:stats_agg") {
        val qs = (1 until 64).map(_.toDouble / 64).toArray
        recs.groupBy(col("chrom"))
          .agg(percentile_approx(col("pos"), lit(qs), lit(1000)).as("arr"),
            max(greatest(col("delLen"), lit(1L))).as("mx"))
          .agg(count(lit(1)), max("mx")).collect()
      }
      timed("stage:anchors_collect") {
        val cached = recs.persist(); cached.count()
        val qs = (1 until 64).map(_.toDouble / 64).toArray
        val stats = cached.groupBy(col("chrom"))
          .agg(percentile_approx(col("pos"), lit(qs), lit(1000)).as("arr"),
            max(greatest(col("delLen"), lit(1L))).as("mx")).persist()
        val maxExtent = stats.agg(max(col("mx"))).head().getLong(0)
        val cand = stats.select(col("chrom"), explode(col("arr")).as("a")).distinct()
        val invalid = cached.join(broadcast(cand.withColumnRenamed("chrom", "c")),
            col("chrom") === col("c") &&
              col("pos") > col("a") - maxExtent && col("pos") < col("a"), "inner")
          .select(col("c").as("chrom"), col("a")).distinct()
        val anchors = cand.except(invalid).collect()
        println(s"[w3probe]   anchors=${anchors.length}")
        stats.unpersist(); cached.unpersist()
      }
    }
    val nChrom = recs.select(approx_count_distinct(col("chrom"))).head().getLong(0)
    println(s"[w3probe] approx distinct chroms = $nChrom, " +
      s"shuffle partitions = ${spark.conf.get("spark.sql.shuffle.partitions")}")
    spark.stop()
  }
}
