import org.apache.spark.sql.functions._

/** W7 stage profile + A/B (round-13 verdict task 6): the two-phase rank is
  * three passes over lineitem — (1) approxQuantile for deterministic range
  * bounds, (2) per-(group,bucket) counts, (3) the tagged rank pass. Which
  * pass costs what at the 100x replica, and does replacing the quantile
  * sketch with min/max + uniform-width buckets (exactness unaffected:
  * bucket boundaries only steer BALANCE, ranks come from exact counts)
  * pay? Usage: runMain W7Probe /tmp/sf100 [reps]
  */
object W7Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf100")
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = graft.Spark.session("w7-probe")

    def li = graft.Tables.lineitem(spark, d)
      .select("l_returnflag", "l_orderkey", "l_linenumber")
    def timed(name: String)(f: => Unit): Double = {
      graft.Bench.coldReset(spark)
      val t0 = System.nanoTime()
      f
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[w7probe] $name%-26s $t%7.2f s")
      t
    }
    def sink(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    li.agg(count(lit(1))).collect() // warm-up

    for (rep <- 1 to reps) {
      println(s"[w7probe] --- rep $rep ---")
      timed("shipped(everyKthScalable)") {
        sink(graft.operators.Ordered.everyKthScalable(
          li, "l_returnflag", Seq("l_orderkey", "l_linenumber"), 100))
      }
      timed("stage:approxQuantile") {
        val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
        li.stat.approxQuantile("l_orderkey",
          (1 until n).map(_.toDouble / n).toArray, 0.001)
      }
      timed("stage:minmax") {
        li.agg(min("l_orderkey"), max("l_orderkey")).collect()
      }
      timed("stage:counts") {
        val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
        val probs = (1 until n).map(_.toDouble / n).toArray
        val bounds = li.stat.approxQuantile("l_orderkey", probs, 0.001)
          .map(math.floor(_)).distinct.sorted
        val tagged = li.withColumn("_b",
          graft.functions.BucketBinUtil.bucketCol(col("l_orderkey").cast("double"), bounds))
        tagged.groupBy(col("l_returnflag").cast("string").as("_g"), col("_b"))
          .count().collect()
      }
      timed("alt:uniform-bounds") {
        sink(graft.operators.Ordered.everyKthScalableUniform(
          li, "l_returnflag", Seq("l_orderkey", "l_linenumber"), 100))
      }
      timed("alt:plain-window") {
        sink(graft.operators.Ordered.everyKth(
          li, "l_returnflag", Seq("l_orderkey", "l_linenumber"), 100))
      }
      // round 14: packed-key selection — the shuffle carries (cell, long),
      // per-cell ranking is a primitive sort + direct k-th emission.
      // round 18 (VERDICT r17 #7): A/B the cell sizing (buckets/partition)
      // with row-identity asserted against the shipped default every rep.
      var ref: Seq[Any] = null
      for (bpp <- Seq(2, 4, 8, 16)) {
        graft.Bench.coldReset(spark)
        val t0 = System.nanoTime()
        val out = graft.operators.Ordered.everyKthPacked(li, "l_returnflag",
            col("l_orderkey") * 8 + col("l_linenumber"), 100,
            bucketsPerPart = bpp)
        val sums = out.agg(count(lit(1)), sum(col("p")),
          sum(hash(col("g"), col("p")).cast("long"))).collect()(0).toSeq
        println(f"[w7probe] packed bpp=$bpp%-3d ${(System.nanoTime() - t0) / 1e9}%7.2f s  sums=$sums")
        if (ref == null) ref = sums
        else assert(ref == sums, s"bpp=$bpp diverged: $ref vs $sums")
      }
    }
    spark.stop()
  }
}
