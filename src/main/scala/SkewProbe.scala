import org.apache.spark.sql.functions._

/** AQE skew-join probe: fact-fact join on a replica where ~28% of lineitem
  * rows share ONE order key. Compares wall time with AQE skew split on/off
  * in one warmed session (config is runtime-settable for AQE).
  * Usage: runMain SkewProbe /tmp/sfskew */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sfskew")
    val spark = graft.Spark.session("skew-probe")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    def run(): Double = {
      val li = spark.read.parquet(s"$d/lineitem.parquet")
      val o = spark.read.parquet(s"$d/orders.parquet")
      val t0 = System.nanoTime()
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run() // warmup
    for (rep <- 1 to 2; skew <- Seq("false", "true")) {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew)
      val t = run()
      println(f"[skewprobe] rep=$rep skewJoin=$skew%-5s wall=$t%.1fs")
    }
    spark.stop()
  }
}
