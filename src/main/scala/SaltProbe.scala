import org.apache.spark.sql.functions._

/** Salted-join probe: quantifies what `SkewJoin.saltedJoin` buys on an
  * inherently hot key. The fact table joins a tiny per-key dim on
  * `l_returnflag` (3 distinct values), broadcast disabled — the scenario
  * where a plain shuffle join can use at most 3 reducers regardless of
  * cluster size, while the salted form fans each key over `parts`
  * reducers. Compares wall time unsalted vs salted in one warmed session.
  * Usage: runMain SaltProbe /tmp/sfbig [parts]
  */
object SaltProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sfbig")
    val parts = if (args.length > 1) args(1).toInt else 8
    val spark = graft.Spark.session("salt-probe")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val li = spark.read.parquet(s"$d/lineitem.parquet")
      .select("l_returnflag", "l_quantity")
    val dim = spark.read.parquet(s"$d/lineitem.parquet")
      .groupBy("l_returnflag").agg(min("l_partkey").as("flag_min_part"))

    def sink(df: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.groupBy("l_returnflag", "flag_min_part")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def plain() = sink(li.hint("shuffle_hash").join(dim, Seq("l_returnflag")))
    def salted() = sink(
      graft.operators.SkewJoin.saltedJoin(li, dim, "l_returnflag", parts, shuffle = true))

    plain(); salted() // warm both paths
    for (rep <- 1 to 2) {
      val tp = plain()
      val ts = salted()
      println(f"[saltprobe] rep=$rep plain=$tp%.1fs salted($parts)=$ts%.1fs speedup=${tp / ts}%.2fx")
    }
    spark.stop()
  }
}
