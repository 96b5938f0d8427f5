import org.apache.spark.sql.functions._

/** u2 (INTERSECT) shape A/B at the 100x replica: Catalyst rewrites
  * INTERSECT to Distinct(LeftSemi(a,b)) — the 60M-row fact side rides the
  * join exchange BEFORE deduping. distinct-first collapses it map-side
  * (partial aggregate) so only ~distinct keys reach any exchange;
  * distinct(a) semi b == distinct(a semi b) (no nulls in these keys).
  * Usage: runMain U2Probe /tmp/sf100 [reps] */
object U2Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf100")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.Spark.session("u2-probe")

    def a = graft.Tables.lineitem(spark, d).select(col("l_partkey").as("k"))
    def b = graft.Tables.part(spark, d).filter(col("p_size") > 25)
      .select(col("p_partkey").as("k"))

    def timed(name: String)(f: => Unit): Unit = {
      graft.Bench.coldReset(spark)
      val t0 = System.nanoTime()
      f
      println(f"[u2probe] $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    def sink(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    a.agg(count(lit(1))).collect() // warm-up
    val n1 = a.intersect(b).count()
    val n2 = a.distinct().join(b, Seq("k"), "left_semi").count()
    assert(n1 == n2, s"shape divergence: intersect=$n1 distinct-semi=$n2")

    for (rep <- 1 to reps) {
      println(s"[u2probe] --- rep $rep ---")
      timed("intersect(shipped)") { sink(a.intersect(b)) }
      timed("distinct-then-semi") { sink(a.distinct().join(b, Seq("k"), "left_semi")) }
    }
    spark.stop()
  }
}
