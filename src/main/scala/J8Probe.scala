import org.apache.spark.sql.functions._

/** j8 (exact vs loose isec) stage profile at the 100x replica: where do
  * the ~9 s go — the exact-side (orderkey,partkey) semi join, the
  * loose-side count-by-key + semi join, or just the two 60M-row scans?
  * The probe side (l_suppkey <= 50) is ~0.05% of rows at 100x (key
  * shifting keeps only copy-0 suppkeys small), so both joins should plan
  * broadcast. Also A/Bs a single-scan shared form: one pair-level
  * aggregate feeding both sides. Usage: runMain J8Probe /tmp/sf100 [reps]
  */
object J8Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf100")
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = graft.Spark.session("j8-probe")

    def li = graft.Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
    def probe = li.filter(col("l_suppkey") <= 50)

    def exactSide = li.join(probe.withColumnRenamed("l_suppkey", "ps"),
        Seq("l_orderkey", "l_partkey"), "left_semi")
      .agg(count(lit(1)).as("n")).select(lit("exact").as("mode"), col("n"))
    def looseSide = li.groupBy("l_orderkey").agg(count(lit(1)).as("cnt"))
      .join(probe.select("l_orderkey").distinct(), Seq("l_orderkey"), "left_semi")
      .agg(sum("cnt").as("n")).select(lit("loose").as("mode"), col("n"))

    def timed(name: String)(f: => Unit): Double = {
      graft.Bench.coldReset(spark)
      val t0 = System.nanoTime()
      f
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[j8probe] $name%-18s $t%7.2f s")
      t
    }
    def sink(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    li.agg(count(lit(1))).collect() // warm-up

    println("[j8probe] exact-side plan:")
    exactSide.queryExecution.executedPlan.toString.linesIterator.take(14)
      .foreach(l => println(s"[j8probe]   $l"))

    // broadcast variants: the probe side is a FIXED key range
    // (l_suppkey <= 50 -> ~rows-per-supplier x 50, scale-invariant), so
    // broadcasting its distinct join keys makes both sides map-only
    def exactB = li.join(
        broadcast(probe.select("l_orderkey", "l_partkey").distinct()),
        Seq("l_orderkey", "l_partkey"), "left_semi")
      .agg(count(lit(1)).as("n")).select(lit("exact").as("mode"), col("n"))
    def looseB = li.join(
        broadcast(probe.select("l_orderkey").distinct()),
        Seq("l_orderkey"), "left_semi")
      .agg(count(lit(1)).as("n")).select(lit("loose").as("mode"), col("n"))

    val a = exactSide.unionByName(looseSide).collect().map(_.toSeq).toSet
    val b = exactB.unionByName(looseB).collect().map(_.toSeq).toSet
    println(s"[j8probe] equal=${a == b} $a")
    require(a == b)

    for (rep <- 1 to reps) {
      println(s"[j8probe] --- rep $rep ---")
      timed("full_union") { sink(exactSide.unionByName(looseSide)) }
      timed("full_bcast") { sink(exactB.unionByName(looseB)) }
      timed("exact_only") { sink(exactSide) }
      timed("exact_bcast") { sink(exactB) }
      timed("loose_only") { sink(looseSide) }
      timed("loose_bcast") { sink(looseB) }
      timed("scan_2col") { sink(li.select("l_orderkey", "l_partkey")
        .agg(count(lit(1)).as("n"))) }
      timed("scan_3col") { sink(li.agg(count(lit(1)).as("n"))) }
      timed("probe_only") { sink(probe.agg(count(lit(1)).as("n"))) }
    }
    spark.stop()
  }
}
