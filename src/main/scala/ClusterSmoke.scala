/** Repeatable cross-JVM co-location smoke (VERDICT r15 #4): replay the two
  * operators whose correctness rests on partition co-location contracts —
  * the d-family band MapGroups automaton (x21) and everyKthPacked's manual
  * exchange + fill assertion (w7) — on a REAL 2-executor standalone
  * cluster, and compare their exact COUNTS against the DuckDB-arbitrated
  * references. No timings on purpose: cluster walls are not comparable
  * across runs; the counts are the contract. Exits nonzero on any
  * mismatch so `tools/cluster_smoke.sh` can gate a round's final
  * artifacts whenever the automaton code changed.
  *
  * Usage: runMain ClusterSmoke [sfDir] [expectedX21] [expectedW7]
  *   defaults: /tmp/sf100 22574543 600000 (the r15 ClusterProbe replays,
  *   both independently DuckDB/locally arbitrated)
  *   (env SPARK_GRAFT_MASTER overrides spark://localhost:7077)
  */
object ClusterSmoke {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf100")
    val expX21 = if (args.length > 1) args(1).toLong else 22574543L
    val expW7 = if (args.length > 2) args(2).toLong else 600000L
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", "spark://localhost:7077")
    val spark = ClusterProbe.session(master)

    println(s"[smoke] master=$master sfDir=$d")
    graft.Tables.documents(spark, d).limit(100).count() // ship closures once

    val x21 = graft.SparkEntry.queries("x21_atrest_pairs")(spark, d).count()
    println(s"[smoke] x21 pairs=$x21 expected=$expX21")
    val w7 = graft.SparkEntry.queries("w7_downsample")(spark, d).count()
    println(s"[smoke] w7 rows=$w7 expected=$expW7 (fill assertion silent)")
    spark.stop()

    val ok = x21 == expX21 && w7 == expW7
    println(if (ok) "[smoke] PASS" else "[smoke] FAIL")
    if (!ok) sys.exit(1)
  }
}
