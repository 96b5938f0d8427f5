import org.apache.spark.sql.functions._

/** X15's reason to exist, MEASURED (round-13 verdict task 8): the Bloom
  * prefilter pays off when the eval pool is too big to broadcast exactly.
  * The registered x15 runs at evalMod=17 where the pool is tiny and the
  * A/B is neutral; here we shrink evalMod so the pool becomes a large
  * fraction of the corpus (evalMod=2 at the 100x replica: ~250k eval docs,
  * ~14M distinct shingle hashes — >100 MB as an exact broadcast against
  * the 10 MB autoBroadcast default), the regime the operator is FOR.
  * Each variant runs cold (coldReset), equality of outputs is asserted.
  * Usage: runMain X15Probe /tmp/sf100 [evalMod] [reps]
  */
object X15Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf100")
    val evalMod = if (args.length > 1) args(1).toInt else 2
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = graft.Spark.session("x15-probe")

    def sh = graft.Tables.documents(spark, d)
      .withColumn("_th", graft.functions.Text.tokenHashesFromText(col("text")))
      .select(col("doc_id"), graft.functions.Text.sortedShingleSet(col("_th")).as("sh"))

    def timed(name: String)(f: => Long): Long = {
      graft.Bench.coldReset(spark)
      val t0 = System.nanoTime()
      val n = f
      println(f"[x15probe] $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
      n
    }

    sh.limit(100).count() // warm-up

    val poolN = graft.queries.Curation.evalPoolFrom(sh, evalMod).count()
    println(s"[x15probe] evalMod=$evalMod pool=$poolN distinct shingles " +
      f"(~${poolN * 8.0 / (1 << 20)}%.0f MB of raw longs as an exact broadcast)")

    for (rep <- 1 to reps) {
      println(s"[x15probe] --- rep $rep ---")
      val a = timed("exact(broadcast pool)") {
        graft.queries.Curation.decontaminateFrom(sh, evalMod).count()
      }
      val b = timed("bloom(prefilter)") {
        graft.queries.Curation.decontaminateBloomFrom(sh, evalMod).count()
      }
      assert(a == b, s"bloom output diverges: exact=$a bloom=$b")
    }
    spark.stop()
  }
}
