import org.apache.spark.sql.functions._

/** Real-cluster A/B for the r17 bloom build rewrite: Spark 4's
  * `df.stat.bloomFilter` routes through the `bloom_filter_agg` Catalyst
  * aggregate, whose sizing is silently CLAMPED to the runtime-join-filter
  * caps (`spark.sql.optimizer.runtime.bloomFilter.maxNumItems` = 4M,
  * `maxNumBits` = 2^26) — at a 30M-key pool the "fpp=0.01" sketch is
  * 8.4 MB instead of 36 MB and its measured FPP is ~0.94, so the x15
  * prefilter passed ~everything exactly in the big-pool regime it exists
  * for. `Curation.buildPoolBloom` sizes per the sketch API contract
  * (BloomFilter.create), builds one partial per scan partition at full
  * parallelism, and tree-merges executor-side so the driver sees ~scale
  * partials, not tasks × sketch-bytes (the r16 coalesce concern, without
  * its measured ~20% hash-parallelism loss — BloomBuildProbe r17 at the
  * 30M pool: plain stat 6.32/4.53/4.12 s vs coalesce(4) 6.08/5.89/6.27 s).
  *
  * Prints walls, bit sizes, and the EMPIRICAL false-positive rate of each
  * sketch against keys absent from the pool; asserts both sketches have
  * no false negatives on a pool sample (the correctness contract) and
  * that the hand build's FPP honors its contract (≤ 2×fpp slack).
  *
  * Usage: runMain BloomBuildProbe [poolParquet] [reps]
  *   default pool: /tmp/x15probe_pool_30m.parquet (ClusterProbe's)
  *   (env SPARK_GRAFT_MASTER overrides spark://localhost:7077)
  */
object BloomBuildProbe {
  def main(args: Array[String]): Unit = {
    val poolPath = args.headOption.getOrElse("/tmp/x15probe_pool_30m.parquet")
    val reps = if (args.length > 1) args(1).toInt else 3
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", "spark://localhost:7077")
    val spark = ClusterProbe.session(master)

    def pool = spark.read.parquet(poolPath)
    val n = pool.count()
    println(s"[bloomprobe] master=$master pool=$n keys (contract sketch " +
      s"~${org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(n, 0.01) / 8 / 1000000} MB at fpp=0.01)")

    // probe keys for the empirical FPP: the pool is md5/modulus-derived
    // longs; salted-hash negatives collide with a 30M-key pool only at
    // 64-bit-birthday odds (~30M/2^64 per key), far below the fpp being
    // measured — no driver-side disjointness scan needed (r17 review:
    // the old 2M-row collect checked 1/15th of the pool for nothing)
    val inPool = pool.limit(50000).collect().map(_.getLong(0))
    val notInPool = (1 to 50000).map(i => scala.util.hashing.MurmurHash3
      .stringHash(s"bloomcap-negative-$i").toLong * 2654435761L + i).toArray
    def scorecard(tag: String,
        bf: org.apache.spark.util.sketch.BloomFilter): Unit = {
      val fn = inPool.count(k => !bf.mightContainLong(k))
      val fp = notInPool.count(bf.mightContainLong).toDouble / notInPool.length
      println(f"[bloomprobe] $tag: bits=${bf.bitSize()} " +
        f"(${bf.bitSize() / 8 / 1e6}%.1f MB) empiricalFpp=$fp%.4f falseNeg=$fn")
      assert(fn == 0, s"$tag has false negatives — broken sketch")
    }

    pool.limit(100).count() // warm-up
    for (rep <- 1 to reps) {
      println(s"[bloomprobe] --- rep $rep ---")
      def timed(name: String)(
          f: => org.apache.spark.util.sketch.BloomFilter)
          : org.apache.spark.util.sketch.BloomFilter = {
        val t0 = System.nanoTime()
        val b = f
        println(f"[bloomprobe] $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
        b
      }
      val arms = Seq(
        "stat(clamped agg)" -> (() =>
          timed("stat(clamped agg)")(pool.stat.bloomFilter("h", n, 0.01))),
        "treeReduce(sized)" -> (() => timed("treeReduce(sized)")(
          graft.queries.Curation.buildPoolBloom(pool, "h", n, 0.01))))
      val run = if (rep % 2 == 1) arms else arms.reverse
      val built = run.map { case (nm, f) => nm -> f() }
      if (rep == 1) built.foreach { case (nm, bf) => scorecard(nm, bf) }
      val sized = built.toMap.apply("treeReduce(sized)")
      assert(notInPool.count(sized.mightContainLong).toDouble
        / notInPool.length <= 0.02,
        "sized sketch violates its 1% fpp contract (2x slack)")
    }
    spark.stop()
  }
}
