import org.apache.spark.sql.functions._

/** Real-cluster A/B for the r16 bloom sketch-build coalesce
  * (Curation.BLOOM_BUILD_TASKS): ClusterProbe r15 measured the bloom arm's
  * dominant cost as per-task partial shipping — every build task emits a
  * partial sketch sized for the FULL pool (~36 MB at 30M keys), so the
  * aggregation moves tasks × sketch-bytes across JVM boundaries. This
  * probe times ONLY the sketch build (the mechanism under test), plain
  * scan-parallel vs coalesced to BLOOM_BUILD_TASKS, interleaved, on the
  * 2-executor standalone cluster where the serialization is real. The two
  * sketches must be BYTE-identical: same size/hash family and the same
  * key set make the bit pattern order-independent, so the coalesce cannot
  * change any downstream mightContain verdict.
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
    println(s"[bloomprobe] master=$master pool=$n keys " +
      s"(sketch ~${math.round(9.585 * n / 8 / 1e6)} MB at fpp=0.01)")

    def ser(bf: org.apache.spark.util.sketch.BloomFilter): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos); bos.toByteArray
    }
    def timed(name: String)(f: => Array[Byte]): Array[Byte] = {
      val t0 = System.nanoTime()
      val b = f
      println(f"[bloomprobe] $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s  bytes=${b.length}")
      b
    }

    pool.limit(100).count() // warm-up
    for (rep <- 1 to reps) {
      println(s"[bloomprobe] --- rep $rep ---")
      val arms = Seq(
        "plain(scan tasks)" -> (() => ser(pool.stat.bloomFilter("h", n, 0.01))),
        s"coalesced(${graft.queries.Curation.BLOOM_BUILD_TASKS})" -> (() =>
          ser(pool.coalesce(graft.queries.Curation.BLOOM_BUILD_TASKS)
            .stat.bloomFilter("h", n, 0.01))))
      val run = if (rep % 2 == 1) arms else arms.reverse
      val bs = run.map { case (nm, f) => nm -> timed(nm)(f()) }
      assert(java.util.Arrays.equals(bs.head._2, bs.last._2),
        "coalesced sketch diverges from the plain build")
    }
    spark.stop()
  }
}
