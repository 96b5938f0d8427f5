import org.apache.spark.sql.functions._

/** Evidence probe for the Spark 4 stat.bloomFilter silent clamp: the
  * DataFrame API routes through the bloom_filter_agg expression, whose
  * numBits/estimatedNumItems are clamped to
  * spark.sql.optimizer.runtime.bloomFilter.{maxNumBits,maxNumItems}
  * (defaults 67,108,864 bits / 4,000,000 items) — NOT the
  * BloomFilter.create sizing the sketch API documents. At a 30M-key pool
  * and fpp=0.01 the sketch should be 287.8M bits; the clamped one is 2^26
  * bits => measured false-positive rate near 1, i.e. the prefilter passes
  * ~everything. This probe measures bitSize and the EMPIRICAL FPP of
  * both builds against disjoint probe keys.
  *
  * Usage: runMain BloomCapProbe [nKeys]
  */
object BloomCapProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(30000000L)
    val spark = graft.Spark.session("bloom-cap-probe")
    import spark.implicits._

    val pool = spark.range(n).select((col("id") * 2).as("h")) // even keys
    val probes = spark.range(200000).select((col("id") * 2 + 1).as("h")) // odd
    val probeKeys = probes.as[Long].collect()

    def fpr(bf: org.apache.spark.util.sketch.BloomFilter): Double =
      probeKeys.count(bf.mightContainLong).toDouble / probeKeys.length

    val viaStat = pool.stat.bloomFilter("h", n, 0.01)
    println(s"[bloomcap] stat.bloomFilter: bits=${viaStat.bitSize()} " +
      f"(${viaStat.bitSize() / 8 / 1e6}%.1f MB) empiricalFpp=${fpr(viaStat)}%.4f")

    val direct = graft.queries.Curation.buildPoolBloom(pool, "h", n, 0.01)
    println(s"[bloomcap] treeReduce build: bits=${direct.bitSize()} " +
      f"(${direct.bitSize() / 8 / 1e6}%.1f MB) empiricalFpp=${fpr(direct)}%.4f")
    spark.stop()
  }
}
