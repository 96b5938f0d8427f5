package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Runtime bloom-filter join pruning — a 100 TB lever the engine relies on
  * Catalyst for rather than reimplementing: when a selective dimension
  * filter feeds a shuffle join, InjectRuntimeFilter builds a bloom filter
  * from the dim side and applies `might_contain` to the FACT side before
  * its shuffle, so non-matching fact rows die at the scan instead of
  * paying exchange + join. Default thresholds (10 GB application-side
  * scan) are sized for clusters, which is why the local bench never shows
  * it; this spec drops the threshold to prove the plan shape and the
  * result equivalence, so a config regression (or a Spark upgrade that
  * renames the knobs) fails a test, not a production run. */
class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  test("selective dim filter injects might_contain on the fact side, results unchanged") {
    val dir = Files.createTempDirectory("graft_rtf").toString
    (1L to 200000L).map(i => (i % 5000, i, s"p$i"))
      .toDF("k", "v", "pad").write.mode("overwrite").parquet(s"$dir/fact")
    (0L until 5000L).map(i => (i, if (i % 100 == 0) "hot" else "cold"))
      .toDF("k", "tag").write.mode("overwrite").parquet(s"$dir/dim")
    val fact = spark.read.parquet(s"$dir/fact")
    val dim = spark.read.parquet(s"$dir/dim").filter(col("tag") === "hot")

    def run() = fact.join(dim, Seq("k")).groupBy("tag").agg(count(lit(1)).as("n"))

    val conf = spark.conf
    val prevBloom = conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
    val prevThresh = conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    val prevBcast = conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // broadcast joins skip injection (the filter would be redundant);
      // force the shuffle-join path the lever exists for
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1")
      val filtered = run()
      val plan = filtered.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected an injected bloom filter in:\n$plan")
      val withFilter = filtered.collect().map(r => (r.getString(0), r.getLong(1))).toSet

      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val plain = run()
      assert(!plain.queryExecution.optimizedPlan.toString.contains("might_contain"))
      val without = plain.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(withFilter == without && withFilter == Set(("hot", 2000L)))
    } finally {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", prevBloom)
      conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        prevThresh)
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevBcast)
    }
  }
}
