import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Probes that need REAL executor boundaries (VERDICT r13/r14 #8): on
  * local[32] a shuffle is an in-process memory copy and a broadcast is a
  * pointer hand-off, so the x15 bloom-vs-exact-broadcast lever measures
  * neutral there by construction. Run against the standalone cluster
  * `tools/cluster_harness.sh start` brings up (2 workers → 2 executor
  * JVMs), where every shuffle row is serialized over a socket and every
  * broadcast is shipped to a separate JVM heap.
  *
  * Arms (identical pool, outputs equality-gated like X15Probe):
  *   exact(broadcast pool) — x6's shape: broadcast semi-join of the full
  *     distinct pool against the corpus shingles
  *   bloom(prefilter)      — x15's shape: 36-MB-class sketch prefilter,
  *     exact verify behind it
  * Plus one cross-executor band-automaton correctness replay: x21's pair
  * count at /tmp/sf100 must equal the DuckDB-arbitrated 22,574,543 —
  * evidence the MapGroups clustering contract holds across real executor
  * boundaries, not just in one JVM.
  *
  * Usage: runMain ClusterProbe [sfDir] [poolMillions] [reps]
  *   (env SPARK_GRAFT_MASTER overrides spark://localhost:7077)
  */
object ClusterProbe {

  /** The standalone-cluster session every cluster probe/smoke shares:
    * graft.Spark.session's SQL posture, but targeting the harness master,
    * with executors loading the engine classes from the build dir (same
    * box). Extracted so ClusterSmoke cannot drift from the probe's
    * configuration. */
  def session(master: String): SparkSession = {
    val classesDir = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    val spark = SparkSession.builder()
      .appName("graft-cluster-probe")
      .master(master)
      .withExtensions(graft.functions.GraftExtensions)
      .config("spark.executor.cores", "16")
      .config("spark.executor.memory", "20g")
      .config("spark.cores.max", "32") // 2 executors x 16 cores
      .config("spark.executor.extraClassPath", classesDir)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf100")
    val poolM = if (args.length > 1) args(1).toDouble else 30.0
    val reps = if (args.length > 2) args(2).toInt else 3
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", "spark://localhost:7077")
    val spark = session(master)

    def sh = graft.Tables.documents(spark, d)
      .withColumn("_th", graft.functions.Text.tokenHashesFromText(col("text")))
      .select(col("doc_id"),
        graft.functions.Text.sortedShingleSet(col("_th")).as("sh"))
    def corpus = sh.filter(col("doc_id") % 17 =!= 0)

    // identical pool construction to X15Probe (written once, read back)
    val P = 4294967291L
    val poolPath = s"/tmp/x15probe_pool_${poolM.toLong}m.parquet"
    if (!new java.io.File(poolPath).exists()) {
      graft.queries.Curation.evalPoolFrom(sh, 17)
        .union(spark.range((poolM * 1e6).toLong)
          .select((((col("id") * 2654435761L + 987654321L) % P + P) % P).as("h")))
        .distinct()
        .write.mode("overwrite").parquet(poolPath)
    }
    def pool = spark.read.parquet(poolPath)

    def timed(name: String)(f: => Long): Long = {
      graft.Bench.coldReset(spark)
      val t0 = System.nanoTime()
      val n = f
      println(f"[cluster] $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
      n
    }

    println(s"[cluster] master=$master executors=" +
      spark.sparkContext.getExecutorMemoryStatus.size) // driver + executors
    sh.limit(100).count() // warm-up (ships classes/closures once)
    println(s"[cluster] pool=${pool.count()} distinct hashes")

    for (rep <- 1 to reps) {
      println(s"[cluster] --- rep $rep ---")
      val order = Seq(
        "exact(broadcast pool)" -> (() =>
          graft.queries.Curation.decontaminateAgainstPool(corpus, pool).count()),
        "bloom(prefilter)" -> (() =>
          graft.queries.Curation.decontaminateBloomAgainstPool(corpus, pool).count()))
      val run = if (rep % 2 == 1) order else order.reverse
      val rs = run.map { case (n, f) => n -> timed(n)(f()) }.toMap
      assert(rs.values.toSet.size == 1,
        s"bloom output diverges across executors: $rs")
    }

    // cross-executor band-automaton replay: the MapGroups contract must
    // hold when groups span real JVM boundaries
    val pairs = timed("x21 band pairs (2 exec)") {
      graft.SparkEntry.queries("x21_atrest_pairs")(spark, d).count()
    }
    println(s"[cluster] x21 pairs=$pairs (DuckDB-arbitrated reference 22574543 at /tmp/sf100)")
    // cross-executor everyKthPacked replay: the packed gather assumes the
    // manual repartition co-locates each cell in one partition (the
    // advisor-r14 concern) and now ASSERTS exact cell fill — running it
    // over a real 2-JVM exchange exercises that assertion where
    // fragmentation would actually manifest
    val w7 = timed("w7 packed rank (2 exec)") {
      graft.SparkEntry.queries("w7_downsample")(spark, d).count()
    }
    println(s"[cluster] w7 rows=$w7 (local reference 600000 at /tmp/sf100; " +
      "fill assertion inside everyKthPacked did not fire)")
    spark.stop()
  }
}
