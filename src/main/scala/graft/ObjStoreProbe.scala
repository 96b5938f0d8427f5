package graft

import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Object-store latency probe (round-10 verdict task 5): measures, under
  * an artificial per-open latency ([[graft.sources.SlowFs]], default
  * 25 ms ≈ S3 first-byte), the two levers whose pricing was previously
  * argued rather than measured:
  *
  *  1. the w2/w3 materialize-once lever — `persist + 1 materialize +
  *     3 cached aggregates` vs `4 source-scan aggregates` over a
  *     many-file parquet frame (the segmented automatons' exact access
  *     pattern: per-chrom stats, guard invalidation, anchors, automaton);
  *  2. the pooled planning-time header-compat walk vs the sequential
  *     pre-round-10 walk over a 2000-file VCF directory.
  *
  * One JSON line to stdout and OBJSTORE.json (same discipline as
  * Probes/Bench). Usage:
  *   sbt -batch "runMain graft.ObjStoreProbe" [latencyMs] [headerFiles]
  */
object ObjStoreProbe {
  private def systemLoad(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage

  def main(args: Array[String]): Unit = {
    val latencyMs = if (args.length > 0) args(0).toLong else 25L
    val headerFiles = if (args.length > 1) args(1).toInt else 2000
    val dataFiles = if (args.length > 2) args(2).toInt else 64
    val spark = Spark.session("graft-objstore-probe")
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.set("fs.slowfs.impl", classOf[graft.sources.SlowFs].getName)
    hconf.setLong("fs.slowfs.latency.ms", latencyMs)
    val loadBefore = systemLoad()
    val t = mutable.LinkedHashMap.empty[String, Double]
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      t(name) = (System.nanoTime() - t0) / 1e9
      println(f"[objstore] $name%-28s ${t(name)}%7.2f s")
      r
    }

    // ---- 1. scan-vs-materialize over a 64-file parquet frame -----------
    // 64 files x 4 scans x ~2 opens/file (footer + data) x latency is the
    // priced cost; the cached path pays it once.
    val dir = java.nio.file.Files.createTempDirectory("graft_objstore")
    spark.range(2000000)
      .select(col("id"), (col("id") % 97).as("k"), (col("id") * 31 % 1001).as("v"))
      .repartition(dataFiles)
      .write.mode("overwrite").parquet(dir.resolve("t").toString)
    val slow = spark.read.parquet("slowfs://" + dir.resolve("t"))
    def scanAgg(): Long = slow.agg(sum("v")).head.getLong(0)
    scanAgg() // JIT/footer-schema warm-up (schema inference already read footers)
    time("scan4x_latency") { (1 to 4).foreach(_ => scanAgg()) }
    time("persist1x_plus3_latency") {
      val cached = slow.persist()
      cached.count()
      (1 to 3).foreach(_ => cached.agg(sum("v")).head)
      cached.unpersist()
    }

    // ---- 2. header-compat walk over a many-file VCF directory ----------
    val many = java.nio.file.Files.createTempDirectory("graft_objstore_hdr")
    val body = (1 to 20).map(i => s"chr1\t$i\t.\tA\tT\t50\tPASS\tDP=$i\tGT\t0/1")
    for (i <- 0 until headerFiles) {
      java.nio.file.Files.write(many.resolve(f"part-$i%05d.vcf"),
        (Seq("##fileformat=VCFv4.2",
          "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1") ++ body)
          .mkString("", "\n", "\n").getBytes("UTF-8"))
    }
    val slowMany = "slowfs://" + many
    // sequential pre-round-10 walk: one latencied header open per file on
    // the driver thread — the shape the pooled walk replaced
    time(s"header_seq_${headerFiles}_latency") {
      val p = new org.apache.hadoop.fs.Path(slowMany)
      val fs = p.getFileSystem(hconf)
      fs.listStatus(p).foreach(s => sources.Vcf.headerMetaOf(hconf, s.getPath))
    }
    // the shipped pooled walk, cold cache (first plan over these files)
    time(s"header_pool_${headerFiles}_latency") {
      spark.read.format("vcf").load(slowMany).rdd.getNumPartitions
    }

    val loadAfter = systemLoad()
    val probes = t.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val json = s"""{"metric":"objstore","latency_ms":$latencyMs,"probes":$probes,""" +
      s""""header_files":$headerFiles,"data_files":$dataFiles,"load_before":$loadBefore,""" +
      s""""load_after":$loadAfter,"cores":${Runtime.getRuntime.availableProcessors()}}"""
    println(json)
    val out = sys.env.getOrElse("SPARK_GRAFT_OBJSTORE_OUT", "/root/repo/OBJSTORE.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    catch { case e: Throwable => System.err.println(s"[objstore] write $out: ${e.getMessage}") }
    spark.stop()
  }
}
