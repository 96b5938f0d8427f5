package graft

import org.apache.spark.sql.functions._
import scala.collection.mutable

/** VCF source-path probe suite as a committed artifact (round-8 verdict
  * task 6): the VcfProbe/TbiProbe measurements — expression path vs
  * DataSourceV2 pushdown, tabix/CSI build + prune, and the planning-time
  * header-compatibility walk — emitted as ONE JSON line with the same
  * honest-idle discipline as Bench (load stamps before/after), written to
  * PROBES.json so source-path regressions are visible round-over-round.
  *
  * Inputs are generated deterministically in /tmp (the driver testdata
  * has no VCF), so runs are comparable across rounds on the same box.
  * Usage: sbt -batch "runMain graft.Probes" [then commit PROBES.json]
  */
object Probes {
  private def systemLoad(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage

  private val Rows = 1500000
  private val HeaderFiles = 2000

  def main(args: Array[String]): Unit = {
    val spark = Spark.session("graft-probes")
    val conf = spark.sessionState.newHadoopConf()
    val loadBefore = systemLoad()
    val t = mutable.LinkedHashMap.empty[String, Double]
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      t(name) = (System.nanoTime() - t0) / 1e9
      println(f"[probes] $name%-24s ${t(name)}%7.2f s")
      r
    }

    // ---- deterministic probe VCF: ~120 MB, 1.5 M lines, 1 sample -------
    val dir = java.nio.file.Files.createTempDirectory("graftprobes")
    val vcf = dir.resolve("probe.vcf")
    val rnd = new scala.util.Random(42)
    val w = java.nio.file.Files.newBufferedWriter(vcf)
    w.write("##fileformat=VCFv4.2\n")
    w.write("##INFO=<ID=DP,Number=1,Type=Integer,Description=\"d\">\n")
    w.write("##INFO=<ID=AN,Number=1,Type=Integer,Description=\"a\">\n")
    w.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n")
    val perChrom = Rows / 8
    for (c <- 1 to 8; i <- 1 to perChrom) { // (chrom, pos)-sorted: tabix precondition
      val filt = if (i % 5 == 0) "LowQual" else "PASS"
      w.write(s"chr$c\t${i * 3}\t.\tACGT\tA\t${40 + rnd.nextInt(60)}.0\t$filt\t" +
        s"DP=${rnd.nextInt(100)};AN=${rnd.nextInt(8)}\tGT:DP:GQ\t" +
        s"0/1:${rnd.nextInt(100)}:${rnd.nextInt(99)}\n")
    }
    w.close()
    println(s"[probes] wrote ${java.nio.file.Files.size(vcf) / (1 << 20)} MB text VCF")

    def regionAgg(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("chrom") === "chr3" && col("pos") > 100000 && col("pos") <= 200000)
        .agg(count(lit(1)), sum("dp")).collect()
    def gqAgg(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("gq") > 90).agg(count(lit(1)), sum("dp")).collect()

    // warm both paths once (JIT/codegen), then measure
    regionAgg(sources.Vcf.read(spark, vcf.toString))
    regionAgg(spark.read.format("vcf").load(vcf.toString))
    time("expr_region")(regionAgg(sources.Vcf.read(spark, vcf.toString)))
    time("v2_region")(regionAgg(spark.read.format("vcf").load(vcf.toString)))
    time("expr_gq")(gqAgg(sources.Vcf.read(spark, vcf.toString)))
    time("v2_gq")(gqAgg(spark.read.format("vcf").load(vcf.toString)))
    time("v2_info_an") {
      spark.read.format("vcf").option("info_fields", "AN:long").load(vcf.toString)
        .filter(col("info_an") > 5).agg(count(lit(1))).collect()
    }

    // ---- bgzf + tabix/csi build and pruned region read ----------------
    val gz = dir.resolve("probe.vcf.gz").toString
    time("bgzf_compress") {
      val in = java.nio.file.Files.newBufferedReader(vcf)
      val out = java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(gz))
      sources.Bgzf.write(Iterator.continually(in.readLine()).takeWhile(_ != null), out)
      out.close(); in.close()
    }
    time("tbi_build")(sources.Tabix.buildForVcf(conf, gz, "tbi"))
    def v2gz = spark.read.format("vcf")
      .option("split_bytes", (2L << 20).toString).load(gz)
    val unprunedParts = v2gz.rdd.getNumPartitions
    regionAgg(v2gz) // warm
    time("tbi_pruned_region")(regionAgg(v2gz))
    java.nio.file.Files.delete(java.nio.file.Paths.get(gz + ".tbi"))
    time("csi_build")(sources.Tabix.buildForVcf(conf, gz, "csi"))
    time("csi_pruned_region")(regionAgg(v2gz))
    println(s"[probes] region splits: ${regionSplits(spark, gz)} of $unprunedParts")

    // ---- planning-time header-compat walk on a many-file directory -----
    val many = java.nio.file.Files.createTempDirectory("graftprobehdr")
    val body = (1 to 20).map(i => s"chr1\t$i\t.\tA\tT\t50\tPASS\tDP=$i\tGT\t0/1")
    for (i <- 0 until HeaderFiles) {
      java.nio.file.Files.write(many.resolve(f"part-$i%05d.vcf"),
        (Seq("##fileformat=VCFv4.2",
          "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1") ++ body)
          .mkString("", "\n", "\n").getBytes("UTF-8"))
    }
    // sequential baseline: the pre-round-10 walk shape (one uncached
    // header read per file on the driver thread)
    time(s"header_seq_$HeaderFiles") {
      val p = new org.apache.hadoop.fs.Path(many.toString)
      val fs = p.getFileSystem(conf)
      fs.listStatus(p).foreach(s => sources.Vcf.headerMetaOf(conf, s.getPath))
    }
    // the shipped walk: parallel pool, cold cache (first plan in this JVM)
    time(s"header_walk_cold_$HeaderFiles") {
      spark.read.format("vcf").load(many.toString).rdd.getNumPartitions
    }
    // warm: (path,len,mtime) cache hit path
    time(s"header_walk_warm_$HeaderFiles") {
      spark.read.format("vcf").load(many.toString).rdd.getNumPartitions
    }

    val loadAfter = systemLoad()
    val probes = t.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val json = s"""{"metric":"probes","probes":$probes,"rows":$Rows,""" +
      s""""header_files":$HeaderFiles,"load_before":$loadBefore,""" +
      s""""load_after":$loadAfter,"cores":${Runtime.getRuntime.availableProcessors()}}"""
    println(json)
    val out = sys.env.getOrElse("SPARK_GRAFT_PROBES_OUT", "/root/repo/PROBES.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    catch { case e: Throwable => System.err.println(s"[probes] write $out: ${e.getMessage}") }
    spark.stop()
  }

  private def regionSplits(spark: org.apache.spark.sql.SparkSession, gz: String): Int =
    spark.read.format("vcf").option("split_bytes", (2L << 20).toString).load(gz)
      .filter(col("chrom") === "chr3" && col("pos") > 100000 && col("pos") <= 200000)
      .rdd.getNumPartitions
}
