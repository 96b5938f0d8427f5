import org.apache.spark.sql.functions._

/** Tabix-prune probe: bgzf-compress a large VCF, index it with ONLY a
  * `.tbi` (the sidecar foreign files ship — no `.gidx`), and show a
  * one-locus region query planning a strict subset of splits with
  * row-identical results — the `bcftools view -r` access pattern on
  * unmodified foreign data (create_somatic_gt_file.py:103-106 expects
  * exactly this layout).
  * Usage: runMain TbiProbe /tmp/big.vcf [chrom] [lo] [hi]
  */
object TbiProbe {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/tmp/big_info.vcf")
    val chrom = if (args.length > 1) args(1) else "chr7"
    val lo = if (args.length > 2) args(2).toLong else 100000L
    val hi = if (args.length > 3) args(3).toLong else 200000L
    val spark = graft.Spark.session("tbi-probe")
    val conf = spark.sessionState.newHadoopConf()

    val gz = src + ".probe.gz"
    val t0 = System.nanoTime()
    val in = java.nio.file.Files.newBufferedReader(java.nio.file.Paths.get(src))
    val out = java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(gz))
    graft.sources.Bgzf.write(
      Iterator.continually(in.readLine()).takeWhile(_ != null), out)
    out.close(); in.close()
    println(f"[tbiprobe] bgzf-compress ${(System.nanoTime() - t0) / 1e9}%6.1f s")

    val t1 = System.nanoTime()
    graft.sources.Tabix.buildForVcf(conf, gz)
    println(f"[tbiprobe] tbi-build     ${(System.nanoTime() - t1) / 1e9}%6.1f s")

    def region(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("chrom") === chrom && col("pos") > lo && col("pos") <= hi)
    // 2 MB splits: the compressed probe file is small, so shrink splits to
    // make the prune surface visible (at 100 GB the default 16 MB is fine)
    def v2 = spark.read.format("vcf").option("split_bytes", (2L << 20).toString).load(gz)

    println(s"[tbiprobe] partitions: region=${region(v2).rdd.getNumPartitions} " +
      s"vs unfiltered=${v2.rdd.getNumPartitions} (only .tbi present: " +
      s"gidx=${java.nio.file.Files.exists(java.nio.file.Paths.get(gz + ".gidx"))})")

    def time(label: String, df: => org.apache.spark.sql.DataFrame): Long = {
      val t = System.nanoTime()
      val r = df.agg(count(lit(1)).as("n"), sum("dp").as("sum_dp")).collect().head
      println(f"[tbiprobe] $label%-12s ${(System.nanoTime() - t) / 1e9}%6.1f s  " +
        s"n=${r.getLong(0)} sum_dp=${r.get(1)}")
      r.getLong(0)
    }
    for (rep <- 1 to 2) {
      val a = time(s"tbi#$rep", region(v2))
      // ground truth through the expression path (no pruning anywhere)
      val b = time(s"full#$rep", region(graft.sources.Vcf.read(spark, gz)))
      require(a == b, s"pruned result diverged: $a vs $b")
    }
    spark.stop()
  }
}
