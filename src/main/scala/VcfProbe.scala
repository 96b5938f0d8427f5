import org.apache.spark.sql.functions._

/** VCF scan-path probe: the DataSourceV2 pushdown ([[graft.sources.VcfV2]])
  * vs the expression path ([[graft.sources.Vcf.read]]) on a region query
  * over a large single-sample VCF — the reference's `bcftools view -r`
  * scenario (restrict BEFORE parse). Both paths produce identical rows
  * (spec-gated); this probe quantifies the scan-time difference: the V2
  * reader evaluates the region predicate on a 2-field partial parse and
  * skips full parsing of non-matching lines, while the expression path
  * must split every line before its filter runs.
  * Usage: runMain VcfProbe /tmp/big.vcf [chrom] [lo] [hi]
  */
object VcfProbe {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/tmp/big.vcf")
    val chrom = if (args.length > 1) args(1) else "chr7"
    val lo = if (args.length > 2) args(2).toLong else 100000L
    val hi = if (args.length > 3) args(3).toLong else 200000L
    val spark = graft.Spark.session("vcf-probe")

    def region(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("chrom") === chrom && col("pos") > lo && col("pos") <= hi)
        .agg(count(lit(1)).as("n"), sum("dp").as("sum_dp"), avg("qual").as("avg_qual"))

    def time(label: String, df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val r = df.collect().head
      println(f"[vcfprobe] $label%-12s ${(System.nanoTime() - t0) / 1e9}%6.1f s  " +
        s"n=${r.getLong(0)} sum_dp=${r.get(1)}")
    }

    // selective FILTER/QUAL predicate (bcftools -f PASS -i 'QUAL>x')
    def passQual(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("filter") === "PASS" && col("qual") > 88.0)
        .agg(count(lit(1)).as("n"), sum("dp").as("sum_dp"))

    // warm both input paths
    region(graft.sources.Vcf.read(spark, path)).collect()
    region(spark.read.format("vcf").load(path)).collect()
    for (rep <- 1 to 2) {
      time(s"expr#$rep", region(graft.sources.Vcf.read(spark, path)))
      time(s"v2#$rep", region(spark.read.format("vcf").load(path)))
    }
    for (rep <- 1 to 2) {
      time(s"expr-fq#$rep", passQual(graft.sources.Vcf.read(spark, path)))
      time(s"v2-fq#$rep", passQual(spark.read.format("vcf").load(path)))
    }

    // selective FORMAT-field predicate (the reference's FORMAT/GQ[0]>x
    // pre-filter): v2 evaluates gq right after the FORMAT split and skips
    // INFO parse + row assembly on non-matching lines
    def gqSel(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("gq") > 90)
        .agg(count(lit(1)).as("n"), sum("dp").as("sum_dp"))
    for (rep <- 1 to 2) {
      time(s"expr-gq#$rep", gqSel(graft.sources.Vcf.read(spark, path)))
      time(s"v2-gq#$rep", gqSel(spark.read.format("vcf").load(path)))
    }

    // selective INFO predicate (the reference's INFO/AN>4 pre-filter,
    // run_somatic_comparison_and_graphs.py:164): v2 evaluates the typed
    // info_an column on an 8-field prefix parse and skips sample parse +
    // row assembly on non-match; the expression path str_to_maps every line
    def anSelExpr(df: org.apache.spark.sql.DataFrame) =
      graft.sources.Vcf.withInfoFields(df, Map("AN" -> "long"))
        .filter(col("an") > 195L)
        .agg(count(lit(1)).as("n"), sum("dp").as("sum_dp"))
    def anSelV2() =
      spark.read.format("vcf").option("info_fields", "AN:long").load(path)
        .filter(col("info_an") > 195L)
        .agg(count(lit(1)).as("n"), sum("dp").as("sum_dp"))
    for (rep <- 1 to 2) {
      time(s"expr-an#$rep", anSelExpr(graft.sources.Vcf.read(spark, path)))
      time(s"v2-an#$rep", anSelV2())
    }

    // sidecar region index: split pruning should make the region query's
    // cost proportional to the region, not the file (tabix -r analog)
    val tIdx = System.nanoTime()
    graft.sources.VcfIndex.build(spark, path)
    println(f"[vcfprobe] index-build ${(System.nanoTime() - tIdx) / 1e9}%6.1f s")
    println(s"[vcfprobe] v2-idx partitions=" +
      spark.read.format("vcf").load(path)
        .filter(col("chrom") === chrom && col("pos") > lo && col("pos") <= hi)
        .rdd.getNumPartitions +
      s" vs unfiltered=" + spark.read.format("vcf").load(path).rdd.getNumPartitions)
    for (rep <- 1 to 2) time(s"v2-idx#$rep", region(spark.read.format("vcf").load(path)))
    spark.stop()
  }
}
