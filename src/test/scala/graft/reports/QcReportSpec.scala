package graft.reports

import graft.SparkSpec
import graft.sources.{GatkReport, PicardMetrics}
import org.apache.spark.sql.functions._
import java.nio.file.Files

class QcReportSpec extends SparkSpec {

  /** A minimal Picard-style metrics file in the exact section layout
    * importMetrics.ipynb's readMetricsFile consumes. */
  private def metricsText(cls: String, cols: Seq[(String, String)],
                          hist: Seq[(Int, Long)] = Nil): String = {
    val head = Seq(
      "## htsjdk.samtools.metrics.StringHeader",
      s"# ${cls}Tool INPUT=in.bam OUTPUT=out.txt",
      "",
      "## METRICS CLASS\tpicard.analysis." + cls,
      cols.map(_._1).mkString("\t"),
      cols.map(_._2).mkString("\t"))
    val h =
      if (hist.isEmpty) Nil
      else Seq("", "## HISTOGRAM\tjava.lang.Integer", "coverage\tcount") ++
        hist.map { case (c, n) => s"$c\t$n" }
    (head ++ h).mkString("\n")
  }

  private lazy val store = {
    val d = Files.createTempDirectory("graftqc")
    Files.writeString(d.resolve("unmapped.quality_yield_metrics.txt"),
      metricsText("QualityYieldMetricsFlow", Seq(
        "TOTAL_READS" -> "1000", "PF_READS" -> "900", "PF_BASES" -> "90000",
        "Q20_BASES" -> "81000", "Q30_BASES" -> "72000")))
    Files.writeString(d.resolve("alignment_summary_metrics.txt"),
      metricsText("AlignmentSummaryMetrics", Seq(
        "PF_READS_ALIGNED" -> "800", "PF_HQ_ALIGNED_READS" -> "600",
        "PF_HQ_ALIGNED_Q20_BASES" -> "54000", "MEAN_READ_LENGTH" -> "100",
        "PF_MISMATCH_RATE" -> "0.004", "PF_INDEL_RATE" -> "0.0005")))
    Files.writeString(d.resolve("wgs_metrics.txt"),
      metricsText("WgsMetrics", Seq(
        "MEAN_COVERAGE" -> "28.5", "MEDIAN_COVERAGE" -> "30",
        "PCT_10X" -> "0.95", "PCT_20X" -> "0.9", "PCT_EXC_DUPE" -> "0.1"),
        hist = Seq(0 -> 50L, 10 -> 150L, 20 -> 300L, 30 -> 400L, 40 -> 100L)))
    Files.writeString(d.resolve("raw_wgs_metrics.txt"),
      metricsText("RawWgsMetrics", Seq(
        "MEAN_COVERAGE" -> "33.0", "MEDIAN_COVERAGE" -> "32"),
        // cumulative fractions: 0.05, 0.20, 0.50, 0.90, 1.00
        hist = Seq(4 -> 50L, 8 -> 150L, 16 -> 300L, 32 -> 400L, 40 -> 100L)))
    // companions the importer must skip
    Files.writeString(d.resolve("sample.metrics.tsv"), "ignored")
    d.toString
  }

  private lazy val parsed = PicardMetrics.parse(spark, store + "/*").persist()

  test("PicardMetrics parses StringHeader params, metrics classes, and WgsMetrics histograms") {
    val m = PicardMetrics.metrics(parsed)
    assert(m.count() == 5 + 6 + 5 + 2)
    val classes = m.select("file", "metrics_class").distinct().collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(classes("wgs_metrics") == "WgsMetrics")
    assert(classes("unmapped.quality_yield_metrics") == "QualityYieldMetricsFlow")
    val p = PicardMetrics.params(parsed)
    assert(p.filter(col("parameter") === "INPUT" && col("value") === "in.bam").count() == 4)
    // only *WgsMetrics files contribute histograms; .tsv companion skipped
    val cv = PicardMetrics.coverage(parsed)
    assert(cv.select("file").distinct().count() == 2)
    assert(cv.filter(col("file") === "raw_wgs_metrics").count() == 5)
    assert(parsed.filter(col("file").contains("tsv")).count() == 0)
  }

  private def tagged(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("sample", lit("s1"))

  test("throughput table replays the notebook's funnel arithmetic") {
    val t = QcReport.throughput(tagged(PicardMetrics.metrics(parsed)), totalBeads = 2000)
      .collect().head
    assert(t.getAs[Double]("bc_reads") == 1000.0)
    assert(t.getAs[Double]("pct_bc_reads") == 0.5)
    assert(t.getAs[Double]("pct_pf_reads") == 0.9)
    assert(t.getAs[Double]("pct_aligned_reads") == 800.0 / 900)
    assert(t.getAs[Double]("pct_bq30_bases") == 0.8)
    assert(t.getAs[Double]("nondup_hq_reads") == 600 * 0.9)
    assert(t.getAs[Double]("pct_nondup_hq_bases") == 54000.0 / 90000 * 0.9)
  }

  test("coverage table: %0x from the HQ histogram, fold penalties from the raw one") {
    val cvg = PicardMetrics.coverage(parsed)
    val raw = tagged(cvg.filter(col("file") === "raw_wgs_metrics")).drop("file")
    val hq = tagged(cvg.filter(col("file") === "wgs_metrics")).drop("file")
    val c = QcReport.coverage(tagged(PicardMetrics.metrics(parsed)), raw, hq)
      .collect().head
    assert(c.getAs[Double]("median_raw_coverage") == 32.0)
    assert(c.getAs[Double]("pct_0x") == 0.05)
    // raw cumu: 4->0.05, 8->0.20, 16->0.50, 32->0.90 ⇒ p20=16 (first >0.20),
    // p10=8, p05=8 (0.05 is NOT >0.05)
    assert(c.getAs[Double]("f80") == 2.0)   // 32/16
    assert(c.getAs[Double]("f90") == 4.0)   // 32/8
    assert(c.getAs[Double]("f95") == 4.0)   // 32/8
  }

  test("error table and top-metrics selection") {
    val metrics = tagged(PicardMetrics.metrics(parsed))
    val e = QcReport.error(metrics).collect().head
    assert(e.getAs[Double]("mismatch_rate") == 0.004)
    assert(e.getAs[Double]("indel_rate") == 0.0005)
    val top = QcReport.topMetrics(metrics).collect()
      .map(r => r.getAs[String]("parameter")).toSet
    assert(top == Set("TOTAL_READS", "PF_BASES", "MEAN_READ_LENGTH",
      "PF_MISMATCH_RATE", "PF_INDEL_RATE", "MEAN_COVERAGE"))
  }

  test("registerViews exposes the report as SQL") {
    val cvg = PicardMetrics.coverage(parsed)
    QcReport.registerViews(spark, tagged(PicardMetrics.metrics(parsed)),
      tagged(cvg.filter(col("file") === "raw_wgs_metrics")).drop("file"),
      tagged(cvg.filter(col("file") === "wgs_metrics")).drop("file"),
      totalBeads = 2000)
    assert(spark.sql("SELECT pct_20x FROM qc_coverage").head.getDouble(0) == 0.9)
    assert(spark.sql(
      "SELECT count(*) FROM qc_top_metrics WHERE metrics_class = 'AlignmentSummaryMetrics'")
      .head.getLong(0) == 3)
  }

  test("GatkReport extracts the reference's table families from a VariantEval dump") {
    val d = Files.createTempDirectory("graftgatk")
    val report = Seq(
      "#:GATKReport.v1.1:2",
      "#:GATKTable:4:2:%s:%s:%d:%.2f:;",
      "#:GATKTable:CompOverlap:The overlap between eval and comp sites",
      "CompOverlap  CompFeatureInput  nEvalVariants  concordantRate",
      "CompOverlap  dbsnp             1000           98.25",
      "CompOverlap  none              1200           0.00",
      "",
      "#:GATKTable:3:1:%s:%d:%d:;",
      "#:GATKTable:CountVariants:Counts different classes of variants",
      "CountVariants  nSNPs  nIndels",
      "CountVariants  800    200",
      "",
      "#:GATKTable:2:1:%s:%d:;",
      "#:GATKTable:NotWanted:ignored table",
      "NotWanted  n",
      "NotWanted  5").mkString("\n")
    Files.writeString(d.resolve("eval.txt"), report)
    val tables = GatkReport.read(spark, d.resolve("eval.txt").toString)
    assert(tables.keySet == Set("CompOverlap", "CountVariants"))
    val co = tables("CompOverlap")
    assert(co.columns.toSeq ==
      Seq("CompOverlap", "CompFeatureInput", "nEvalVariants", "concordantRate"))
    assert(co.count() == 2)
    assert(co.filter(col("CompFeatureInput") === "dbsnp")
      .head.getAs[String]("concordantRate") == "98.25")
    assert(tables("CountVariants").head.getAs[String]("nSNPs") == "800")

    // fleet form: long frame tagged by file, same cells
    val all = GatkReport.readAll(spark, d.toString + "/*")
    assert(all.filter(col("table") === "CompOverlap").count() == 8)
    assert(all.filter(col("table") === "NotWanted").count() == 0)
    val cell = all.filter(col("table") === "CountVariants" && col("column") === "nIndels")
      .head.getAs[String]("value")
    assert(cell == "200")
  }
}
