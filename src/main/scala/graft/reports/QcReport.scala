package graft.reports

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequencing QC report layer — the query side of the reference's
  * createQCReport.ipynb + importMetrics.ipynb (SURVEY §3.3), the same
  * pattern as [[VarReport]]: each notebook table is a DataFrame program
  * over the imported metrics store, registered as a temp view so report
  * questions are plain SQL.
  *
  * Input shape: the [[graft.sources.PicardMetrics]] store with a `sample`
  * column — `metrics(sample, file, metrics_class, parameter, value)` and
  * coverage histograms `(sample, coverage, cnt)` (raw and HQ, the
  * notebook's `raw_wgs_metrics_cvg` / `wgs_metrics_cvg` keys).
  *
  * Scale shape: every table is one pivot-style aggregate per sample (a
  * few hundred metric rows each) plus window math over <=201-row
  * histograms — partial+final aggregates with map-side combine, no
  * fact-scale windows. A fleet of 10⁵ samples is 10⁷ metric rows: trivia
  * for the engine, which is exactly why the report layer belongs IN the
  * engine instead of in per-sample pandas.
  */
object QcReport {

  /** metric lookup as a pivot cell: first value for (file, parameter),
    * cast to double (the notebook's `getMetric(s, file, param, float)`). */
  private def m(file: String, param: String): Column =
    max(when(col("file") === file && col("parameter") === param,
      col("value").cast("double")))

  /** Throughput table (createQCReport.ipynb cell "Throughput"): read
    * counts through the filter/align/dup funnel and their rates. */
  def throughput(metrics: DataFrame, totalBeads: Double): DataFrame =
    metrics.groupBy("sample").agg(
      m("unmapped.quality_yield_metrics", "TOTAL_READS").as("bc_reads"),
      m("unmapped.quality_yield_metrics", "PF_READS").as("pf_reads"),
      m("alignment_summary_metrics", "PF_READS_ALIGNED").as("aligned_reads"),
      m("alignment_summary_metrics", "PF_HQ_ALIGNED_READS").as("hq_aligned_reads"),
      m("unmapped.quality_yield_metrics", "PF_BASES").as("pf_bases"),
      m("unmapped.quality_yield_metrics", "Q20_BASES").as("q20_bases"),
      m("unmapped.quality_yield_metrics", "Q30_BASES").as("q30_bases"),
      m("alignment_summary_metrics", "PF_HQ_ALIGNED_Q20_BASES").as("hq_q20_bases"),
      m("wgs_metrics", "PCT_EXC_DUPE").as("pct_duplication"),
      m("alignment_summary_metrics", "MEAN_READ_LENGTH").as("read_length"))
    .select(col("sample"),
      col("bc_reads"),
      (col("bc_reads") / totalBeads).as("pct_bc_reads"),
      col("pf_reads"),
      (col("pf_reads") / col("bc_reads")).as("pct_pf_reads"),
      col("aligned_reads"), col("hq_aligned_reads"),
      (col("aligned_reads") / col("pf_reads")).as("pct_aligned_reads"),
      (col("hq_aligned_reads") / col("pf_reads")).as("pct_hq_aligned_reads"),
      (col("q20_bases") / col("pf_bases")).as("pct_bq20_bases"),
      (col("q30_bases") / col("pf_bases")).as("pct_bq30_bases"),
      col("pct_duplication"),
      (col("hq_aligned_reads") * (lit(1.0) - col("pct_duplication"))).as("nondup_hq_reads"),
      col("read_length"),
      (col("hq_q20_bases") / col("pf_bases") * (lit(1.0) - col("pct_duplication")))
        .as("pct_nondup_hq_bases"),
      (col("hq_q20_bases") * (lit(1.0) - col("pct_duplication"))).as("n_nondup_hq_bases"))

  /** Fold-penalty percentiles over a coverage histogram, the notebook's
    * `Cumu` sweep: per group, the minimum coverage whose cumulative count
    * fraction exceeds each threshold. F80 = median / p20-coverage, F90 =
    * median / p10, F95 = median / p05 (the standard fold-80/90/95 base
    * penalty; medians derived the same way so both engines agree exactly —
    * all inputs are integer counts, so the fractions are identical
    * doubles). Input: (grp, coverage, cnt); the window runs over the
    * <=201-row aggregated histogram per group, never over facts.
    */
  def foldPenalty(hist: DataFrame, grp: String = "sample"): DataFrame = {
    val wCum = Window.partitionBy(grp).orderBy("coverage")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(grp)
    val cum = hist.withColumn("cumu",
      sum("cnt").over(wCum).cast("double") / sum("cnt").over(wAll))
    def pct(t: Double) = min(when(col("cumu") > t, col("coverage")))
    val r6 = (c: Column) => floor(c * 1000000.0 + 0.5) / 1000000.0
    cum.groupBy(col(grp))
      .agg(pct(0.05).as("p05"), pct(0.10).as("p10"),
           pct(0.20).as("p20"), pct(0.50).as("p50"))
      .select(col(grp), col("p05"), col("p10"), col("p20"), col("p50"),
        r6(col("p50").cast("double") / col("p20")).as("f80"),
        r6(col("p50").cast("double") / col("p10")).as("f90"),
        r6(col("p50").cast("double") / col("p05")).as("f95"))
  }

  /** Coverage table (notebook "Coverage"): summary metrics plus the
    * histogram-derived %0x and fold penalties. `cvgRaw`/`cvgHq` are the
    * raw/HQ WGS coverage histograms `(sample, coverage, cnt)`. */
  def coverage(metrics: DataFrame, cvgRaw: DataFrame, cvgHq: DataFrame): DataFrame = {
    val summary = metrics.groupBy("sample").agg(
      m("wgs_metrics", "MEAN_COVERAGE").as("mean_hq_coverage"),
      m("wgs_metrics", "MEDIAN_COVERAGE").as("median_hq_coverage"),
      m("raw_wgs_metrics", "MEAN_COVERAGE").as("mean_raw_coverage"),
      m("raw_wgs_metrics", "MEDIAN_COVERAGE").as("median_raw_coverage"),
      m("wgs_metrics", "PCT_10X").as("pct_10x"),
      m("wgs_metrics", "PCT_20X").as("pct_20x"))
    val pct0 = cvgHq.groupBy("sample").agg(
      (sum(when(col("coverage") === 0, col("cnt")).otherwise(0L)).cast("double") /
        sum("cnt")).as("pct_0x"))
    // notebook F-stats divide the MEDIAN metric by the histogram
    // percentile coverage (cell "Coverage": f80 = medianRawCvg / index)
    val folds = foldPenalty(cvgRaw).select(col("sample"),
      col("p05"), col("p10"), col("p20"))
    summary.join(pct0, Seq("sample"), "left")
      .join(folds, Seq("sample"), "left")
      .select(col("sample"), col("mean_hq_coverage"), col("median_hq_coverage"),
        col("mean_raw_coverage"), col("median_raw_coverage"),
        col("pct_0x"), col("pct_10x"), col("pct_20x"),
        (col("median_raw_coverage") / col("p20")).as("f80"),
        (col("median_raw_coverage") / col("p10")).as("f90"),
        (col("median_raw_coverage") / col("p05")).as("f95"))
  }

  /** Error table (notebook "Error"). */
  def error(metrics: DataFrame): DataFrame =
    metrics.groupBy("sample").agg(
      m("alignment_summary_metrics", "PF_MISMATCH_RATE").as("mismatch_rate"),
      m("alignment_summary_metrics", "PF_INDEL_RATE").as("indel_rate"))

  /** The headline (key, metrics_class) pairs of
    * ugvc/reports/top_metrics_for_tbl.csv. */
  val TopMetrics: Seq[(String, String)] = Seq(
    "TOTAL_READS" -> "QualityYieldMetricsFlow",
    "PCT_PF_READS" -> "AlignmentSummaryMetrics",
    "PCT_PF_READS_ALIGNED" -> "AlignmentSummaryMetrics",
    "PF_BASES" -> "QualityYieldMetricsFlow",
    "PF_Q30_BASES" -> "QualityYieldMetricsFlow",
    "MEAN_READ_LENGTH" -> "AlignmentSummaryMetrics",
    "MEAN_ALIGNED_READ_LENGTH" -> "AlignmentSummaryMetrics",
    "GC_NC_0_19" -> "GcBiasSummaryMetrics",
    "GC_NC_80_100" -> "GcBiasSummaryMetrics",
    "MEAN_COVERAGE" -> "RawWgsMetrics",
    "FOLD_90_BASE_PENALTY" -> "RawWgsMetrics",
    "PCT_20X" -> "RawWgsMetrics",
    "PERCENT_DUPLICATION" -> "DuplicationMetrics",
    "PF_INDEL_RATE" -> "AlignmentSummaryMetrics",
    "PF_MISMATCH_RATE" -> "AlignmentSummaryMetrics")

  /** Top-metrics selection (top_metrics_for_tbl.csv-driven): the headline
    * subset of the metrics store, broadcast-joined on the tiny key list. */
  def topMetrics(metrics: DataFrame,
                 keys: Seq[(String, String)] = TopMetrics): DataFrame = {
    val spark = metrics.sparkSession
    import spark.implicits._
    val want = keys.toDF("parameter", "metrics_class")
    metrics.join(broadcast(want), Seq("parameter", "metrics_class"))
      .select("sample", "metrics_class", "parameter", "value")
  }

  def tables(metrics: DataFrame, cvgRaw: DataFrame, cvgHq: DataFrame,
             totalBeads: Double): Map[String, DataFrame] = Map(
    "qc_throughput" -> throughput(metrics, totalBeads),
    "qc_coverage" -> coverage(metrics, cvgRaw, cvgHq),
    "qc_error" -> error(metrics),
    "qc_top_metrics" -> topMetrics(metrics))

  /** Register every table as a temp view — the notebook without the
    * notebook (VarReport.registerViews pattern). */
  def registerViews(spark: SparkSession, metrics: DataFrame, cvgRaw: DataFrame,
                    cvgHq: DataFrame, totalBeads: Double): Unit =
    tables(metrics, cvgRaw, cvgHq, totalBeads).foreach {
      case (name, df) => df.createOrReplaceTempView(name)
    }

  def write(metrics: DataFrame, cvgRaw: DataFrame, cvgHq: DataFrame,
            totalBeads: Double, path: String): Unit =
    graft.sources.MultiTable.write(tables(metrics, cvgRaw, cvgHq, totalBeads), path)
}
