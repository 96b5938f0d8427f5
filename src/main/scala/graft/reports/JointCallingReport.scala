package graft.reports

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Joint-calling report (`joint_calling_report.ipynb`) as named result
  * tables. The notebook pivots three GATK VariantEval long tables
  * (IndelSummary, VariantSummary, MultiallelicSummary — each keyed by
  * JexlExpression x Novelty) into one metric table per annotation, plus an
  * indel-length histogram and a bcftools-style allele-frequency table.
  *
  * Inputs are the long frames themselves — in this engine they come out of
  * [[graft.sources.GatkReport]] (VariantEval output IS a GATKReport), or
  * any parquet with the same columns. Everything here is a few-hundred-row
  * dimension join: broadcast hash joins, no shuffle that matters at any
  * scale.
  *
  * Reference: ugvc/reports/joint_calling_report.ipynb (cell 3
  * `metric_table_annotation`, cell 8 indel-length histogram, cell 11
  * `read_allele_freq_df`). */
object JointCallingReport {

  /** One row per (annotation, novelty ∈ novel|known|all) with the ten
    * notebook metrics. dbsnp ratios exist only on the `all` row (the
    * notebook computes known/all there and leaves novel/known NaN). */
  def variantStatistics(indelSummary: DataFrame, variantSummary: DataFrame,
                        multiallelicSummary: DataFrame): DataFrame = {
    val is = indelSummary.select(
      col("JexlExpression").as("annotation"), col("Novelty").as("novelty"),
      col("insertion_to_deletion_ratio").cast("double").as("insertion_deletion_ratio"),
      col("n_singleton_SNPs").cast("long").as("n_singleton_snps"),
      col("n_singleton_indels").cast("long").as("n_singleton_indels"))
    val vs = variantSummary.select(
      col("JexlExpression").as("annotation"), col("Novelty").as("novelty"),
      col("nSNPs").cast("long").as("n_snps"),
      col("nIndels").cast("long").as("n_indels"),
      col("TiTvRatio").cast("double").as("titv_ratio"))
    val ms = multiallelicSummary.select(
      col("JexlExpression").as("annotation"), col("Novelty").as("novelty"),
      col("variantMultiSnpRatio").cast("double").as("multiallelic_snp_ratio"),
      col("variantMultiIndelRatio").cast("double").as("multiallelic_indel_ratio"))
    // dbsnp ratio = known counts / all counts, attached to the `all` row
    val dbsnp = vs.groupBy("annotation").agg(
      (max(when(col("novelty") === "known", col("n_snps"))).cast("double") /
        nullif(max(when(col("novelty") === "all", col("n_snps"))), lit(0L)))
        .as("dbsnp_snps_ratio"),
      (max(when(col("novelty") === "known", col("n_indels"))).cast("double") /
        nullif(max(when(col("novelty") === "all", col("n_indels"))), lit(0L)))
        .as("dbsnp_indels_ratio"))
    vs.join(is, Seq("annotation", "novelty"), "left")
      .join(ms, Seq("annotation", "novelty"), "left")
      .join(broadcast(dbsnp), Seq("annotation"), "left")
      .withColumn("dbsnp_snps_ratio",
        when(col("novelty") === "all", col("dbsnp_snps_ratio")))
      .withColumn("dbsnp_indels_ratio",
        when(col("novelty") === "all", col("dbsnp_indels_ratio")))
      .select("annotation", "novelty", "n_snps", "n_indels", "titv_ratio",
        "insertion_deletion_ratio", "dbsnp_snps_ratio", "dbsnp_indels_ratio",
        "multiallelic_snp_ratio", "multiallelic_indel_ratio",
        "n_singleton_snps", "n_singleton_indels")
  }

  /** Known-vs-novel indel length histogram per annotation (cell 7/8's bar
    * chart data): lengths 1..20, Freq typed numeric. */
  def indelLengthHistogram(hist: DataFrame): DataFrame =
    hist.select(
        col("JexlExpression").as("annotation"), col("Novelty").as("novelty"),
        col("Length").cast("int").as("length"),
        col("Freq").cast("double").as("freq"))
      .filter(col("novelty").isin("known", "novel") && col("length").between(1, 20))

  /** Parse a bcftools-stats-style allele-frequency section ("AF"-prefixed
    * whitespace rows) into the typed frame of cell 11's
    * `read_allele_freq_df` — tagged `novelty` so known+novel land in one
    * table. Distributed `spark.read.text`, no driver-side line loop. */
  def alleleFreqTable(spark: SparkSession, paths: Map[String, String]): DataFrame =
    paths.map { case (novelty, path) =>
      spark.read.text(path)
        .filter(col("value").startsWith("AF"))
        .select(split(col("value"), "\\s+").as("f"))
        .select(
          lit(novelty).as("novelty"),
          element_at(col("f"), 3).cast("double").as("allele_frequency"),
          element_at(col("f"), 4).cast("double").as("n_snps"),
          element_at(col("f"), 5).cast("double").as("n_transitions"),
          element_at(col("f"), 6).cast("double").as("n_transversions"),
          element_at(col("f"), 7).cast("double").as("n_indels"),
          element_at(col("f"), 8).cast("double").as("repeat_consistent"),
          element_at(col("f"), 9).cast("double").as("repeat_inconsistent"),
          element_at(col("f"), 10).cast("double").as("not_applicable"))
    }.reduce(_ unionByName _)

  /** The jc report tables. `alleleFreq` is optional (pre-parsed via
    * [[alleleFreqTable]] or any equivalent frame). */
  def tables(indelSummary: DataFrame, variantSummary: DataFrame,
             multiallelicSummary: DataFrame, indelLengthHist: DataFrame,
             alleleFreq: Option[DataFrame] = None): Map[String, DataFrame] =
    Map(
      "jc_variant_statistics" ->
        variantStatistics(indelSummary, variantSummary, multiallelicSummary),
      "jc_indel_length_histogram" -> indelLengthHistogram(indelLengthHist)) ++
      alleleFreq.map("jc_allele_freq" -> _)
}
