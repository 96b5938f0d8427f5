package graft.reports

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Genomics
import graft.pipelines.MotifStats

/** No-ground-truth variant report (reference:
  * ugvc/pipelines/run_no_gt_report.py + report_wo_gt.ipynb): per-callset
  * statistics that need no truth set — substitution motif spectrum (A6),
  * allele-frequency histogram per variant type (A7), and the 2-D
  * insertion/deletion x hmer-length histogram (A9).
  *
  * Input frame: (ref, alt, left_motif, right_motif, af, gt array<int>,
  * hmer_indel_length). All tables are one groupBy each; the whole report is
  * three shuffles over arbitrarily large callsets.
  */
object NoGtReport {

  /** A6 — canonical 96-class substitution spectrum (SNVs only). */
  def motifSpectrum(variants: DataFrame): DataFrame =
    MotifStats.motifCounts(
      variants.filter(!Genomics.isIndel(col("ref"), col("alt"))))

  /** The reference's variant-type classes (run_no_gt_report.py): snp,
    * h-indel (homopolymer indel), non-h-indel. */
  def classifyVariantType(ref: Column, alt: Column, hmerLen: Column): Column =
    when(!Genomics.isIndel(ref, alt), "snp")
      .when(hmerLen > 0, "h-indel")
      .otherwise("non-h-indel")

  /** A7 — AF histogram in the DENSE 100-bin domain per variant type
    * (np.histogram(af, linspace(0,1,101)); golden
    * test_run_no_gt_report.py:15-30: every type emits exactly 100 bins,
    * zero-filled; af=0.1 lands in bin 10). Expects a `variant_type` column
    * (see [[classifyVariantType]]). */
  def afHistogram(variants: DataFrame): DataFrame = {
    val spark = variants.sparkSession
    import spark.implicits._
    val types = variants.select("variant_type").distinct()
    val domain = types.crossJoin((0L until 100L).toDF("af_bin"))
    val counts = variants
      .groupBy(col("variant_type"),
        least(floor(col("af") * 100), lit(99L)).as("af_bin"))
      .agg(count(lit(1)).as("n"))
    domain.join(counts, Seq("variant_type", "af_bin"), "left").na.fill(0L, Seq("n"))
  }

  /** A9 — indel class x zygosity x hmer length counts
    * (run_no_gt_report.py:44-69). */
  def indelHistogram(variants: DataFrame): DataFrame =
    variants
      .filter(Genomics.isIndel(col("ref"), col("alt")))
      .withColumn("indel_class", Genomics.indelClassify(col("ref"), col("alt")))
      .withColumn("zygosity",
        when(Genomics.isHom(col("gt")), "hom").otherwise("het"))
      .groupBy(col("indel_class"), col("zygosity"), col("hmer_indel_length"))
      .agg(count(lit(1)).as("n"))

  def tables(variants: DataFrame): Map[String, DataFrame] = Map(
    "motif_spectrum" -> motifSpectrum(variants),
    "af_histogram" -> afHistogram(variants.withColumn("variant_type",
      classifyVariantType(col("ref"), col("alt"), col("hmer_indel_length")))),
    "indel_histogram" -> indelHistogram(variants))

  def write(variants: DataFrame, path: String): Unit =
    graft.sources.MultiTable.write(tables(variants), path)

  /** VariantEval ingestion (run_no_gt_report.py:214-256): parse the GATK
    * report the external tool wrote and register each extracted table as a
    * temp view `eval_<TableName>`, so the no-GT report joins callset
    * statistics with VariantEval's comp/overlap tables in plain SQL. */
  def ingestVariantEval(spark: org.apache.spark.sql.SparkSession,
                        path: String): Map[String, DataFrame] = {
    val tables = graft.sources.GatkReport.read(spark, path)
    tables.foreach { case (name, df) =>
      df.createOrReplaceTempView(s"eval_$name")
    }
    tables
  }
}
