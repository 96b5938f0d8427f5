package graft.reports

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** One-call registration of the whole report layer (§3.3) — the notebook
  * surface (createQCReport.ipynb, substitution_error_rate_report.ipynb,
  * run_no_gt_report.py, evaluate_concordance.py,
  * mrd_automatic_data_analysis.ipynb, joint_calling_report.ipynb,
  * detailedVarReport.v0.ipynb) as temp views, so every report query is
  * plain SQL over named tables. Pass whichever inputs the session has;
  * each present input registers its report's tables and the returned list
  * names exactly the views created.
  *
  *  - `concordance` → VarReport: accuracy_metrics, recall_precision_curve,
  *    optimal_recall_precision
  *  - `variants` → NoGtReport: motif_spectrum, af_histogram,
  *    indel_histogram
  *  - `qc` → QcReport: qc_throughput, qc_coverage, qc_error,
  *    qc_top_metrics
  *  - `motifs` → SubErrorRate: strand_matched_errors, error_rate_summary,
  *    cycle_skip_asymmetry
  *  - `mrd` → MrdReport: mrd_mutation_type_spectrum,
  *    mrd_allele_fraction_hist, mrd_denom_ratio, the three
  *    mrd_tf_* tumor-fraction variants, mrd_supporting_reads_per_locus,
  *    mrd_read_length_dist
  *  - `jointCalling` → JointCallingReport: jc_variant_statistics,
  *    jc_indel_length_histogram [, jc_allele_freq]
  *  - `detailed` → DetailedVarReport: detailed_vars
  */
object Reports {

  /** QcReport's input bundle: the parsed Picard metrics long frame plus
    * the raw/high-quality coverage histograms and the bead total. */
  case class QcInputs(metrics: DataFrame, cvgRaw: DataFrame,
                      cvgHq: DataFrame, totalBeads: Double)

  /** MrdReport's input bundle (see [[MrdReport.tables]]). */
  case class MrdInputs(features: DataFrame, signatures: DataFrame,
                       featuremapLabeled: DataFrame,
                       readFilter: Column, signatureFilter: Column)

  /** JointCallingReport's input bundle: the three VariantEval long frames
    * + the indel-length histogram [+ a pre-parsed allele-freq frame]. */
  case class JcInputs(indelSummary: DataFrame, variantSummary: DataFrame,
                      multiallelicSummary: DataFrame, indelLengthHist: DataFrame,
                      alleleFreq: Option[DataFrame] = None)

  /** DetailedVarReport's input bundle: the classified concordance frame +
    * the configured (label, membership) region columns. */
  case class DetailedInputs(data: DataFrame, regions: Seq[(String, Column)])

  def registerAll(spark: SparkSession,
                  concordance: Option[DataFrame] = None,
                  variants: Option[DataFrame] = None,
                  qc: Option[QcInputs] = None,
                  motifs: Option[DataFrame] = None,
                  mrd: Option[MrdInputs] = None,
                  jointCalling: Option[JcInputs] = None,
                  detailed: Option[DetailedInputs] = None): Seq[String] = {
    val tables: Seq[(String, DataFrame)] =
      concordance.toSeq.flatMap(VarReport.tables(_).toSeq) ++
        variants.toSeq.flatMap(NoGtReport.tables(_).toSeq) ++
        qc.toSeq.flatMap(q =>
          QcReport.tables(q.metrics, q.cvgRaw, q.cvgHq, q.totalBeads).toSeq) ++
        motifs.toSeq.flatMap(SubErrorRate.tables(_).toSeq) ++
        mrd.toSeq.flatMap(m => MrdReport.tables(m.features, m.signatures,
          m.featuremapLabeled, m.readFilter, m.signatureFilter).toSeq) ++
        jointCalling.toSeq.flatMap(j => JointCallingReport.tables(
          j.indelSummary, j.variantSummary, j.multiallelicSummary,
          j.indelLengthHist, j.alleleFreq).toSeq) ++
        detailed.toSeq.flatMap(d =>
          DetailedVarReport.tables(d.data, d.regions).toSeq)
    tables.foreach { case (name, df) => df.createOrReplaceTempView(name) }
    tables.map(_._1)
  }
}
