package graft.reports

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One-call registration of the whole report layer (§3.3) — the notebook
  * surface (createQCReport.ipynb, substitution_error_rate_report.ipynb,
  * run_no_gt_report.py, evaluate_concordance.py) as temp views, so every
  * report query is plain SQL over named tables. Pass whichever inputs the
  * session has; each present input registers its report's tables and the
  * returned list names exactly the views created.
  *
  *  - `concordance` → VarReport: accuracy_metrics, recall_precision_curve,
  *    optimal_recall_precision
  *  - `variants` → NoGtReport: motif_spectrum, af_histogram,
  *    indel_histogram
  *  - `qc` → QcReport: qc_throughput, qc_coverage, qc_error,
  *    qc_top_metrics
  *  - `motifs` → SubErrorRate: strand_matched_errors, error_rate_summary,
  *    cycle_skip_asymmetry
  */
object Reports {

  /** QcReport's input bundle: the parsed Picard metrics long frame plus
    * the raw/high-quality coverage histograms and the bead total. */
  case class QcInputs(metrics: DataFrame, cvgRaw: DataFrame,
                      cvgHq: DataFrame, totalBeads: Double)

  def registerAll(spark: SparkSession,
                  concordance: Option[DataFrame] = None,
                  variants: Option[DataFrame] = None,
                  qc: Option[QcInputs] = None,
                  motifs: Option[DataFrame] = None): Seq[String] = {
    val tables: Seq[(String, DataFrame)] =
      concordance.toSeq.flatMap(VarReport.tables(_).toSeq) ++
        variants.toSeq.flatMap(NoGtReport.tables(_).toSeq) ++
        qc.toSeq.flatMap(q =>
          QcReport.tables(q.metrics, q.cvgRaw, q.cvgHq, q.totalBeads).toSeq) ++
        motifs.toSeq.flatMap(SubErrorRate.tables(_).toSeq)
    tables.foreach { case (name, df) => df.createOrReplaceTempView(name) }
    tables.map(_._1)
  }
}
