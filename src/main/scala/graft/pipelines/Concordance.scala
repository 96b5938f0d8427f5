package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Genomics
import graft.operators.Ordered

/** Concordance evaluation (reference: ugvc/pipelines/evaluate_concordance.py
  * :71-108 + report_utils.py:415-505): a wide per-variant frame with
  * call/base labels and a score column → per-stratum accuracy metrics and
  * recall/precision curves.
  *
  * Strata are expressed as the reference's named predicate library
  * (report_utils.py:507-538): each row is tagged with every category it
  * belongs to via a single explode, then ONE shuffle computes every
  * stratum's confusion aggregate (instead of the reference's loop of
  * full-frame scans per category).
  */
object Concordance {

  /** The reference's standard variant strata over a concordance frame with
    * boolean columns `indel` and long `hmer_indel_length`. */
  def defaultStrata: Map[String, Column] = Map(
    "SNP" -> !col("indel"),
    "INDEL" -> col("indel"),
    "NON_HMER_INDEL" -> (col("indel") && col("hmer_indel_length") === 0),
    "HMER_INDEL_1_4" -> (col("indel") && col("hmer_indel_length").between(1, 4)),
    "HMER_INDEL_5_PLUS" -> (col("indel") && col("hmer_indel_length") >= 5))

  /** Tag each row with all strata it satisfies (+ ALL), one explode. */
  def tagStrata(df: DataFrame, strata: Map[String, Column] = defaultStrata): DataFrame = {
    val cats = array(
      lit("ALL") +: strata.toSeq.sortBy(_._1).map { case (name, pred) =>
        when(pred, lit(name))
      }: _*)
    df.withColumn("category", explode(filter(cats, c => c.isNotNull)))
  }

  /** A11/A12 — confusion aggregate per stratum: tp/fp/fn counts →
    * precision (the reference's 1 - fp/(fp+tp)), recall, F1. `tp`/`fp`/`fn`
    * are boolean columns (classify labels already computed upstream). */
  def accuracyMetrics(df: DataFrame,
                      strata: Map[String, Column] = defaultStrata): DataFrame = {
    val agg = tagStrata(df, strata)
      .groupBy("category")
      .agg(sum(col("tp").cast("long")).as("tp"),
           sum(col("fp").cast("long")).as("fp"),
           sum(col("fn").cast("long")).as("fn"))
    val p = Genomics.precisionScore(col("tp"), col("fp"))
    val r = Genomics.recallScore(col("tp"), col("fn"))
    agg.select(col("category"), col("tp"), col("fp"), col("fn"),
      round(p, 6).as("precision"), round(r, 6).as("recall"),
      round(Genomics.f1Score(p, r), 6).as("f1"))
  }

  /** M3/W1 — recall/precision curve per stratum over `score`, with the
    * reference's noise floor: curve points with fewer than `minCalls`
    * remaining calls are suppressed (stats_utils.py:162-163,202-210).
    *
    * Runs on [[Ordered.prCurveAuto]] (r16): a small filtered callset takes
    * the plain exact window, a fact-scale one the two-phase scalable form
    * — which is row-identical to the sequential [[Ordered.prCurve]]
    * (ConcordanceSpec proves it) but parallel over score-quantile buckets,
    * so evaluating a full-callset curve never funnels through one
    * reducer whichever regime fires. */
  def recallPrecisionCurve(df: DataFrame, minCalls: Long = 20): DataFrame = {
    val curve = Ordered.prCurveAuto(df.filter(col("tp") || col("fp")),
      col("score"), col("tp"), col("fp"), col("row_key"))
    curve.withColumn("n_calls", col("ctp") + col("cfp"))
      .filter(col("n_calls") >= minCalls)
      .select("rank", "score", "precision", "recall", "n_calls")
  }
}
