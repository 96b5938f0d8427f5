package graft.reports

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipelines.Concordance
import graft.sources.MultiTable

/** Report/query layer (SURVEY.md §3.3, §7.1 step 8): the reference's
  * papermill notebooks (createVarReport.ipynb, report_wo_gt.ipynb) are pure
  * read-side queries over the keyed result stores. Here they are (a) a set
  * of named result tables computed from the concordance frame and written
  * through the keyed MultiTable store, and (b) SQL views registered on a
  * session so the same questions run as `spark.sql` — the notebook layer
  * without the notebook.
  */
object VarReport {

  /** The tables `basic_analysis` produces per run
    * (report_utils.py:67-106): stratified accuracy, the P/R curve, and the
    * optimal operating point per stratum. Input: concordance frame with
    * tp/fp/fn booleans, score double, row_key, indel/hmer columns. */
  def tables(concordance: DataFrame): Map[String, DataFrame] = {
    val metrics = Concordance.accuracyMetrics(concordance)
    val curve = Concordance.recallPrecisionCurve(concordance)
    val optimal = curve
      .withColumn("f1",
        when(col("precision") + col("recall") === 0, 0.0)
          .otherwise(lit(2.0) * col("precision") * col("recall") /
            (col("precision") + col("recall"))))
      .orderBy(col("f1").desc, col("rank").asc)
      .limit(1)
      .select(col("score").as("optimal_score"), col("precision"), col("recall"), col("f1"))
    Map(
      "accuracy_metrics" -> metrics,
      "recall_precision_curve" -> curve,
      "optimal_recall_precision" -> optimal)
  }

  /** Write all report tables through the keyed store (the reference's
    * evaluate_concordance.py:100-105 HDF5 sink shape). */
  def write(concordance: DataFrame, path: String): Unit =
    MultiTable.write(tables(concordance), path)

  /** Register the tables as temp views so report queries are plain SQL:
    * e.g. `SELECT * FROM accuracy_metrics WHERE category = 'SNP'`. */
  def registerViews(spark: SparkSession, concordance: DataFrame): Unit =
    tables(concordance).foreach { case (name, df) => df.createOrReplaceTempView(name) }
}
