package graft.pipelines

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.{GBTClassifier, RandomForestClassifier}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** M1 — callset filtering model (reference: docs/train_models_pipeline.md:1-98,
  * docs/filter_variants_pipeline.md:1-47; implementation lives in the absent
  * ugbio_filtering submodule — semantics inferred from the docs: train an
  * RF/GBT on labeled concordance rows, apply to produce `tree_score` and a
  * PASS / LOW_SCORE filter status).
  *
  * Spark-first: `spark.ml` Pipeline (VectorAssembler + RandomForest),
  * trained on the distributed concordance frame directly — no driver-side
  * collect; scoring is `model.transform`, a map-only stage at any scale.
  */
object FilterModel {

  val defaultFeatures: Seq[String] =
    Seq("qual", "dp", "gq", "gc_content", "hmer_indel_length")

  /** Train on rows labeled `label` (1.0 = true variant / TP, 0.0 = FP). */
  def train(labeled: DataFrame, features: Seq[String] = defaultFeatures,
            numTrees: Int = 40, maxDepth: Int = 6, seed: Long = 42L): PipelineModel = {
    val assembler = new VectorAssembler()
      .setInputCols(features.toArray).setOutputCol("features")
      .setHandleInvalid("keep")
    val rf = new RandomForestClassifier()
      .setLabelCol("label").setFeaturesCol("features")
      .setNumTrees(numTrees).setMaxDepth(maxDepth).setSeed(seed)
      .setProbabilityCol("prob")
    new Pipeline().setStages(Array(assembler, rf)).fit(labeled)
  }

  /** M2 — gradient-boosted variant: the library-prep recalibration
    * pipeline trains an XGBoost classifier on the same labeled frame
    * (ugvc/pipelines/lpr/train_lib_prep_recalibration_model.py:128-145 via
    * its training notebook); Spark-first that is `GBTClassifier` —
    * sequential boosted trees with the same assembler/score contract, so
    * [[score]] works on either model unchanged. */
  def trainGbt(labeled: DataFrame, features: Seq[String] = defaultFeatures,
               maxIter: Int = 40, maxDepth: Int = 5, seed: Long = 42L): PipelineModel = {
    val assembler = new VectorAssembler()
      .setInputCols(features.toArray).setOutputCol("features")
      .setHandleInvalid("keep")
    val gbt = new GBTClassifier()
      .setLabelCol("label").setFeaturesCol("features")
      .setMaxIter(maxIter).setMaxDepth(maxDepth).setSeed(seed)
      .setProbabilityCol("prob")
    new Pipeline().setStages(Array(assembler, gbt)).fit(labeled)
  }

  /** The scoring CONTRACT every model shares: `tree_score` = P(true
    * variant) rounded to 6 dp, `filter_status` = PASS iff tree_score >=
    * threshold (filter_variants_pipeline.md:21-38). Factored out of
    * [[score]] so the contract itself is DuckDB-oracle-gated
    * (`ml1_filter_score`, frozen stump model) even though ml TRAINING can
    * only be spec-gated. */
  def applyScoreContract(df: DataFrame, p1: org.apache.spark.sql.Column,
                         threshold: Double): DataFrame =
    df.withColumn("tree_score", round(p1, 6))
      .withColumn("filter_status",
        when(col("tree_score") >= threshold, "PASS").otherwise("LOW_SCORE"))

  /** Score: add `tree_score` (P(true variant)) and `filter_status`
    * (PASS / LOW_SCORE at the given threshold), dropping ml temp columns. */
  def score(model: PipelineModel, df: DataFrame, threshold: Double = 0.5): DataFrame = {
    val p1 = element_at(vector_to_array(col("prob")), 2)
    applyScoreContract(model.transform(df), p1, threshold)
      .drop("features", "rawPrediction", "prob", "prediction")
  }

  private def vector_to_array(c: org.apache.spark.sql.Column) =
    org.apache.spark.ml.functions.vector_to_array(c)
}
