package graft.pipelines

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.{GBTClassificationModel, GBTClassifier, RandomForestClassificationModel, RandomForestClassifier}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.PipelineModel
import org.apache.spark.ml.tree.{CategoricalSplit, ContinuousSplit, GraftTreeShim, InternalNode, LeafNode, Node}
import org.apache.spark.sql.{Column, DataFrame}
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

  /** One decision tree compiled to a nested when/otherwise Column over the
    * raw feature columns. Split semantics mirror `Node.predictImpl`:
    * continuous goes left on `feature <= threshold`, categorical on set
    * membership. Null/NaN agree with the ml path by construction — the
    * assembler's handleInvalid="keep" turns null into NaN, and
    * `NaN <= t` is false both in Java and in Spark SQL (NaN sorts above
    * every value), while a SQL null predicate is falsy in `when` — so all
    * three land in the right child exactly as predictImpl does. */
  private def treeColumn(root: Node, features: IndexedSeq[Column],
                         leaf: LeafNode => Double): Column = root match {
    case l: LeafNode => lit(leaf(l))
    case n: InternalNode =>
      val goLeft = n.split match {
        case s: ContinuousSplit => features(s.featureIndex) <= lit(s.threshold)
        case s: CategoricalSplit =>
          features(s.featureIndex).isin(s.leftCategories.map(Double.box).toIndexedSeq: _*)
      }
      when(goLeft, treeColumn(n.leftChild, features, leaf))
        .otherwise(treeColumn(n.rightChild, features, leaf))
  }

  /** P(true variant) as a PURE Catalyst expression compiled from the
    * trained ensemble — the inference fast path for scoring a full-scale
    * callset. `model.transform` is already map-only, but it assembles a
    * Vector object per row and walks JVM tree objects outside codegen;
    * the compiled form needs no assembled vector (the scan prunes to the
    * feature columns alone) and evaluates as fused when/otherwise chains
    * inside whole-stage codegen.
    *
    * RF replays `predictRaw`: each tree votes its leaf's normalized class
    * distribution, and probability = votes/numTrees (every trained leaf
    * has a nonzero count total, so the vote-sum normalizer is numTrees).
    * GBT replays the logistic margin: P(1) = 1/(1+e^(-2·Σ wᵢ·treeᵢ(x))). */
  def probabilityExpr(model: PipelineModel): Column = {
    val assembler = model.stages.collectFirst { case a: VectorAssembler => a }
      .getOrElse(throw new IllegalArgumentException("no VectorAssembler stage"))
    val feats = assembler.getInputCols.toIndexedSeq.map(c => col(c).cast("double"))
    model.stages.last match {
      case rf: RandomForestClassificationModel =>
        rf.trees.map { t =>
          treeColumn(t.rootNode, feats, { l =>
            val counts = GraftTreeShim.classCounts(l)
            val total = counts.sum
            if (total == 0) 0.0 else counts(1) / total
          })
        }.reduce(_ + _) / lit(rf.getNumTrees.toDouble)
      case gbt: GBTClassificationModel =>
        val margin = gbt.trees.zip(gbt.treeWeights).map { case (t, w) =>
          treeColumn(t.rootNode, feats, _.prediction) * lit(w)
        }.reduce(_ + _)
        lit(1.0) / (lit(1.0) + exp(lit(-2.0) * margin))
      case other =>
        throw new IllegalArgumentException(s"unsupported model ${other.getClass}")
    }
  }

  /** [[score]] through [[probabilityExpr]] — same contract, no ml runtime
    * in the scoring job at all (the model is compiled into the plan on the
    * driver; executors see only Catalyst expressions). */
  def scoreCompiled(model: PipelineModel, df: DataFrame,
                    threshold: Double = 0.5): DataFrame =
    applyScoreContract(df, probabilityExpr(model), threshold)
}
