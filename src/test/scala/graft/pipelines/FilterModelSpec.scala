package graft.pipelines

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FilterModelSpec extends SparkSpec {
  import spark.implicits._

  // separable synthetic concordance rows: TPs have high qual/gq, FPs low
  private def fixture = {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 400).map { i =>
      val tp = i % 2 == 0
      val qual = if (tp) 60 + rnd.nextInt(40) else rnd.nextInt(30)
      val gq = if (tp) 70 + rnd.nextInt(30) else rnd.nextInt(40)
      (i.toLong, qual.toDouble, 20.0 + rnd.nextInt(20), gq.toDouble,
        0.3 + rnd.nextDouble() * 0.4, rnd.nextInt(5).toDouble,
        if (tp) 1.0 else 0.0)
    }
    rows.toDF("row_id", "qual", "dp", "gq", "gc_content", "hmer_indel_length", "label")
  }

  private def assertSeparates(scored: org.apache.spark.sql.DataFrame): Unit = {
    assert(scored.columns.contains("tree_score") && scored.columns.contains("filter_status"))
    // resubstitution accuracy on cleanly separable data should be near-perfect
    val acc = scored.filter(
      (col("label") === 1.0 && col("filter_status") === "PASS") ||
      (col("label") === 0.0 && col("filter_status") === "LOW_SCORE"))
      .count().toDouble / 400
    assert(acc > 0.95, s"accuracy $acc")
    // scores are probabilities
    val mm = scored.agg(min("tree_score"), max("tree_score")).head
    assert(mm.getDouble(0) >= 0.0 && mm.getDouble(1) <= 1.0)
  }

  test("train + score separates planted TP/FP structure (M1)") {
    val df = fixture
    assertSeparates(FilterModel.score(FilterModel.train(df), df))
  }

  test("GBT variant separates the same structure through the same score contract (M2)") {
    val df = fixture
    assertSeparates(FilterModel.score(FilterModel.trainGbt(df, maxIter = 20), df))
  }

  // the compiled Catalyst scorer must be a drop-in for model.transform:
  // same tree_score (to the contract's 6 dp) and same filter_status on
  // every row, for both ensemble types
  private def assertCompiledMatches(model: org.apache.spark.ml.PipelineModel): Unit = {
    val df = fixture
    val viaMl = FilterModel.score(model, df)
      .select("row_id", "tree_score", "filter_status")
    val viaExpr = FilterModel.scoreCompiled(model, df)
      .select("row_id", "tree_score", "filter_status")
    assert(viaExpr.exceptAll(viaMl).isEmpty && viaMl.exceptAll(viaExpr).isEmpty)
  }

  test("compiled RF scorer equals the spark.ml scoring path row-for-row") {
    assertCompiledMatches(FilterModel.train(fixture))
  }

  test("compiled GBT scorer equals the spark.ml scoring path row-for-row") {
    assertCompiledMatches(FilterModel.trainGbt(fixture, maxIter = 20))
  }

  // ---- M2 closure: calibration equivalence of the GBT stand-in with the
  // reference's XGBoost (train_lib_prep_recalibration_model.py:128-145,
  // binary:logistic). Both families score sigmoid(additive tree margin):
  // XGBoost  P = 1 / (1 + e^(-Σ leaf_i(x)))         (leaves ARE margins)
  // sparkGBT P = 1 / (1 + e^(-2·Σ w_i·tree_i(x)))   (±1 trees, weights)
  // so an XGBoost ensemble is EXACTLY a GBT ensemble with leaf values
  // halved into the weights and vice versa — same probability family,
  // not an approximation. The property pins that isomorphism on a frozen
  // stump ensemble: scoring through both formulas is bit-identical once
  // leaves are mapped leaf = 2·w·value.
  test("M2: XGBoost logistic-margin semantics are expressible as the GBT score, exactly") {
    // frozen stumps: (featureIdx, threshold, leftValue, rightValue, weight)
    val stumps = Seq(
      (0, 45.0, -0.7, 0.9, 1.0),
      (2, 55.0, -0.4, 0.6, 0.7),
      (1, 30.0, 0.2, -0.3, 0.5),
      (3, 0.5, -0.1, 0.15, 1.0))
    val grid = for {
      q <- BigDecimal(0.0) to BigDecimal(100.0) by 7.0; dp <- Seq(10.0, 25.0, 40.0)
      gq <- Seq(10.0, 60.0, 90.0); gc <- Seq(0.3, 0.6)
    } yield (q.toDouble, dp, gq, gc)
    grid.foreach { case (q, dp, gq, gc) =>
      val x = Array(q, dp, gq, gc)
      def stumpVal(s: (Int, Double, Double, Double, Double)): Double =
        if (x(s._1) <= s._2) s._3 else s._4
      // spark.ml GBT form: trees return values, margin = 2 * Σ w·t(x)
      val gbtP = 1.0 / (1.0 + math.exp(-2.0 * stumps.map(s => s._5 * stumpVal(s)).sum))
      // XGBoost form: leaves are margins, P = sigmoid(Σ leaf(x)), with
      // leaf = 2·w·value — the exact isomorphism
      val xgbP = 1.0 / (1.0 + math.exp(
        -stumps.map(s => 2.0 * s._5 * stumpVal(s)).sum))
      assert(gbtP == xgbP, s"margin isomorphism broke at ${x.toSeq}")
    }
  }

  // ...and the trained stand-in actually CALIBRATES: on data with planted
  // class structure, decile-bucketed tree_score tracks the empirical TP
  // fraction — the property the reference's recalibration model exists
  // for (its notebook's reliability check). A score that separates but
  // mis-calibrates would pass the accuracy gate and fail here.
  test("M2: trained GBT tree_score is calibrated against empirical TP fraction") {
    val rnd = new scala.util.Random(11)
    // non-separable mixture: P(tp | qual) rises smoothly with qual, so
    // calibration is measurable (a separable fixture pins scores to 0/1)
    val rows = (1 to 4000).map { i =>
      val qual = rnd.nextDouble() * 100
      val pTp = qual / 100.0
      val tp = rnd.nextDouble() < pTp
      (i.toLong, qual, 20.0 + rnd.nextInt(20).toDouble, 50.0 + rnd.nextInt(10).toDouble,
        0.5, 1.0, if (tp) 1.0 else 0.0)
    }
    val df = rows.toDF("row_id", "qual", "dp", "gq", "gc_content", "hmer_indel_length", "label")
    val scored = FilterModel.score(FilterModel.trainGbt(df, maxIter = 30, maxDepth = 3), df)
    val buckets = scored
      .groupBy(least(floor(col("tree_score") * 10), lit(9L)).as("decile"))
      .agg(avg("tree_score").as("mean_score"), avg("label").as("tp_frac"),
        count(lit(1)).as("n"))
      .filter(col("n") >= 100) // small buckets are noise, not signal
      .collect()
    assert(buckets.length >= 5, "score spans multiple deciles")
    buckets.foreach { r =>
      val (ms, tf) = (r.getAs[Double]("mean_score"), r.getAs[Double]("tp_frac"))
      assert(math.abs(ms - tf) < 0.1,
        f"decile ${r.getAs[Long]("decile")}: mean score $ms%.3f vs empirical $tf%.3f")
    }
  }

  test("compiled scorer handles nulls the way handleInvalid=keep does") {
    val model = FilterModel.train(fixture)
    val withNulls = fixture
      .withColumn("qual", when(col("row_id") % 5 === 0, lit(null)).otherwise(col("qual")))
      .withColumn("gq", when(col("row_id") % 7 === 0, lit(null)).otherwise(col("gq")))
    val viaMl = FilterModel.score(model, withNulls)
      .select("row_id", "tree_score", "filter_status")
    val viaExpr = FilterModel.scoreCompiled(model, withNulls)
      .select("row_id", "tree_score", "filter_status")
    assert(viaExpr.exceptAll(viaMl).isEmpty && viaMl.exceptAll(viaExpr).isEmpty)
  }
}
