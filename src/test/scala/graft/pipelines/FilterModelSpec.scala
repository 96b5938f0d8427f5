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
