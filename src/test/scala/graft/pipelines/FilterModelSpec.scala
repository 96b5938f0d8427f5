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
}
