package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DotExprSpec extends SparkSpec {
  import spark.implicits._

  test("graft_dot equals the composed fold, in codegen and interpreted paths") {
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.5, -1.5), Seq(2.0, 2.0)),
      (Seq.empty[Double], Seq.empty[Double])
    ).toDF("a", "b")
    val native = df.select(call_function("graft_dot", col("a"), col("b"))).collect().map(_.getDouble(0))
    val folded = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (s, v) => s + v))
      .collect().map(_.getDouble(0))
    assert(native.toSeq == folded.toSeq)
    assert(native.toSeq == Seq(32.0, -2.0, 0.0))
  }

  test("graft_dot folds over the shorter prefix on length mismatch and is null-safe") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(10.0))).toDF("a", "b")
    assert(df.select(call_function("graft_dot", col("a"), col("b"))).head.getDouble(0) == 10.0)
    val withNull = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]])).toDF("a", "b")
    assert(withNull.select(call_function("graft_dot", col("a"), col("b"))).head.isNullAt(0))
  }

  test("graft_dot rejects wrong arity and non-array args at analysis time") {
    val df = Seq((Seq(1.0), "x")).toDF("a", "s")
    intercept[Exception] {
      df.select(call_function("graft_dot", col("a"))).collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("graft_dot", col("a"), col("s"))).collect()
    }
  }

  test("graft_dot reads array<float> natively (raw embeddings column type)") {
    val df = Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("a", "b")
    assert(df.select(call_function("graft_dot", col("a"), col("b")))
      .head.getDouble(0) == 11.0)
    // mixed float/double sides fold correctly too
    val mixed = Seq((Seq(1.0f, 2.0f), Seq(3.0, 4.0))).toDF("a", "b")
    assert(mixed.select(call_function("graft_dot", col("a"), col("b")))
      .head.getDouble(0) == 11.0)
  }
}
