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

  test("graft_dot nulls the result on a null ELEMENT, matching the composed fold") {
    // r17: norm() routes through graft_dot, so the expression must
    // reproduce the fold's null-propagation (acc + null = null) instead of
    // reading the slot as primitive garbage — a null-element vector must
    // yield a null nrm and fall out at vecs()'s ingest gate, as before.
    val df = Seq(
      (Seq(Some(1.0), None, Some(3.0)), Seq(Some(4.0), Some(5.0), Some(6.0))),
      (Seq(Some(1.0), Some(2.0)), Seq(Some(4.0), Some(5.0)))
    ).toDF("a", "b")
    val native = df.select(call_function("graft_dot", col("a"), col("b"))).collect()
    val folded = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (s, v) => s + v))
      .collect()
    assert(native(0).isNullAt(0) && folded(0).isNullAt(0))
    assert(native(1).getDouble(0) == 14.0 && folded(1).getDouble(0) == 14.0)
    // a null element BEYOND the folded prefix (length mismatch) does not
    // null the result — only consumed slots count
    val beyond = Seq((Seq(Some(2.0)), Seq(Some(3.0), None))).toDF("a", "b")
    assert(beyond.select(call_function("graft_dot", col("a"), col("b")))
      .head.getDouble(0) == 6.0)
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
