package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimHashExprSpec extends SparkSpec {
  import spark.implicits._

  private def hashes(n: Int, seed: Long): Seq[Long] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(rnd.nextLong() & 0xffffffffL) // hash32 range
  }

  test("graft_simhash equals the per-bit HOF fold on random hash arrays") {
    val df = (1L to 50L).map(i => (i, hashes(1 + (i % 40).toInt, i)))
      .toDF("id", "h")
    val native = df.select(col("id"), call_function("graft_simhash", col("h"), lit(16)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val builtin = df.select(col("id"), Text.simhashBuiltin(col("h"), 16))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == builtin)
  }

  test("graft_simhash edge cases: empty array, null element, null array, ties") {
    val df = Seq(
      (1L, Some(Seq[Option[Long]]())),                    // empty -> 0
      (2L, Some(Seq[Option[Long]](Some(3L), None))),      // null elem -> 0 (HOF poisons bitsums)
      (3L, Option.empty[Seq[Option[Long]]]),              // null array -> 0 (HOF form collapses too)
      (4L, Some(Seq[Option[Long]](Some(1L), Some(2L))))   // ties: bit set iff count>0 strictly
    ).toDF("id", "h")
    val native = df.select(col("id"),
      call_function("graft_simhash", col("h"), lit(16)).as("s")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    val builtin = df.select(col("id"), Text.simhashBuiltin(col("h"), 16).as("s")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(native == builtin)
    assert(native(1L) == 0L && native(2L) == 0L && native(3L) == 0L)
  }

  test("graft_simhash rejects wrong arity, non-literal bits, and wrong types") {
    val df = Seq((Seq(1L, 2L), 16)).toDF("h", "b")
    intercept[Exception] {
      df.select(call_function("graft_simhash", col("h"))).collect()
    }
    intercept[Exception] {
      df.select(call_function("graft_simhash", col("h"), col("b"))).collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      val s = Seq((Seq("a", "b"))).toDF("h")
      s.select(call_function("graft_simhash", col("h"), lit(16))).collect()
    }
  }
}
