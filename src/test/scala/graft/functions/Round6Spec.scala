package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bit-identity of the native guard-band Round6 against Spark's
  * BigDecimal round(x, 6) — including the exact-decimal-half values where
  * shortest-decimal-vs-binary rounding flips the last digit (the class
  * behind NOTES sharp edge #2). */
class Round6Spec extends SparkSpec {
  import spark.implicits._

  test("graft_round6 == round(x, 6) on adversarial + random doubles") {
    assert(spark.catalog.functionExists("graft_round6"), "extension not registered")
    val rnd = new scala.util.Random(0x66)
    val adversarial = Seq(
      0.0, -0.0, 1.0, -1.0,
      0.5046875,            // exact half at 6 dp (129200/256000)
      -0.5046875,
      0.0000005, -0.0000005, // |x| rounding to ±1e-6 vs 0
      0.9999995, 1.0000005,
      123.4567895, -123.4567895,
      1e-7, -1e-7, 1e6 + 0.5, -(1e6 + 0.5), 1e9, -1e9,
      Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      Double.MinPositiveValue, Double.MaxValue, -Double.MaxValue) ++
      // halves with binary jitter on either side of the boundary
      (1 to 50).flatMap { k =>
        val h = k + 0.5
        Seq(h / 1e6, (h + 1e-13) / 1e6, (h - 1e-13) / 1e6, -h / 1e6)
      } ++
      // exact-decimal halves ACROSS MAGNITUDES up to |x| = 1e6: at
      // |x| ≳ 4.5e3, ulp(x*1e6) exceeds a fixed 1e-6 band, so these
      // catch a guard band that fails to scale with magnitude
      // (regression for the ADVICE r10 finding, e.g. x=33546.9128745)
      Seq(33546.9128745) ++
      (0 to 11).flatMap { m =>
        val rj = new scala.util.Random(m * 7 + 1)
        (1 to 40).flatMap { _ =>
          val k = rj.nextInt(9) + 1   // k*10^m + 0.5 halves at scale 1e-6
          val h = (k * math.pow(10, m) + 0.5) / 1e6
          Seq(h, -h, h * (1 + 2e-16), h * (1 - 2e-16),
            // non-half neighbors at the same magnitude
            h + rj.nextDouble() / 1e6, h - rj.nextDouble() / 1e6)
        }
      } ++
      (1 to 2000).map(_ => (rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(10) - 3))
    val df = adversarial.toDF("x")
    val diff = df.select(
        call_function("graft_round6", col("x")).as("native"),
        round(col("x"), 6).as("spark"))
      .filter(not(col("native") <=> col("spark"))).collect()
    assert(diff.isEmpty,
      s"native round6 diverged: ${diff.take(5).mkString(", ")}")
    // null passthrough
    assert(Seq[Option[Double]](None).toDF("x")
      .select(call_function("graft_round6", col("x"))).head.isNullAt(0))
  }
}
