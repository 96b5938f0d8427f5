package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The reference's OWN inline golden values, transcribed verbatim
  * (test/unit/utils/test_stats_utils.py, test_math_utils.py) — the
  * "matches the reference's results on its own test queries" evidence. */
class ReferenceGoldensSpec extends SparkSpec {
  import spark.implicits._

  private def scale(table: Seq[Long], n: Int): Seq[Long] =
    Seq(Tuple1(table)).toDF("arr")
      .select(Stats.scaleContingencyTable(col("arr"), lit(n)))
      .head.getSeq[Long](0).toSeq

  test("scale_contingency_table goldens (test_stats_utils.py:18-41)") {
    val uniform = Seq(1L, 1L, 1L)
    assert(scale(uniform, 2) == Seq(1L, 1L, 1L))
    assert(scale(uniform, 3) == Seq(1L, 1L, 1L))
    assert(scale(uniform, 4) == Seq(1L, 1L, 1L))
    assert(scale(uniform, 5) == Seq(2L, 2L, 2L))
    assert(scale(uniform, 6) == Seq(2L, 2L, 2L))
    assert(scale(uniform, 7) == Seq(2L, 2L, 2L))
    assert(scale(uniform, 9) == Seq(3L, 3L, 3L))
    val tens = Seq(10L, 10L, 10L)
    assert(scale(tens, 2) == Seq(1L, 1L, 1L))
    assert(scale(tens, 9) == Seq(3L, 3L, 3L))
    assert(scale(Seq(10L, 20L, 25L), 100) == Seq(18L, 36L, 45L))
    assert(scale(Seq(10L, 20L, 25L), 10) == Seq(2L, 4L, 5L))
  }

  test("correct_multinomial_frequencies goldens (test_stats_utils.py:43-49)") {
    assert(Stats.correctFrequencies(Seq(10L, 10L, 10L)) == Seq(1.0 / 3, 1.0 / 3, 1.0 / 3))
    assert(Stats.correctFrequencies(Seq(10L, 10L, 0L)) == Seq(11.0 / 23, 11.0 / 23, 1.0 / 23))
  }

  test("multinomial_likelihood goldens (test_stats_utils.py:51-72)") {
    def ml(a: Seq[Long], e: Seq[Long]) = Stats.multinomialLikelihood(a, e)
    assert(math.abs(ml(Seq(4, 4, 4), Seq(4, 4, 4)) - 0.0652) < 5e-4)
    assert(math.abs(ml(Seq(4, 4, 4), Seq(40, 40, 40)) - 0.0652) < 5e-4)
    assert(math.abs(ml(Seq(40, 40, 40), Seq(40, 40, 40)) - 0.0068) < 5e-4)
    assert(math.abs(ml(Seq(4, 4, 40), Seq(4, 4, 4)) - 3.3e-13) < 5e-11)
    assert(math.abs(ml(Seq(10, 10, 10), Seq(1, 10, 40)) - 2.1e-10) < 5e-11)
    assert(math.abs(ml(Seq(40, 10, 1), Seq(1, 10, 40)) - 2.7e-53) < 1e-41)
    assert(math.abs(ml(Seq(1, 10, 40), Seq(1, 10, 40)) - 0.039) < 5e-4)
    // add-one correction: a zero expected count doesn't zero the likelihood
    assert(math.abs(ml(Seq(4, 4, 4), Seq(4, 4, 0)) - 0.0043) < 5e-4)
    assert(math.abs(ml(Seq(4, 4, 40), Seq(0, 0, 0)) - 3.3e-13) < 5e-4)
  }

  test("multinomial_likelihood_ratio goldens (test_stats_utils.py:74-110)") {
    def mr(a: Seq[Long], e: Seq[Long]) = Stats.multinomialLikelihoodRatio(a, e)
    assert(math.abs(mr(Seq(4, 4, 4), Seq(4, 4, 4)) - 1.0) < 5e-4)
    assert(math.abs(mr(Seq(4, 4, 4), Seq(40, 40, 40)) - 1.0) < 5e-4)
    assert(math.abs(mr(Seq(4, 4, 40), Seq(4, 4, 4)) - 3.3e-13) < 5e-11)
    assert(math.abs(mr(Seq(10, 10, 10), Seq(1, 10, 40)) - 7.8e-9) < 5e-10)
    assert(math.abs(mr(Seq(40, 10, 1), Seq(1, 10, 40)) - 6.9e-52) < 1e-41)
    assert(math.abs(mr(Seq(1, 10, 40), Seq(1, 10, 40)) - 1.0) < 5e-4)
    assert(math.abs(mr(Seq(4, 4, 4), Seq(4, 4, 0)) - 0.0661) < 5e-4)
    assert(math.abs(mr(Seq(4, 4, 40), Seq(0, 0, 0)) - 9.1e-12) < 5e-11)
  }

  test("precision/recall/f1 goldens (test_stats_utils.py:112-122)") {
    def eval1(c: org.apache.spark.sql.Column): Double =
      spark.range(1).select(c).head.getDouble(0)
    assert(eval1(Genomics.precisionScore(lit(900L), lit(100L))) == 0.9)
    assert(math.abs(eval1(Genomics.precisionScore(lit(900L), lit(1L))) - 0.99889) < 5e-6)
    assert(eval1(Genomics.recallScore(lit(900L), lit(100L))) == 0.9)
    assert(math.abs(eval1(Genomics.recallScore(lit(900L), lit(1L))) - 0.99889) < 5e-6)
    assert(math.abs(eval1(Genomics.f1Score(lit(0.9), lit(0.99))) - 0.942857) < 5e-7)
    assert(math.abs(eval1(Genomics.f1Score(lit(0.9), lit(0.5))) - 0.642857) < 5e-7)
  }

  test("phred string codec goldens (test_math_utils.py:10-23)") {
    assert(Genomics.phredStr(Seq(0.1, 0.01, 0.001)) == "+5?")
    val back = Genomics.unphredStr("+5?")
    assert(back.zip(Seq(0.1, 0.01, 0.001)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    // Column bindings
    val viaUdf = Seq(Tuple1(Seq(0.1, 0.01, 0.001))).toDF("p")
      .select(Genomics.phredStrUdf(col("p"))).head.getString(0)
    assert(viaUdf == "+5?")
  }
}
