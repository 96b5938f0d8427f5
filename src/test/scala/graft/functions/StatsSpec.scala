package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** F4/F5/F15/F16 golden values (test_stats_utils.py:18-110 style). */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("scaleContingencyTable rescales counts to target sum with rounding") {
    val out = Seq(Tuple1(Seq(1L, 1L, 2L))).toDF("arr")
      .select(Stats.scaleContingencyTable(col("arr"), lit(100)))
      .head.getSeq[Long](0)
    assert(out.toSeq == Seq(25L, 25L, 50L))
    // reference goldens (test_stats_utils.py:18-40)
    def scale(t: Seq[Long], n: Int): Seq[Long] =
      Seq(Tuple1(t)).toDF("arr")
        .select(Stats.scaleContingencyTable(col("arr"), lit(n)))
        .head.getSeq[Long](0).toSeq
    assert(scale(Seq(1L, 1L, 1L), 4) == Seq(1L, 1L, 1L))
    assert(scale(Seq(1L, 1L, 1L), 5) == Seq(2L, 2L, 2L))
    assert(scale(Seq(10L, 20L, 25L), 100) == Seq(18L, 36L, 45L))
    assert(scale(Seq(10L, 20L, 25L), 10) == Seq(2L, 4L, 5L))
  }

  test("scaleContingencyTable returns an all-zero table unchanged (stats_utils.py guard)") {
    val out = Seq(Tuple1(Seq(0L, 0L, 0L))).toDF("arr")
      .select(Stats.scaleContingencyTable(col("arr"), lit(100)))
      .head.getSeq[Long](0)
    assert(out.toSeq == Seq(0L, 0L, 0L))
  }

  test("scaleContingencyTable rounds half to EVEN like np.round (stats_utils.py:26-27)") {
    // 1*(1/2) = 0.5 -> 0 (np.round half-even), not 1 (HALF_UP)
    val out = Seq(Tuple1(Seq(1L, 1L))).toDF("arr")
      .select(Stats.scaleContingencyTable(col("arr"), lit(1)))
      .head.getSeq[Long](0)
    assert(out.toSeq == Seq(0L, 0L))
    // 3*(1/2) = 1.5 -> 2 (nearest even)
    val out2 = Seq(Tuple1(Seq(3L, 3L))).toDF("arr")
      .select(Stats.scaleContingencyTable(col("arr"), lit(3)))
      .head.getSeq[Long](0)
    assert(out2.toSeq == Seq(2L, 2L))
  }

  test("correctMultinomialFrequencies applies add-one smoothing") {
    val out = Seq(Tuple1(Seq(0L, 1L, 3L))).toDF("arr")
      .select(Stats.correctMultinomialFrequencies(col("arr")))
      .head.getSeq[Double](0)
    assert(out.toSeq == Seq(1.0 / 7, 2.0 / 7, 4.0 / 7))
  }

  test("lgamma matches factorials") {
    for (n <- 1 to 10)
      assert(math.abs(Stats.lgammaD(n + 1.0) - math.log((1 to n).map(_.toDouble).product)) < 1e-10)
  }

  test("multinomial log-likelihood matches closed form") {
    // Binomial(n=3, p=0.5) at x=2: C(3,2)*0.5^3 = 0.375
    val ll = Stats.multinomialLogLikelihood(Seq(2L, 1L), Seq(0.5, 0.5))
    assert(math.abs(math.exp(ll) - 0.375) < 1e-12)
    // self-expected ratio is 1 (both sides add-one corrected)
    assert(math.abs(Stats.multinomialLikelihoodRatio(Seq(2L, 2L), Seq(2L, 2L)) - 1.0) < 1e-12)
    // mismatched expectation gives ratio < 1
    assert(Stats.multinomialLikelihoodRatio(Seq(9L, 1L), Seq(5L, 5L)) < 1.0)
  }

  test("multinomial UDF evaluates in a plan") {
    val r = Seq((Seq(2L, 1L), Seq(0.5, 0.5))).toDF("xs", "ps")
      .select(Stats.multinomialLogLikelihoodUdf(col("xs"), col("ps")))
      .head.getDouble(0)
    assert(math.abs(math.exp(r) - 0.375) < 1e-12)
  }

  test("hmerLengthAt scans the run around the locus midpoint (F15)") {
    assert(Genomics.hmerLengthAt("ACTTTGA", 'T') == 3) // mid=3 is inside TTT
    assert(Genomics.hmerLengthAt("ACTGACT", 'G') == 1)
    assert(Genomics.hmerLengthAt("AAAAAAA", 'A') == 7)
    assert(Genomics.hmerLengthAt("ACTGACT", 'C') == 0) // mid not a C run
  }

  test("bridgingHmer counts alt runs around the variant and flags tandem repeats (calibrate_bridging_snvs.py:9-66)") {
    // k=4, window TAAA[T]AAAT: ref T at center, alt A bridges 3+1+3=7 but
    // the flanks are both the REF base with EQUAL run lengths -> tandem
    assert(Genomics.bridgingHmer("TAAATAAAT", 'T', 'A', 4) == ((7, 3, 3, true)))
    // asymmetric runs (3 vs 2): same flanks but NOT tandem
    assert(Genomics.bridgingHmer("TAAATAACT", 'T', 'A', 4) == ((6, 3, 2, false)))
    // equal runs but flanks differ from ref: not tandem
    assert(Genomics.bridgingHmer("CAAATAAAC", 'T', 'A', 4) == ((7, 3, 3, false)))
    // run hits the window edge: flank sentinel stays empty, never tandem
    assert(Genomics.bridgingHmer("AAAATAAAA", 'T', 'A', 4) == ((9, 4, 4, false)))
  }

  test("isHomopolymerSnp applies the qual/PASS/size/edge gates (calibrate_bridging_snvs.py:14-63)") {
    val bridge = "TAAATAACT" // 6-hmer, not tandem, up=3 down=2
    assert(Genomics.isHomopolymerSnp(bridge, 'T', 'A', 10.0, isPass = false,
      k = 4, minQual = 5.0, minDistFromEdge = 0))
    // PASS records and low-qual records never qualify
    assert(!Genomics.isHomopolymerSnp(bridge, 'T', 'A', 10.0, isPass = true,
      k = 4, minQual = 5.0, minDistFromEdge = 0))
    assert(!Genomics.isHomopolymerSnp(bridge, 'T', 'A', 3.0, isPass = false,
      k = 4, minQual = 5.0, minDistFromEdge = 0))
    // tandem repeats are excluded even above the size bar
    assert(!Genomics.isHomopolymerSnp("TAAATAAAT", 'T', 'A', 10.0, isPass = false,
      k = 4, minQual = 5.0, minDistFromEdge = 0))
    // min distance from the run edge: min(up=3, down=2) < 3
    assert(!Genomics.isHomopolymerSnp(bridge, 'T', 'A', 10.0, isPass = false,
      k = 4, minQual = 5.0, minDistFromEdge = 3))
  }

  test("flowKey run-length encodes in TGCA flow order (F16)") {
    // T G C A cycle: "TTG" -> T:2, G:1
    assert(Genomics.flowKey("TTG") == Seq(2, 1))
    // "GT": skip T flow (0), G:1, then C,A skipped (0,0), T:1
    assert(Genomics.flowKey("GT") == Seq(0, 1, 0, 0, 1))
    assert(Genomics.flowKey("") == Seq())
  }
}
