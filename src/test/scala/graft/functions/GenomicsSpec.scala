package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mirrors the reference's inline-golden style
  * (test/unit/utils/test_math_utils.py:10-23, test_stats_utils.py:112-122). */
class GenomicsSpec extends SparkSpec {
  private def approx(a: Any, b: Double, eps: Double = 1e-9): Boolean =
    math.abs(a.asInstanceOf[Double] - b) <= eps

  private def eval1(c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c).head.get(0)

  test("phred/unphred round-trip (math_utils.py:31-101)") {
    assert(approx(eval1(Genomics.phred(lit(0.001))), 30.0))
    assert(approx(eval1(Genomics.unphred(lit(30.0))), 0.001, 1e-12))
    assert(approx(eval1(Genomics.unphred(Genomics.phred(lit(0.42)))), 0.42, 1e-12))
  }

  test("safeDivide default on zero denominator (math_utils.py:9-28)") {
    assert(eval1(Genomics.safeDivide(lit(6.0), lit(3.0), lit(-1.0))) == 2.0)
    assert(eval1(Genomics.safeDivide(lit(6.0), lit(0.0), lit(-1.0))) == -1.0)
  }

  test("precision is 1 - fp/(fp+tp); defaults at zero denominators (stats_utils.py:76-138)") {
    assert(eval1(Genomics.precisionScore(lit(90L), lit(10L))) == 0.9)
    assert(eval1(Genomics.precisionScore(lit(0L), lit(0L))) == 1.0)
    assert(eval1(Genomics.recallScore(lit(90L), lit(10L))) == 0.9)
    // empty stratum: get_recall defaults to 1 (stats_utils.py:97-117)
    assert(eval1(Genomics.recallScore(lit(0L), lit(0L))) == 1.0)
    assert(approx(eval1(Genomics.f1Score(lit(0.9), lit(0.9))), 0.9, 1e-12))
    assert(eval1(Genomics.f1Score(lit(0.0), lit(0.0))) == 0.0)
  }

  test("errorType classifies genotype-pair sets (report_data_loader.py:106-126)") {
    import spark.implicits._
    def et(g1: Integer, g2: Integer, c1: Integer, c2: Integer): String =
      Seq((g1, g2, c1, c2)).toDF("g1", "g2", "c1", "c2")
        .select(Genomics.errorType(col("g1"), col("g2"), col("c1"), col("c2")))
        .head.getString(0)
    assert(et(0, 1, 1, 0) == "NO_ERROR")       // set equality ignores order
    assert(et(1, 1, 1, 1) == "NO_ERROR")
    assert(et(0, 0, 0, 0) == "NO_ERROR")       // {0}=={0} wins before NOISE
    assert(et(0, 0, 0, 1) == "NOISE")          // gtr hom-ref, spurious call
    assert(et(null, null, 1, 1) == "NOISE")    // gtr no-call
    assert(et(1, 1, 0, 0) == "NO_VARIANT")     // call hom-ref, missed variant
    assert(et(1, 2, null, null) == "NO_VARIANT")
    assert(et(1, 1, 0, 1) == "HOM_TO_HET")     // gtr subset of call
    assert(et(0, 1, 1, 1) == "HET_TO_HOM")     // call subset of gtr
    assert(et(1, 1, 2, 2) == "WRONG_ALLELE")
    assert(et(1, 2, 1, 3) == "WRONG_ALLELE")   // overlap but neither subset
  }

  test("revcomp (run_no_gt_report.py:37)") {
    assert(eval1(Genomics.revcomp(lit("ACGT"))) == "ACGT")
    assert(eval1(Genomics.revcomp(lit("AACG"))) == "CGTT")
    assert(eval1(Genomics.revcomp(lit("acgt"))) == "acgt")
  }

  test("motif = last(left) + ref + first(right) (run_no_gt_report.py:143)") {
    assert(eval1(Genomics.motif(lit("TTA"), lit("C"), lit("GGG"))) == "ACG")
  }

  test("labeledBins matches pd.cut right=False semantics (sv_stats_collect.py:12-13)") {
    val bins = Genomics.labeledBins(col("v"), Seq(0, 10, 20, 100), Seq("0-10", "10-20", "20+"))
    import spark.implicits._
    val out = Seq(0.0, 9.9, 10.0, 55.0, 100.0, -1.0).toDF("v").select(bins).collect().map(_.get(0))
    assert(out.toSeq == Seq("0-10", "0-10", "10-20", "20+", null, null))
  }

  test("genotype classifiers on nullable arrays (report_data_loader.py:106-126)") {
    import spark.implicits._
    val df = Seq(
      (Seq[Integer](1, 1), Option(true), true),
      (Seq[Integer](0, 1), Option(false), true),
      (Seq[Integer](null, null), Option.empty[Boolean], false)
    ).toDF("gt", "expHom", "expCalled")
    val rows = df.select(Genomics.isHom(col("gt")), Genomics.isCalled(col("gt")),
      col("expHom"), col("expCalled")).collect()
    rows.foreach { r =>
      assert(r.get(0) == r.get(2), s"isHom mismatch: $r")
      assert(r.get(1) == r.get(3), s"isCalled mismatch: $r")
    }
  }


  test("variant-shape derivations (report_data_loader.py:20-34)") {
    import spark.implicits._
    val df = Seq(
      ("A", "T", false, null.asInstanceOf[String], 0),
      ("A", "AT", true, "ins", 1),
      ("ATT", "A", true, "del", 2)
    ).toDF("ref", "alt", "expIndel", "expClass", "expLen")
    df.select(
      Genomics.isIndel(col("ref"), col("alt")), col("expIndel"),
      Genomics.indelClassify(col("ref"), col("alt")), col("expClass"),
      Genomics.indelLength(col("ref"), col("alt")), col("expLen")
    ).collect().foreach { r =>
      assert(r.get(0) == r.get(1), s"isIndel: $r")
      assert(r.get(2) == r.get(3), s"classify: $r")
      assert(r.getInt(4) == r.getInt(5), s"length: $r")
    }
    val gc = spark.range(1).select(Genomics.gcContent(lit("GGCCAT"))).head.getDouble(0)
    assert(math.abs(gc - 4.0/6) < 1e-12)
  }
}
