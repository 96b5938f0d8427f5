package graft.reports

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SubErrorRateSpec extends SparkSpec {
  import spark.implicits._

  // (ref_motif, alt_motif, ref, er0, n0, er3, n3, er5, n5, er10, n10)
  private def motifRow(rm: String, am: String, ref: String,
                       vals: Seq[(Option[Double], Option[Long])]) =
    (rm, am, ref, vals(0)._1, vals(0)._2, vals(1)._1, vals(1)._2,
      vals(2)._1, vals(2)._2, vals(3)._1, vals(3)._2)

  private lazy val motifs = Seq(
    // non-cycle-skip pair: ACA->AAA forward, TGT->TTT its reverse strand
    motifRow("ACA", "AAA", "C", Seq(Some(0.01) -> Some(100L),
      Some(0.005) -> Some(50L), Some(0.002) -> Some(20L), None -> None)),
    motifRow("TGT", "TTT", "G", Seq(Some(0.03) -> Some(300L),
      Some(0.015) -> Some(150L), Some(0.006) -> Some(60L), None -> None)),
    // cycle-skip pair: TCA->TAA / TGA->TTA (C->A with 2x reverse rate)
    motifRow("TCA", "TAA", "C", Seq(Some(0.1) -> Some(1000L),
      Some(0.05) -> Some(500L), Some(0.02) -> Some(200L), Some(0.004) -> Some(40L))),
    motifRow("TGA", "TTA", "G", Seq(Some(0.2) -> Some(2000L),
      Some(0.1) -> Some(1000L), Some(0.04) -> Some(400L), Some(0.008) -> Some(80L))),
    // forward-only context (no reverse observations): combined = forward
    motifRow("CCC", "CAC", "C", Seq(Some(0.5) -> Some(10L),
      None -> None, None -> None, None -> None)))
    .toDF("ref_motif", "alt_motif", "ref",
      "error_rate_bq0", "snp_count_bq0", "error_rate_bq3", "snp_count_bq3",
      "error_rate_bq5", "snp_count_bq5", "error_rate_bq10", "snp_count_bq10")

  private lazy val matched = SubErrorRate.matchedStrands(motifs)

  test("strand matching revcomps A/G rows onto their C/T partners (notebook pairing)") {
    assert(matched.count() == 3) // ACA->AAA, TCA->TAA, CCC->CAC
    val aca = matched.filter(col("ref_motif") === "ACA").head
    assert(aca.getAs[String]("mut_type") == "C->A")
    assert(math.abs(aca.getAs[Double]("error_rate_bq0") - 0.02) < 1e-12) // mean(0.01, 0.03)
    assert(aca.getAs[Long]("snp_count_bq0") == 400L)      // sum(100, 300)
    assert(math.abs(aca.getAs[Double]("error_rate_bq5") - 0.004) < 1e-12)
    assert(aca.isNullAt(aca.fieldIndex("error_rate_bq10")))
    // forward-only context keeps its own rate (pandas mean skips missing)
    val ccc = matched.filter(col("ref_motif") === "CCC").head
    assert(ccc.getAs[Double]("error_rate_bq0") == 0.5)
    assert(ccc.getAs[Long]("snp_count_bq0") == 10L)
  }

  test("summary splits cycle-skip (bq10) motifs from the rest, unweighted means") {
    val s = SubErrorRate.summary(matched).collect()
      .map(r => (r.getAs[String]("population"), r.getAs[Int]("thresh")) ->
        (r.getAs[Double]("error_rate"), r.getAs[Long]("n_errors"))).toMap
    def close(got: (Double, Long), rate: Double, n: Long): Boolean =
      math.abs(got._1 - rate) < 1e-12 && got._2 == n
    // non-cskp = {ACA, CCC}: t0 mean(0.02, 0.5), t3 only ACA has a value
    assert(close(s(("non_cycle_skip", 0)), 0.26, 410L))
    assert(close(s(("non_cycle_skip", 3)), 0.01, 200L))
    assert(close(s(("non_cycle_skip", 5)), 0.004, 80L))
    assert(close(s(("cycle_skip", 10)), 0.006, 120L))
  }

  test("asymmetry reports log2 forward/reverse per mutation type") {
    val a = SubErrorRate.asymmetry(matched).collect()
    assert(a.length == 1)
    val r = a.head
    assert(r.getAs[String]("mut_type") == "C->A")
    assert(r.getAs[Long]("n_contexts") == 1L)
    assert(math.abs(r.getAs[Double]("mean_log2_ratio") - (-1.0)) < 1e-12)
  }

  test("positional profile bins cycle-skip errors by read position") {
    val errors = Seq(
      ("C->A", "fwd", 3), ("C->A", "fwd", 7), ("C->A", "fwd", 12),
      ("C->T", "rev", 195), ("C->T", "rev", 199))
      .toDF("mut_type", "strand", "position")
    val prof = SubErrorRate.positionalProfile(errors, binSize = 10).collect()
      .map(r => (r.getAs[String]("mut_type"), r.getAs[String]("strand"),
        r.getAs[Long]("pos_bin")) -> r.getAs[Long]("n")).toMap
    assert(prof(("C->A", "fwd", 0L)) == 2L)
    assert(prof(("C->A", "fwd", 10L)) == 1L)
    assert(prof(("C->T", "rev", 190L)) == 2L)
  }

  test("registerViews exposes the report tables as SQL") {
    SubErrorRate.registerViews(spark, motifs)
    assert(spark.sql("SELECT count(*) FROM strand_matched_errors").head.getLong(0) == 3L)
    assert(spark.sql(
      "SELECT n_errors FROM error_rate_summary WHERE population='cycle_skip'")
      .head.getLong(0) == 120L)
  }
}
