package graft.reports

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MrdReport — tumor-fraction arithmetic and spectra against hand
  * computations (mrd_automatic_data_analysis.ipynb cells 19/21). */
class MrdReportSpec extends SparkSpec {
  import spark.implicits._

  // signature panel: matched "S" at (c1,1),(c1,2); control "C" at (c1,3)
  private def signatures = Seq(
    ("c1", 1L, "S", "matched", "C->T", 0.41, 30L, true),
    ("c1", 2L, "S", "matched", "A->G", 0.12, 50L, false),
    ("c1", 3L, "C", "control", "C->T", 0.05, 40L, true)
  ).toDF("chrom", "pos", "signature", "signature_type", "mutation_type",
    "af", "coverage", "pass_sig")

  // supporting reads (cfDNA FeatureMap entries)
  private def features = Seq(
    ("c1", 1L, "S", "matched", 70.0, 310L),
    ("c1", 1L, "S", "matched", 50.0, 150L), // fails read filter
    ("c1", 1L, "S", "matched", 80.0, 260L),
    ("c1", 3L, "C", "control", 90.0, 500L),
    ("c1", 9L, "S", "matched", 99.0, 120L)  // locus NOT in signatures
  ).toDF("chrom", "pos", "signature", "signature_type", "qual", "x_length")

  // SRSNV test set: 4 labeled rows, 2 pass qual>=60 => denom_ratio 0.5
  private def labeled = Seq(
    (true, 70.0), (true, 50.0), (true, 90.0), (true, 30.0), (false, 95.0)
  ).toDF("label", "qual")

  private val readFilter = col("qual") >= 60
  private val sigFilter = col("pass_sig")

  test("denom ratio = mean of read filter over labeled rows") {
    val r = MrdReport.denomRatioFrame(labeled, readFilter).head.getDouble(0)
    assert(r == 0.5)
  }

  test("tumor fraction: supporting/ceil(coverage*denom), zero floored to 1e-7") {
    val tf = MrdReport.tumorFraction(
        features.filter(readFilter), signatures,
        MrdReport.denomRatioFrame(labeled, readFilter))
      .collect().map(r => r.getAs[String]("signature") ->
        (r.getAs[Long]("supporting_reads"), r.getAs[Long]("corrected_coverage"),
          r.getAs[Double]("tf"))).toMap
    // S: 2 passing reads at locus 1 (locus 9 not in panel); cov 80*0.5=40
    assert(tf("S") == ((2L, 40L, 0.05)))
    // C: 1 passing read; cov 40*0.5=20
    assert(tf("C") == ((1L, 20L, 0.05)))
  }

  test("signatures with zero supporting reads keep a row with the tf floor") {
    val noFeat = features.filter(col("pos") === -1)
    val tf = MrdReport.tumorFraction(noFeat, signatures,
        MrdReport.denomRatioFrame(labeled, readFilter))
      .collect().map(r => r.getAs[String]("signature") ->
        (r.getAs[Long]("supporting_reads"), r.getAs[Double]("tf"))).toMap
    assert(tf("S") == ((0L, MrdReport.ZeroTfFillin)))
    assert(tf("C") == ((0L, MrdReport.ZeroTfFillin)))
  }

  test("mutation-type spectrum normalizes within (signature, filtered)") {
    val spec = MrdReport.mutationTypeSpectrum(signatures, sigFilter)
      .collect().map(r => (r.getAs[String]("signature"),
        r.getAs[String]("filtered"), r.getAs[String]("mutation_type")) ->
        (r.getAs[Long]("n"), r.getAs[Double]("frac"))).toMap
    assert(spec(("S", "Unfiltered", "C->T")) == ((1L, 0.5)))
    assert(spec(("S", "Unfiltered", "A->G")) == ((1L, 0.5)))
    // filtered: only pos 1 passes => spectrum is 100% C->T
    assert(spec(("S", "Filtered", "C->T")) == ((1L, 1.0)))
    assert(!spec.contains(("S", "Filtered", "A->G")))
  }

  test("read-length distribution bins by 50 over matched x filtered") {
    val rl = MrdReport.readLengthDist(features, readFilter)
      .collect().map(r => (r.getAs[Boolean]("matched"),
        r.getAs[String]("filtered"), r.getAs[Int]("length_bin")) ->
        r.getAs[Long]("n")).toMap
    assert(rl((true, "Unfiltered", 300)) == 1L) // 310
    assert(rl((true, "Unfiltered", 150)) == 1L)
    assert(rl((true, "Filtered", 100)) == 1L)   // 120 @ qual 99
    assert(!rl.contains((true, "Filtered", 150))) // qual 50 fails
    assert(rl((false, "Filtered", 500)) == 1L)
  }

  test("tables registers the notebook's h5-keyed variants") {
    val names = Reports.registerAll(spark, mrd = Some(Reports.MrdInputs(
      features, signatures, labeled, readFilter, sigFilter)))
    assert(names.toSet == Set(
      "mrd_mutation_type_spectrum", "mrd_allele_fraction_hist",
      "mrd_denom_ratio", "mrd_tf_filt_signature_filt_featuremap",
      "mrd_tf_unfilt_signature_filt_featuremap",
      "mrd_tf_filt_signature_unfilt_featuremap",
      "mrd_supporting_reads_per_locus", "mrd_read_length_dist"))
    // unfiltered-reads variant: denom 1, filtered signatures keep only
    // pos 1 for S (coverage 30); all 3 reads at pos 1 count -> tf 3/30
    val t = spark.sql(
      """SELECT tf FROM mrd_tf_filt_signature_unfilt_featuremap
         WHERE signature = 'S'""").head.getDouble(0)
    assert(math.abs(t - 0.1) < 1e-12)
  }
}
