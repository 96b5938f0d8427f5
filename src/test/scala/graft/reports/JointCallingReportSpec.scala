package graft.reports

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** JointCallingReport — the VariantEval pivot against hand values
  * (joint_calling_report.ipynb cell 3). */
class JointCallingReportSpec extends SparkSpec {
  import spark.implicits._

  private def vs = Seq(
    ("none", "all", "100", "20", "2.1"),
    ("none", "known", "80", "15", "2.2"),
    ("none", "novel", "20", "5", "1.7"),
    ("hc", "all", "50", "10", "2.0"),
    ("hc", "known", "40", "8", "2.05"),
    ("hc", "novel", "10", "2", "1.8")
  ).toDF("JexlExpression", "Novelty", "nSNPs", "nIndels", "TiTvRatio")

  private def is = Seq(
    ("none", "all", "1.5", "7", "3"),
    ("none", "known", "1.4", "5", "2"),
    ("none", "novel", "1.9", "2", "1"),
    ("hc", "all", "1.2", "4", "2"),
    ("hc", "known", "1.1", "3", "1"),
    ("hc", "novel", "1.6", "1", "1")
  ).toDF("JexlExpression", "Novelty", "insertion_to_deletion_ratio",
    "n_singleton_SNPs", "n_singleton_indels")

  private def ms = Seq(
    ("none", "all", "0.10", "0.05"), ("none", "known", "0.08", "0.04"),
    ("none", "novel", "0.20", "0.10"), ("hc", "all", "0.06", "0.03"),
    ("hc", "known", "0.05", "0.02"), ("hc", "novel", "0.09", "0.06")
  ).toDF("JexlExpression", "Novelty", "variantMultiSnpRatio",
    "variantMultiIndelRatio")

  private def hist = Seq(
    ("none", "known", "1", "0.3"), ("none", "known", "2", "0.2"),
    ("none", "novel", "1", "0.4"), ("none", "all", "1", "0.35"),
    ("none", "known", "25", "0.0")
  ).toDF("JexlExpression", "Novelty", "Length", "Freq")

  test("variant statistics pivots the three eval tables per (annotation, novelty)") {
    val out = JointCallingReport.variantStatistics(is, vs, ms).collect()
      .map(r => (r.getAs[String]("annotation"), r.getAs[String]("novelty")) -> r)
      .toMap
    assert(out.size == 6)
    val all = out(("none", "all"))
    assert(all.getAs[Long]("n_snps") == 100L)
    assert(all.getAs[Long]("n_indels") == 20L)
    assert(all.getAs[Double]("titv_ratio") == 2.1)
    assert(all.getAs[Double]("insertion_deletion_ratio") == 1.5)
    assert(all.getAs[Double]("dbsnp_snps_ratio") == 0.8)
    assert(all.getAs[Double]("dbsnp_indels_ratio") == 0.75)
    assert(all.getAs[Long]("n_singleton_snps") == 7L)
    // dbsnp ratios live only on the `all` row (notebook leaves others NaN)
    assert(out(("none", "known")).isNullAt(
      out(("none", "known")).fieldIndex("dbsnp_snps_ratio")))
    assert(out(("hc", "all")).getAs[Double]("dbsnp_snps_ratio") == 0.8)
    assert(out(("hc", "novel")).getAs[Double]("multiallelic_snp_ratio") == 0.09)
  }

  test("indel-length histogram keeps known/novel lengths 1..20, typed") {
    val h = JointCallingReport.indelLengthHistogram(hist).collect()
    assert(h.length == 3) // drops the 'all' row and length 25
    assert(h.forall(r => Set("known", "novel")(r.getAs[String]("novelty"))))
    assert(h.exists(r => r.getAs[Int]("length") == 2 &&
      r.getAs[Double]("freq") == 0.2))
  }

  test("allele-freq parser reads AF-prefixed rows distributed") {
    val dir = java.nio.file.Files.createTempDirectory("jcaf")
    val f = dir.resolve("af.txt")
    java.nio.file.Files.writeString(f,
      """# comment
        |SN 0 number of samples: 1
        |AF 0 0.01 10 6 4 2 1 1 0
        |AF 0 0.05 20 12 8 4 2 2 0
        |""".stripMargin)
    val df = JointCallingReport.alleleFreqTable(spark,
      Map("known" -> f.toString))
    val rows = df.collect()
    assert(rows.length == 2)
    val r = rows.find(_.getAs[Double]("allele_frequency") == 0.01).get
    assert(r.getAs[Double]("n_snps") == 10.0)
    assert(r.getAs[Double]("n_transitions") == 6.0)
    assert(r.getAs[Double]("n_indels") == 2.0)
    assert(r.getAs[String]("novelty") == "known")
  }

  test("registerAll registers the jc views") {
    val names = Reports.registerAll(spark, jointCalling = Some(
      Reports.JcInputs(is, vs, ms, hist)))
    assert(names.toSet ==
      Set("jc_variant_statistics", "jc_indel_length_histogram"))
    assert(spark.sql(
      "SELECT * FROM jc_variant_statistics WHERE annotation = 'hc'").count() == 3)
  }
}
