package graft.reports

import graft.SparkSpec

/** Reports.registerAll — the §3.3 notebook surface as one call. */
class ReportsSpec extends SparkSpec {
  import spark.implicits._

  private def concordance = (1 to 40).map { i =>
    (i % 3 == 0, if (i % 3 == 0) i % 5 else 0, i % 4 != 0, i % 4 == 0,
      i % 7 == 0, i / 40.0, i.toLong)
  }.toDF("indel", "hmer_indel_length", "tp", "fp", "fn", "score", "row_key")

  private def variants = Seq(
    ("A", "T", "CA", "AG", 0.5, Seq(0, 1), 0),
    ("G", "C", "TG", "GT", 0.9, Seq(1, 1), 0),
    ("AT", "A", "CA", "TG", 0.2, Seq(0, 1), 2)
  ).toDF("ref", "alt", "left_motif", "right_motif", "af", "gt", "hmer_indel_length")

  private def metrics = Seq(
    ("s1", "unmapped.quality_yield_metrics", "QualityYieldMetrics", "TOTAL_READS", "1000"),
    ("s1", "unmapped.quality_yield_metrics", "QualityYieldMetrics", "PF_READS", "900"),
    ("s1", "unmapped.quality_yield_metrics", "QualityYieldMetrics", "PF_BASES", "90000"),
    ("s1", "alignment_summary_metrics", "AlignmentSummaryMetrics", "PF_READS_ALIGNED", "800"),
    ("s1", "wgs_metrics", "WgsMetrics", "PCT_EXC_DUPE", "0.1")
  ).toDF("sample", "file", "metrics_class", "parameter", "value")

  private def cvg = Seq(("s1", 10, 100L), ("s1", 20, 300L), ("s1", 30, 100L))
    .toDF("sample", "coverage", "cnt")

  private def motifs = Seq(
    ("ACA", "ATA", "C", 0.01, 0.02, 0.03, Some(0.04), 5L, 6L, 7L, 8L),
    ("TGT", "TAT", "G", 0.02, 0.03, 0.04, Some(0.05), 1L, 2L, 3L, 4L),
    ("ATA", "AGA", "T", 0.03, 0.04, 0.05, None, 9L, 9L, 9L, 9L)
  ).toDF("ref_motif", "alt_motif", "ref",
    "error_rate_bq0", "error_rate_bq3", "error_rate_bq5", "error_rate_bq10",
    "snp_count_bq0", "snp_count_bq3", "snp_count_bq5", "snp_count_bq10")

  private def mrdFeatures = Seq(("c1", 1L, "S", "matched", 70.0, 300L))
    .toDF("chrom", "pos", "signature", "signature_type", "qual", "x_length")
  private def mrdSignatures = Seq(
    ("c1", 1L, "S", "matched", "C->T", 0.4, 30L, true))
    .toDF("chrom", "pos", "signature", "signature_type", "mutation_type",
      "af", "coverage", "pass_sig")
  private def mrdLabeled = Seq((true, 70.0)).toDF("label", "qual")

  // 3-novelty long frame with up to 3 named metric columns (padded names
  // are dropped again so arity always matches the 5-tuples)
  private def jcLong(cols: String*) = {
    val padded = (cols ++ Seq("_p1", "_p2", "_p3")).take(3)
    Seq(
      ("none", "all", "1", "2", "3"), ("none", "known", "1", "2", "3"),
      ("none", "novel", "1", "2", "3"))
      .toDF(Seq("JexlExpression", "Novelty") ++ padded: _*)
      .select((Seq("JexlExpression", "Novelty") ++ cols)
        .map(org.apache.spark.sql.functions.col): _*)
  }

  private def detailedData = (1 to 30).map { i =>
    (Seq("tp", "fp", "fn")(i % 3), if (i % 2 == 0) "PASS" else "LOW",
      i / 30.0, i % 2 == 0, i % 3, i % 5, i / 30.0, i.toDouble,
      i % 2 == 0, i % 3 == 0, i % 4 == 0, i % 5 == 0)
  }.toDF("classify_gt", "filter", "tree_score", "indel", "indel_length",
    "hmer_indel_length", "gc_content", "coverage", "lcr", "mappability",
    "ug_hcr", "exome")

  test("registerAll registers every report layer's views in one call") {
    import org.apache.spark.sql.functions.col
    val names = Reports.registerAll(spark,
      concordance = Some(concordance),
      variants = Some(variants),
      qc = Some(Reports.QcInputs(metrics, cvg, cvg, totalBeads = 2000.0)),
      motifs = Some(motifs),
      mrd = Some(Reports.MrdInputs(mrdFeatures, mrdSignatures, mrdLabeled,
        col("qual") >= 60, col("pass_sig"))),
      jointCalling = Some(Reports.JcInputs(
        jcLong("insertion_to_deletion_ratio",
          "n_singleton_SNPs", "n_singleton_indels"),
        jcLong("nSNPs", "nIndels", "TiTvRatio"),
        jcLong("variantMultiSnpRatio", "variantMultiIndelRatio"),
        Seq(("none", "known", "1", "0.5"))
          .toDF("JexlExpression", "Novelty", "Length", "Freq"))),
      detailed = Some(Reports.DetailedInputs(detailedData,
        Seq("Exome" -> col("exome")))))
    val expected = Set(
      "accuracy_metrics", "recall_precision_curve", "optimal_recall_precision",
      "motif_spectrum", "af_histogram", "indel_histogram",
      "qc_throughput", "qc_coverage", "qc_error", "qc_top_metrics",
      "strand_matched_errors", "error_rate_summary", "cycle_skip_asymmetry",
      "mrd_mutation_type_spectrum", "mrd_allele_fraction_hist",
      "mrd_denom_ratio", "mrd_tf_filt_signature_filt_featuremap",
      "mrd_tf_unfilt_signature_filt_featuremap",
      "mrd_tf_filt_signature_unfilt_featuremap",
      "mrd_supporting_reads_per_locus", "mrd_read_length_dist",
      "jc_variant_statistics", "jc_indel_length_histogram",
      "detailed_vars")
    assert(names.toSet == expected, s"got: ${names.sorted}")
    expected.foreach { v =>
      assert(spark.catalog.tableExists(v), s"view $v missing")
    }
    // smoke two views end to end through SQL
    assert(spark.sql("SELECT * FROM strand_matched_errors").count() > 0)
    assert(spark.sql("SELECT * FROM qc_throughput WHERE sample = 's1'").count() == 1)
  }

  test("partial inputs register only their own views") {
    spark.catalog.dropTempView("accuracy_metrics")
    val names = Reports.registerAll(spark, motifs = Some(motifs))
    assert(names.toSet == Set(
      "strand_matched_errors", "error_rate_summary", "cycle_skip_asymmetry"))
    assert(!spark.catalog.tableExists("accuracy_metrics"))
  }
}
