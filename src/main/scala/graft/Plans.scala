package graft

/** Dump `.explain("formatted")` for selected queries → regenerate PLANS.md.
  * Usage: runMain graft.Plans <sfDir> [query ...] (default: the
  * representative set recorded in PLANS.md). */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("a1_groupby_sum", "j1_inner_equi_join", "j5_interval_overlap",
        "o4_topk", "d3_lsh_pairs", "e1_knn_cosine", "e2_ivf_ann",
        "e4_ivf_pq", "w1_pr_curve_bucketed",
        "j11_isec_partition", "f14_pl_math", "w3_overlap_suppress",
        "w2_block_compress", "x6_decontaminate", "x7_mix_sample",
        "j13_skew_join", "qc1_fold_penalty", "qc2_sub_error_rate",
        "d9_simhash_pairs", "x12_tfidf_topk", "j2_multikey_join",
        "d4_jaccard_verify", "j8_exact_vs_loose_isec", "rg1_detailed_grid",
        "x14_repetition", "x15_bloom_decontaminate", "x16_dup_spans",
        "x17_incremental_dedup", "w7_downsample", "x20_atrest_tfidf",
        "x21_atrest_pairs")
    val spark = Spark.session("graft-plans")
    names.foreach { n =>
      println(s"\n## $n\n")
      println("```")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      println("```")
    }
    spark.stop()
  }
}
