package graft.reports

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Genomics

/** Substitution-error-rate report — the computational core of
  * ugvc/reports/substitution_error_rate_report.ipynb (§3.3): per-motif
  * substitution error rates analyzed by mutation type, trinucleotide
  * context, cycle-skip status, and strand.
  *
  * Input frame (the notebook's `motif_1` store): one row per
  * (ref_motif, alt_motif) trinucleotide context with
  * `ref` (central base), per-threshold `error_rate_bq{0,3,5,10}` and
  * `snp_count_bq{0,3,5,10}` columns. Cycle-skip motifs are the rows where
  * `error_rate_bq10` is non-null (the notebook's definition: only
  * cycle-skip contexts can reach log-likelihood 10).
  *
  * Every table is a broadcast-size self-join or a single aggregate over
  * the ≤ 4·16·3 motif domain — the heavy work (producing the motif store
  * from reads) happens upstream; this layer is the notebook's pandas math
  * as engine views.
  */
object SubErrorRate {

  private val thresholds = Seq(0, 3, 5, 10)

  /** Forward/reverse strand matching
    * (`create_matched_forward_and_reverse_strand_errors_dataframe`):
    * forward = central ref base C/T; reverse = A/G rows re-keyed by the
    * reverse-complemented motifs and joined back on (ref_motif,
    * alt_motif). Combined columns follow the notebook exactly: error
    * rates average the two strands, snp counts sum them. */
  def matchedStrands(motifs: DataFrame): DataFrame = {
    val mutType = concat(substring(col("ref_motif"), 2, 1), lit("->"),
      substring(col("alt_motif"), 2, 1))
    val fwd = motifs.filter(col("ref") === "C" || col("ref") === "T")
      .withColumn("mut_type", mutType)
    val rev0 = motifs.filter(col("ref") === "A" || col("ref") === "G")
      .withColumn("ref_motif", Genomics.revcomp(col("ref_motif")))
      .withColumn("alt_motif", Genomics.revcomp(col("alt_motif")))
    val fCols = thresholds.flatMap(t => Seq(
      col(s"error_rate_bq$t").as(s"error_rate_bq${t}_f"),
      col(s"snp_count_bq$t").as(s"snp_count_bq${t}_f")))
    val rCols = thresholds.flatMap(t => Seq(
      col(s"error_rate_bq$t").as(s"error_rate_bq${t}_r"),
      col(s"snp_count_bq$t").as(s"snp_count_bq${t}_r")))
    val joined = fwd.select(Seq(col("ref_motif"), col("alt_motif"), col("mut_type")) ++ fCols: _*)
      .join(rev0.select(Seq(col("ref_motif"), col("alt_motif")) ++ rCols: _*),
        Seq("ref_motif", "alt_motif"), "left")
    // combined columns: mean of the strand rates, sum of the strand
    // counts (pandas .mean(axis=1)/.sum(axis=1) skip nulls — coalesce
    // replays that: a missing strand contributes nothing, not null)
    thresholds.foldLeft(joined) { (df, t) =>
      val (f, r) = (col(s"error_rate_bq${t}_f"), col(s"error_rate_bq${t}_r"))
      val (cf, cr) = (col(s"snp_count_bq${t}_f"), col(s"snp_count_bq${t}_r"))
      df.withColumn(s"error_rate_bq$t",
          when(f.isNotNull && r.isNotNull, (f + r) / 2.0).otherwise(coalesce(f, r)))
        .withColumn(s"snp_count_bq$t",
          when(cf.isNull && cr.isNull, lit(null).cast("long"))
            .otherwise(coalesce(cf, lit(0L)) + coalesce(cr, lit(0L))))
    }
  }

  /** Average substitution error rates (the notebook's headline table):
    * one row per (population, threshold) where population splits
    * cycle-skip motifs (error_rate_bq10 non-null) from the rest. Rates
    * are UNWEIGHTED means over motifs — the notebook is explicit that
    * genomic abundance is not factored in. */
  def summary(matched: DataFrame): DataFrame = {
    val isCskp = col("error_rate_bq10_f").isNotNull
    val pops = Seq(
      ("non_cycle_skip", Seq(0, 3, 5), not(isCskp)),
      ("cycle_skip", Seq(10), isCskp))
    pops.map { case (pop, ts, cond) =>
      val base = matched.filter(cond)
      ts.map { t =>
        base.agg(
          avg(col(s"error_rate_bq$t")).as("error_rate"),
          sum(col(s"snp_count_bq$t")).as("n_errors"))
          .select(lit(pop).as("population"), lit(t).as("thresh"),
            col("error_rate"), col("n_errors"))
      }.reduce(_ unionByName _)
    }.reduce(_ unionByName _)
  }

  /** Strand asymmetry of cycle-skip errors (the notebook's final table):
    * per mutation type, the distribution of log2(forward/reverse) across
    * contexts plus its mean — deviation from 0 flags protocol bias. */
  def asymmetry(matched: DataFrame): DataFrame = {
    val ratio = log2(col("error_rate_bq10_f") / col("error_rate_bq10_r"))
    matched
      .filter(col("error_rate_bq10_f").isNotNull && col("error_rate_bq10_r").isNotNull &&
        col("error_rate_bq10_r") > 0 && col("error_rate_bq10_f") > 0)
      .groupBy("mut_type")
      .agg(count(lit(1)).as("n_contexts"),
        avg(ratio).as("mean_log2_ratio"),
        min(ratio).as("min_log2_ratio"),
        max(ratio).as("max_log2_ratio"))
  }

  /** Positional error profile: cycle-skip substitutions binned by read
    * position per mutation type and strand (the notebook's positional
    * plot). Input: per-error frame (mut_type, strand, position); output
    * counts per `binSize`-wide position bin — one partial+final aggregate
    * at any error-count scale. */
  def positionalProfile(errors: DataFrame, binSize: Int = 10): DataFrame =
    errors.groupBy(col("mut_type"), col("strand"),
        (floor(col("position") / binSize) * binSize).as("pos_bin"))
      .agg(count(lit(1)).as("n"))

  def tables(motifs: DataFrame): Map[String, DataFrame] = {
    val matched = matchedStrands(motifs)
    Map("strand_matched_errors" -> matched,
        "error_rate_summary" -> summary(matched),
        "cycle_skip_asymmetry" -> asymmetry(matched))
  }

  def registerViews(spark: org.apache.spark.sql.SparkSession, motifs: DataFrame): Unit =
    tables(motifs).foreach { case (n, df) => df.createOrReplaceTempView(n) }

  private def log2(c: Column): Column = log(c) / log(lit(2.0))
}
