package graft.reports

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MRD automatic data analysis (`mrd_automatic_data_analysis.ipynb`) as a
  * set of named result tables — the notebook's relational core without the
  * matplotlib shell.
  *
  * Inputs mirror the notebook's three parquet/keyed inputs:
  *  - `features`: cfDNA FeatureMap entries — one row per supporting READ at
  *    a candidate locus: (chrom, pos, signature, signature_type, qual,
  *    x_length, x_filtered_count, x_read_count, ...).
  *  - `signatures`: one row per signature LOCUS: (chrom, pos, signature,
  *    signature_type ∈ matched|control|db_control, mutation_type, af,
  *    coverage, ...).
  *  - `featuremapLabeled`: the SRSNV test-set frame with a boolean `label`
  *    column, used only for the tumor-fraction denominator ratio.
  *
  * Filter predicates are passed as Columns (the notebook's
  * `read_filter_query` / `signature_filter_query` pandas-query strings —
  * e.g. `col("qual") >= 60`, `col("norm_coverage").between(0.6, 2.5)`);
  * [[tables]] evaluates every filtered/unfiltered combination the notebook
  * materializes.
  *
  * Scale notes: signatures are thousands of loci (small); features are the
  * corpus-sized side. Every signature-side reduction is a groupBy on
  * (signature_type, signature) — a few hundred groups; the single big
  * operation is features ⋈ signature-loci, an equi-join on (chrom, pos)
  * against a frame small enough to broadcast, so the 100 TB plan is one
  * scan of features with a broadcast hash join and map-side partial
  * aggregation. The tumor-fraction denominator ratio is a one-row
  * aggregate CROSS-JOINED (broadcast) onto the per-signature frame — no
  * driver-side collect.
  *
  * Reference: ugvc/reports/mrd_automatic_data_analysis.ipynb (cells 6-7
  * input prep, cell 19 `get_tf_from_filtered_data`, cell 21 denominator,
  * cell 36 read-length distributions). */
object MrdReport {

  /** Zero tumor fractions are reported as this floor (notebook cell 19's
    * `ZERO_TF_FILLIN`) so log-scale plots stay finite. */
  val ZeroTfFillin: Double = 1e-7

  /** Per-signature mutation-type spectrum, unfiltered and filtered —
    * `value_counts(normalize=True)` of `mutation_type` per signature
    * (notebook `plot_signature_mutation_types`, run for matched AND
    * control signatures). One groupBy; the normalizing total rides a
    * window over the (signature, filtered) partition — a few hundred
    * groups, so the window is cheap and the plan stays one Exchange. */
  def mutationTypeSpectrum(signatures: DataFrame, signatureFilter: Column): DataFrame = {
    val tagged = signatures
      .select(col("signature_type"), col("signature"), col("mutation_type"),
        explode(array(lit("Unfiltered"),
          when(signatureFilter, lit("Filtered")))).as("filtered"))
      .filter(col("filtered").isNotNull)
    val counts = tagged.groupBy("signature_type", "signature", "filtered", "mutation_type")
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("signature_type", "signature", "filtered")
    counts.withColumn("frac", col("n").cast("double") / sum("n").over(w))
  }

  /** Per-signature allele-fraction histogram (notebook
    * `plot_signature_allele_fractions`): af binned to 20 fixed buckets of
    * 0.05 over [0, 1], unfiltered vs filtered. */
  def alleleFractionHist(signatures: DataFrame, signatureFilter: Column): DataFrame =
    signatures
      .select(col("signature_type"), col("signature"), col("af"),
        explode(array(lit("Unfiltered"),
          when(signatureFilter, lit("Filtered")))).as("filtered"))
      .filter(col("filtered").isNotNull && col("af").isNotNull)
      .groupBy(col("signature_type"), col("signature"), col("filtered"),
        least(floor(col("af") / 0.05).cast("int"), lit(19)).as("af_bin"))
      .agg(count(lit(1)).as("n"))
      .withColumn("af_lo", col("af_bin") * 0.05)

  /** The tumor-fraction denominator ratio (notebook cell 21): the fraction
    * of labeled SRSNV test-set reads passing the read filter — returned as
    * a ONE-ROW frame (`denom_ratio`) for broadcast, not a collected
    * scalar. */
  def denomRatioFrame(featuremapLabeled: DataFrame, readFilter: Column): DataFrame =
    featuremapLabeled.filter(col("label"))
      .agg(avg(readFilter.cast("double")).as("denom_ratio"))

  /** Supporting reads per signature locus (notebook's
    * `df_supporting_reads_per_locus`): features restricted to loci present
    * in the (possibly filtered) signature frame, counted per
    * (chrom, pos, signature, signature_type). The locus restriction is a
    * left-semi join against the DISTINCT signature loci — broadcastable. */
  def supportingReadsPerLocus(features: DataFrame, signatures: DataFrame): DataFrame =
    features
      .join(broadcast(signatures.select("chrom", "pos").distinct()), Seq("chrom", "pos"),
        "left_semi")
      .groupBy("chrom", "pos", "signature", "signature_type")
      .agg(count(lit(1)).as("supporting_reads"))

  /** Tumor fraction per (signature_type, signature) — notebook cell 19's
    * `get_tf_from_filtered_data`:
    * tf = supporting_reads / ceil(coverage x denom_ratio), zeros floored
    * to [[ZeroTfFillin]]. Signatures with zero supporting reads still
    * appear (the notebook unions the signature panel in — here a left
    * join FROM the signature panel keeps them at 0). `denomRatio` is the
    * one-row frame from [[denomRatioFrame]] (pass a `lit(1.0)` frame for
    * the unfiltered-reads variant, as the notebook does). */
  def tumorFraction(features: DataFrame, signatures: DataFrame,
                    denomRatio: DataFrame): DataFrame = {
    val panel = signatures.groupBy("signature_type", "signature")
      .agg(sum("coverage").as("coverage"))
    val support = supportingReadsPerLocus(features, signatures)
      .groupBy("signature_type", "signature")
      .agg(sum("supporting_reads").as("supporting_reads"))
    panel
      .join(support, Seq("signature_type", "signature"), "left")
      .na.fill(0L, Seq("supporting_reads"))
      .crossJoin(broadcast(denomRatio))
      .withColumn("corrected_coverage", ceil(col("coverage") * col("denom_ratio")))
      .withColumn("tf",
        when(col("corrected_coverage") > 0,
          col("supporting_reads") / col("corrected_coverage")).otherwise(lit(0.0)))
      .withColumn("tf", when(col("tf") === 0.0, lit(ZeroTfFillin)).otherwise(col("tf")))
      .select("signature_type", "signature", "supporting_reads", "coverage",
        "corrected_coverage", "tf")
  }

  /** cfDNA read-length distributions (notebook cell 36): X_LENGTH
    * histogram per (matched, filtered) quadrant, 50-bp bins. (The
    * notebook's first two panels are titled "Matched reads" but query
    * `signature_type!='matched'` — an apparent slip; here the quadrant
    * label follows the actual predicate.) */
  def readLengthDist(features: DataFrame, readFilter: Column): DataFrame =
    features
      .select((col("signature_type") === "matched").as("matched"), col("x_length"),
        explode(array(lit("Unfiltered"),
          when(readFilter, lit("Filtered")))).as("filtered"))
      .filter(col("filtered").isNotNull && col("x_length").isNotNull)
      .groupBy(col("matched"), col("filtered"),
        (floor(col("x_length") / 50) * 50).cast("int").as("length_bin"))
      .agg(count(lit(1)).as("n"))

  /** All MRD report tables, named after the notebook's h5 keys where one
    * exists. The three tumor-fraction variants are the notebook's cells
    * 23/26/28: (filtered reads, filtered signatures), (filtered reads,
    * unfiltered signatures), (unfiltered reads, filtered signatures —
    * denominator ratio pinned to 1 as in the notebook). */
  def tables(features: DataFrame, signatures: DataFrame,
             featuremapLabeled: DataFrame,
             readFilter: Column, signatureFilter: Column): Map[String, DataFrame] = {
    val featFilt = features.filter(readFilter)
    val sigFilt = signatures.filter(signatureFilter)
    val denom = denomRatioFrame(featuremapLabeled, readFilter)
    val one = featuremapLabeled.sparkSession.range(1)
      .select(lit(1.0).as("denom_ratio"))
    Map(
      "mrd_mutation_type_spectrum" -> mutationTypeSpectrum(signatures, signatureFilter),
      "mrd_allele_fraction_hist" -> alleleFractionHist(signatures, signatureFilter),
      "mrd_denom_ratio" -> denom,
      "mrd_tf_filt_signature_filt_featuremap" ->
        tumorFraction(featFilt, sigFilt, denom),
      "mrd_tf_unfilt_signature_filt_featuremap" ->
        tumorFraction(featFilt, signatures, denom),
      "mrd_tf_filt_signature_unfilt_featuremap" ->
        tumorFraction(features, sigFilt, one),
      "mrd_supporting_reads_per_locus" ->
        supportingReadsPerLocus(featFilt, sigFilt),
      "mrd_read_length_dist" -> readLengthDist(features, readFilter))
  }
}
