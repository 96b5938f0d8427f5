package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Genomics

/** Substitution-motif statistics (reference: ugvc/pipelines/run_no_gt_report.py
  * :110-172 — A6): count SNVs by (3-mer reference motif, alt base), re-index
  * onto the full dense motif domain with zero fill, then fold reverse
  * complements so each of the 96 canonical motif/alt classes accumulates
  * `x_forward + x_reverse`.
  *
  * Canonical = middle base in {A, C}; motifs with middle base G/T revcomp
  * both motif and alt before grouping (run_no_gt_report.py:163-170).
  */
object MotifStats {

  private val bases = Seq("A", "C", "G", "T")

  /** Dense domain: 64 motifs x 3 alts (alt != middle base) = 192 rows;
    * canonical half = 96. */
  def motifDomain(spark: SparkSession, canonicalOnly: Boolean): DataFrame = {
    import spark.implicits._
    val rows = for {
      l <- bases; m <- bases; r <- bases; a <- bases
      if a != m
      if !canonicalOnly || m == "A" || m == "C"
    } yield (s"$l$m$r", a)
    rows.toDF("motif", "alt")
  }

  /** Fold a (motif, alt) pair onto its canonical strand. The fold flag is
    * materialized FIRST — deriving it from `motif` inside the second
    * withColumn would re-test the already-folded motif and leave alt
    * unfolded. */
  def canonicalize(df: DataFrame): DataFrame =
    df.withColumn("_fold", substring(col("motif"), 2, 1).isin("G", "T"))
      .withColumn("motif",
        when(col("_fold"), Genomics.revcomp(col("motif"))).otherwise(col("motif")))
      .withColumn("alt",
        when(col("_fold"), Genomics.revcomp(col("alt"))).otherwise(col("alt")))
      .drop("_fold")

  /** SNV frame (left_motif, ref, right_motif, alt) → canonical 96-class
    * counts over the dense domain, zero-filled. */
  def motifCounts(snvs: DataFrame): DataFrame = {
    val spark = snvs.sparkSession
    val tagged = canonicalize(
      snvs.withColumn("motif",
        Genomics.motif(col("left_motif"), col("ref"), col("right_motif"))))
    val counts = tagged.groupBy("motif", "alt").agg(count(lit(1)).as("n"))
    motifDomain(spark, canonicalOnly = true)
      .join(counts, Seq("motif", "alt"), "left")
      .na.fill(0L, Seq("n"))
  }
}
