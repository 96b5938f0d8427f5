package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.PlMath

/** Genotype correction by imputation (reference:
  * ugvc/pipelines/correct_genotypes_by_imputation.py:182-251,275-352 — the
  * PL-update core plus the change-counter matrix; Beagle itself stays
  * external, its DS dosage arrives as a column).
  *
  * Per variant: reweight the 3-PL by the dosage prior (PlMath), re-call the
  * genotype, and classify the change (same / hom→het / het→hom / other);
  * the A14 counter tree is one groupBy over the classified events.
  */
object ImputationRefinement {

  /** Add corrected PL/GT/GQ columns from `pl` (array<int>, size 3) and
    * `dose` (double in [0,2]). */
  def correct(df: DataFrame): DataFrame =
    df.withColumn("_rw", PlMath.reweightUdf(col("pl"), col("dose")))
      .withColumn("pl_corrected", col("_rw._1"))
      .withColumn("gt_corrected", col("_rw._2"))
      .withColumn("gq_corrected", col("_rw._3"))
      .drop("_rw")

  /** Classify the original→corrected genotype transition; original call is
    * the argmin of the input PL. */
  def withChangeClass(df: DataFrame): DataFrame = {
    val origGt = array_position(col("pl"), array_min(col("pl"))) - 1
    df.withColumn("gt_orig", origGt.cast("int"))
      .withColumn("change",
        when(col("gt_orig") === col("gt_corrected"), "same")
          .when(col("gt_orig") === 1 && col("gt_corrected").isin(0, 2), "het_to_hom")
          .when(col("gt_orig").isin(0, 2) && col("gt_corrected") === 1, "hom_to_het")
          .otherwise("other"))
  }

  /** A14 — per (variant_type, change) counter matrix. */
  def changeCounters(df: DataFrame): DataFrame =
    withChangeClass(correct(df))
      .groupBy("variant_type", "change")
      .agg(count(lit(1)).as("n"))
}
