package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** De-novo variant refinement (reference: ugvc/joint/denovo_refinement.py):
  * child candidate de-novos joined with parent panels on (chrom, pos),
  * per-parent quality columns aligned (J3), pair quality = rowwise min of
  * parental quals (F11/A13), then a per-position min-reduce for the
  * recalibrated lookup (J4).
  */
object DenovoRefinement {

  /** J3 — align parent qual columns onto the child frame by position.
    * Parent frames: (chrom, pos, qual). */
  def withParentQuals(child: DataFrame, mother: DataFrame, father: DataFrame): DataFrame =
    child
      .join(mother.select(col("chrom"), col("pos"), col("qual").as("qual_mother")),
        Seq("chrom", "pos"), "left")
      .join(father.select(col("chrom"), col("pos"), col("qual").as("qual_father")),
        Seq("chrom", "pos"), "left")

  /** F11 — pair_qual = min(maternal, paternal), null-safe: a missing parent
    * call counts as quality 0 (denovo_refinement.py:69-74). */
  def withPairQual(df: DataFrame): DataFrame =
    df.withColumn("pair_qual",
      least(coalesce(col("qual_mother"), lit(0.0)),
            coalesce(col("qual_father"), lit(0.0))))

  /** J4/A13 — per-position min of pair_qual across the parent panel. */
  def minPairQualByPosition(df: DataFrame): DataFrame =
    df.groupBy("chrom", "pos").agg(min("pair_qual").as("pair_qual"))

  def refine(child: DataFrame, mother: DataFrame, father: DataFrame): DataFrame =
    minPairQualByPosition(withPairQual(withParentQuals(child, mother, father)))
}
