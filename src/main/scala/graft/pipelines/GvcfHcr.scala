package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Intervals

/** gVCF → high-confidence-region BED (reference:
  * ugvc/pipelines/vcfbed/gvcf_hcr_main.py:27-34 = gvcf_bed (W4) then
  * merge (W5); block emission logic at ugvc/joint/gvcf_bed.py:9-69).
  *
  * Input: gVCF-ish frame (chrom, pos, end, gq). Rows whose start lies
  * before the running max extent of previous records are dropped (the
  * reference's monotone-extent skip at gvcf_bed.py:56-61); survivors with
  * gq >= threshold emit (chrom, pos-1, end) blocks, then overlapping
  * blocks union-merge.
  */
object GvcfHcr {

  def highConfidenceRegions(gvcf: DataFrame, gqThreshold: Int): DataFrame = {
    val w = Window.partitionBy("chrom").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val kept = gvcf
      .withColumn("_extent", max(col("end")).over(w))
      .filter(col("_extent").isNull || col("pos") >= col("_extent"))
      .filter(col("gq") >= gqThreshold)
      // VCF pos is 1-based inclusive; BED is 0-based half-open
      .select(col("chrom"), (col("pos") - 1).as("start"), col("end"))
    Intervals.merge(kept)
  }
}
