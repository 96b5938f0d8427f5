package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.PlMath

/** Haploid-region genotype conversion (reference:
  * ugvc/pipelines/convert_haploid_regions.py:26-99): variants inside
  * haploid regions (chrX/chrY outside PAR) have their diploid PL collapsed
  * to the homozygous entries, renormalized, and re-called as a haploid GT
  * with GQ = gap to the second-best.
  *
  * Region membership is the J9 point-in-region rule evaluated as a scalar
  * `exists` against a broadcast per-bin region list (one fact scan); the
  * PL math is PlMath.toHaploid/haploidCall in one typed UDF pass.
  */
object ConvertHaploidRegions {

  private val convertUdf = udf { (pl: Seq[Int], noCall: Boolean) =>
    if (pl == null) null
    else {
      val h = PlMath.toHaploid(pl)
      val (gt, gq) = PlMath.haploidCall(h)
      // maintain no-call (convert_haploid_regions.py:65-68): an input
      // genotype of (None, None) keeps a null haploid GT; the collapsed
      // PL/GQ are still emitted like the reference's record rewrite
      (h, if (noCall) None else Some(gt), gq)
    }
  }

  /** variants: (chrom, pos, pl, ...); regions: (chrom, bstart, bend).
    * Rows inside a region gain haploid_pl / haploid_gt / haploid_gq;
    * rows outside pass through with nulls.
    *
    * Region membership is `bstart < pos <= bend`
    * (convert_haploid_regions.py:26-35: `region_start < pos <=
    * region_end`), expressed against the half-open interval machinery by
    * testing the shifted point [pos-1, pos) against [bstart, bend). */
  def convert(variants: DataFrame, regions: DataFrame,
              binSize: Long = 10000L): DataFrame = {
    // ONE scan of the variants: the region list is small by construction
    // (a haploid BED), so it is exploded to bins, grouped per (chrom, bin)
    // and BROADCAST; each point resolves membership with a scalar `exists`
    // over its own bin's interval list. (The previous inside-semi-join ∪
    // outside-anti-join shape read the fact table three times.)
    val rBin = regions
      .withColumn("_bin", explode(sequence(floor(col("bstart") / binSize),
        floor((col("bend") - 1) / binSize))))
      .groupBy(col("chrom"), col("_bin"))
      .agg(collect_list(struct(col("bstart"), col("bend"))).as("_ivs"))
    // no-call detection: a `gt` array whose first element is null is the
    // reference's (None, None) genotype; frames without a gt column are
    // treated as all-called
    val noCall =
      if (variants.columns.contains("gt"))
        col("gt").isNotNull && element_at(col("gt"), 1).isNull
      else lit(false)
    variants
      // the shifted point [pos-1, pos) lives in exactly one bin
      .withColumn("_bin", floor((col("pos") - 1) / binSize))
      .join(broadcast(rBin), Seq("chrom", "_bin"), "left")
      .withColumn("_haploid", coalesce(exists(col("_ivs"),
        iv => iv.getField("bstart") < col("pos") &&
          col("pos") <= iv.getField("bend")), lit(false)))
      .drop("_ivs", "_bin")
      .withColumn("_cv", when(col("_haploid"), convertUdf(col("pl"), noCall)))
      .withColumn("haploid_pl", col("_cv._1"))
      .withColumn("haploid_gt", col("_cv._2"))
      .withColumn("haploid_gq", col("_cv._3"))
      .drop("_cv", "_haploid")
  }
}
