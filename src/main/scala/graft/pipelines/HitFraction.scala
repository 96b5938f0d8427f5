package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sample-identity fingerprinting via variant hit fraction (reference:
  * ugvc/comparison/variant_hit_fraction_caller.py:33-73 and
  * quick_fingerprinter.py): intersect a callset with a ground-truth set on
  * the full variant key and report the fraction of truth variants hit.
  * Acceptance: fraction >= 0.99 against the sample's own truth
  * (BASELINE.md). The truth side is small (a fingerprint region slice) —
  * broadcast, so the callset never shuffles.
  */
object HitFraction {

  val key: Seq[String] = Seq("chrom", "pos", "ref", "major_alt")

  /** Per-callset hit fraction against truth; minAf filters low-frequency
    * calls first (variant_hit_fraction_caller.py:54-73). */
  def hitFraction(calls: DataFrame, truth: DataFrame, minAf: Double = 0.03): DataFrame = {
    val filtered = calls.filter(col("af") >= minAf)
    val hits = filtered.join(broadcast(truth.select(key.map(col): _*)), key, "left_semi")
    val nTruth = truth.count()
    hits.agg(count(lit(1)).as("n_hits"))
      .select(col("n_hits"), lit(nTruth).as("n_truth"),
        round(col("n_hits") / lit(nTruth.toDouble), 6).as("hit_fraction"))
      .withColumn("accepted", col("hit_fraction") >= 0.99)
  }
}
