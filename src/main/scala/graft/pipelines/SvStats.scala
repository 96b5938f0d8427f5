package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Genomics

/** SV stats collection (reference: ugvc/pipelines/sv_stats_collect.py) —
  * the SURVEY §7.2 first-milestone slice: PASS filter → SVLEN binning →
  * svtype × length-bin cross-tab, plus concordance-with-truth counts.
  */
object SvStats {

  /** The reference's fixed SV length domain (sv_stats_collect.py:12-13;
    * exact edges/labels recovered from the golden frame in
    * test/unit/reports/test_sv_stats_collect.py:64-111 — left-closed
    * pd.cut(right=False) bins). */
  val svBins: Seq[Double] = Seq(50, 100, 300, 500, 1000, 2000, 3000, 5000,
    10000, 100000, 1000000, Double.MaxValue)
  val svLabels: Seq[String] = Seq("50-100", "100-300", "300-500", "0.5-1k",
    "1k-2k", "2k-3k", "3k-5k", "5k-10k", "10k-100k", "100k-1M", ">1M")

  /** PASS filter (P2) + abs-length labeled binning (A8). */
  def prepare(sv: DataFrame): DataFrame =
    sv.where("filter = 'PASS' OR filter = '' OR filter = '.'")
      .withColumn("binned_svlen",
        Genomics.labeledBins(abs(col("svlen")), svBins, svLabels))

  /** A4 — svtype value counts. */
  def typeCounts(sv: DataFrame): DataFrame =
    prepare(sv).groupBy("svtype").agg(count(lit(1)).as("n"))

  /** A4+A6 — length-bin counts over the FULL zero-filled domain
    * (the golden frame reindexes to all 11 labels). */
  def lengthCounts(sv: DataFrame): DataFrame = {
    val spark = sv.sparkSession
    import spark.implicits._
    val domain = svLabels.toDF("binned_svlen")
    val counts = prepare(sv).groupBy("binned_svlen").agg(count(lit(1)).as("n"))
    domain.join(counts, Seq("binned_svlen"), "left").na.fill(0L, Seq("n"))
  }

  /** A5 — svtype × length-bin cross-tab with the fixed label domain. */
  def typeLengthCrosstab(sv: DataFrame): DataFrame =
    prepare(sv)
      .groupBy("svtype")
      .pivot("binned_svlen", svLabels)
      .count()
      // fill(0) over all numeric columns: fill-by-name would split the
      // dotted "0.5-1k" label into a nested path
      .na.fill(0L)

  /** concordance_with_gt (sv_stats_collect.py:63-97; golden
    * test_sv_stats_collect.py:149-163): the truth side carries TP/FN
    * labels, the callset side TP/FP; precision from the calls, recall from
    * the base. One row: TP_base, TP_calls, FN, FP, Precision, Recall, F1. */
  def concordanceWithGt(base: DataFrame, calls: DataFrame): DataFrame = {
    val b = base.agg(
      sum((col("label") === "TP").cast("long")).as("TP_base"),
      sum((col("label") === "FN").cast("long")).as("FN"))
    val c = calls.agg(
      sum((col("label") === "TP").cast("long")).as("TP_calls"),
      sum((col("label") === "FP").cast("long")).as("FP"))
    val p = col("TP_calls") / (col("TP_calls") + col("FP"))
    val r = col("TP_base") / (col("TP_base") + col("FN"))
    b.crossJoin(c).select(
      col("TP_base"), col("TP_calls"), col("FN"), col("FP"),
      p.as("Precision"), r.as("Recall"),
      Genomics.f1Score(p, r).as("F1"))
  }

  /** A11 shape — concordance counts per svtype from TP/FP/FN labels, with
    * the manual ALL rollup the reference builds by looping
    * (sv_stats_collect.py:176-199) expressed as a native rollup. */
  def concordanceStats(labeled: DataFrame): DataFrame = {
    val agg = labeled.rollup("svtype")
      .agg(sum((col("label") === "TP").cast("long")).as("tp"),
           sum((col("label") === "FP").cast("long")).as("fp"),
           sum((col("label") === "FN").cast("long")).as("fn"))
      .withColumn("svtype", coalesce(col("svtype"), lit("ALL")))
    val p = Genomics.precisionScore(col("tp"), col("fp"))
    val r = Genomics.recallScore(col("tp"), col("fn"))
    agg.select(col("svtype"), col("tp"), col("fp"), col("fn"),
      round(p, 6).as("precision"), round(r, 6).as("recall"),
      round(Genomics.f1Score(p, r), 6).as("f1"))
  }
}
