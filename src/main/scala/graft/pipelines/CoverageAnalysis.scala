package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Intervals

/** Coverage-analysis pipeline (reference: ugvc/pipelines/coverage_analysis.py
  * full_analysis, :412-594): per-base depth → windowed-mean pyramid →
  * per-category coverage histograms → percentile stats.
  *
  * Spark shape: one lazy plan instead of joblib-process-per-region +
  * temp bedgraph/bigwig files. Depth is `(chrom, start, end, coverage)` at
  * 1-bp resolution, partitioned by chrom at scale.
  */
object CoverageAnalysis {

  /** A3 — tumbling-window mean over fixed bp windows, dropping ragged tail
    * windows exactly like the reference's awk (end-start != w discarded,
    * coverage_analysis.py:830-838). Input rows are 1-bp resolution. */
  def binLevel(depth: DataFrame, window: Long): DataFrame =
    depth
      .groupBy(col("chrom"), (floor(col("start") / window) * window).as("start"))
      .agg(sum(col("coverage")).as("covSum"), count(lit(1)).as("n"))
      .filter(col("n") === window)
      .select(col("chrom"), col("start"), (col("start") + window).as("end"),
        (col("covSum") / col("n")).as("coverage"), col("covSum"), col("n"))

  /** Hierarchical pyramid (coverage_analysis.py:546-592): each level
    * re-aggregates the PREVIOUS level via (sum,count) — windows must divide.
    * Returns window-size → binned frame. The re-agg keeps the mean exact
    * (associative via sum+count) and touches ~1/w of the rows per level —
    * the reference's one manual optimization worth keeping (SURVEY §4). */
  def pyramid(depth: DataFrame, windows: Seq[Long]): Map[Long, DataFrame] = {
    require(windows.sliding(2).forall { case Seq(a, b) => b % a == 0; case _ => true },
      "each window must divide the next")
    windows.foldLeft(Map.empty[Long, DataFrame]) { (acc, w) =>
      val lvl = acc.get(windows(math.max(0, windows.indexOf(w) - 1))) match {
        case Some(prev) if w != windows.head =>
          prev.groupBy(col("chrom"), (floor(col("start") / w) * w).as("start"))
            .agg(sum(col("covSum")).as("covSum"), sum(col("n")).as("n"))
            .filter(col("n") === w)
            .select(col("chrom"), col("start"), (col("start") + w).as("end"),
              (col("covSum") / col("n")).as("coverage"), col("covSum"), col("n"))
        case _ => binLevel(depth, w)
      }
      acc + (w -> lvl)
    }
  }

  /** A2+J5 — coverage histogram restricted to an interval category
    * (bedtools intersect -a depth -b regions | histogram,
    * coverage_analysis.py:717-742). */
  def histogramIn(depth: DataFrame, regions: DataFrame,
                  binSize: Long = 10000L): DataFrame =
    Intervals.semiJoin(depth, regions, binSize = binSize, broadcastB = true)
      .groupBy(col("coverage").cast("int").as("coverage"))
      .agg(count(lit(1)).as("count"))

  /** A10 — percentiles from a histogram via cumulative fraction
    * (generate_stats_from_histogram [absent; inferred], called at
    * coverage_analysis.py:522). Runs on the already-small histogram, so the
    * unpartitioned window is a correct single-reducer plan. */
  def percentiles(hist: DataFrame, qs: Seq[Int] = Seq(5, 25, 50, 75, 95)): DataFrame = {
    val spark = hist.sparkSession
    import spark.implicits._
    val w = Window.orderBy("coverage").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cum", sum("count").over(w))
      .withColumn("total", sum("count").over(Window.partitionBy()))
    cum.crossJoin(qs.toDF("q"))
      .filter(col("cum") >= col("q") / lit(100.0) * col("total"))
      .groupBy("q").agg(min("coverage").as("value"))
  }
}
