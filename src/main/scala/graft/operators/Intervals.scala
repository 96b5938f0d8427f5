package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Interval algebra over half-open genomic-style intervals `[start, end)`
  * keyed by a partition column ("chrom").
  *
  * Reference semantics (SURVEY.md §2.3 J5–J7, §2.5 W5): the reference shells
  * out to `bedtools intersect/subtract/merge` (sorted-sweep over files, e.g.
  * ugvc/pipelines/coverage_analysis.py:717-742, vcfeval_flavors.py:99-143).
  *
  * Spark-first design: a naive range join (`a.start < b.end && b.start <
  * a.end`) plans as BroadcastNestedLoopJoin — O(|a|·|b|) per chrom and a
  * driver-killer at genome scale. Instead every operator here rewrites to a
  * **bin-bucketed equi-join**: each interval is exploded to the fixed-size
  * bins it covers, the join runs as a shuffled (or broadcast) hash join on
  * `(chrom, bin)`, and the exact overlap predicate filters within buckets.
  * Duplicate pairs (two intervals sharing several bins) are eliminated
  * without a distinct: a pair is only accepted in the bin where the overlap
  * region starts (`bin == max(floor(a.start/w), floor(b.start/w))`), so each
  * qualifying pair survives exactly once. This keeps the whole plan inside
  * whole-stage codegen with partial aggregation intact and scales linearly
  * in rows at fixed interval length / bin width.
  */
object Intervals {

  /** Explode an interval frame to one row per covered bin. Column `_bin`. */
  private def withBins(df: DataFrame, chrom: String, start: String, end: String,
                       binSize: Long): DataFrame =
    df.withColumn("_bin",
      explode(sequence(floor(col(start) / binSize),
                       floor((col(end) - 1) / binSize))))

  /** Overlap condition for half-open intervals plus first-shared-bin dedup. */
  private def overlapCond(as: Column, ae: Column, bs: Column, be: Column,
                          bin: Column, binSize: Long): Column =
    as < be && bs < ae &&
      bin === greatest(floor(as / binSize), floor(bs / binSize))

  /** Inner overlap join: all (a, b) pairs with a.chrom == b.chrom and
    * overlapping spans. Output carries all columns of both sides.
    * Set `broadcastB = true` when b is a small interval list (the common
    * annotation case) — the join then never shuffles the big side.
    */
  def overlapJoin(a: DataFrame, b: DataFrame,
                  chrom: String = "chrom",
                  aStart: String = "start", aEnd: String = "end",
                  bStart: String = "bstart", bEnd: String = "bend",
                  binSize: Long = 10000L,
                  broadcastB: Boolean = false): DataFrame = {
    val ab = withBins(a, chrom, aStart, aEnd, binSize)
    val bb0 = withBins(b.withColumnRenamed(chrom, "_bchrom"), "_bchrom", bStart, bEnd, binSize)
      .withColumnRenamed("_bin", "_bbin")
    val bb = if (broadcastB) broadcast(bb0) else bb0
    ab.join(bb,
        ab(chrom) === bb("_bchrom") && ab("_bin") === bb("_bbin") &&
          overlapCond(ab(aStart), ab(aEnd), bb(bStart), bb(bEnd), ab("_bin"), binSize))
      .drop("_bin", "_bbin", "_bchrom")
  }

  /** Left-semi overlap join: rows of `a` overlapped by at least one `b`
    * interval (bedtools intersect -u). */
  def semiJoin(a: DataFrame, b: DataFrame,
               chrom: String = "chrom",
               aStart: String = "start", aEnd: String = "end",
               bStart: String = "bstart", bEnd: String = "bend",
               binSize: Long = 10000L,
               broadcastB: Boolean = false): DataFrame = {
    val ab = withBins(a, chrom, aStart, aEnd, binSize)
    val bb0 = withBins(b.withColumnRenamed(chrom, "_bchrom"), "_bchrom", bStart, bEnd, binSize)
      .withColumnRenamed("_bin", "_bbin")
      .select("_bchrom", "_bbin", bStart, bEnd)
    val bb = if (broadcastB) broadcast(bb0) else bb0
    // left_semi needs no dedup trick — semi join already emits each a-bin row
    // at most once; dropDuplicates collapses multi-bin a intervals.
    ab.join(bb,
        ab(chrom) === bb("_bchrom") && ab("_bin") === bb("_bbin") &&
          ab(aStart) < bb(bEnd) && bb(bStart) < ab(aEnd),
        "left_semi")
      .drop("_bin")
      .dropDuplicates(a.columns.toIndexedSeq)
  }

  /** Overlap anti-join: rows of `a` overlapping NO `b` interval
    * (bcftools isec -C at interval granularity).
    *
    * Key-level LEFT ANTI against the semi-join's matched keys: each a-row
    * gets a content-hash key, the binned overlap semi-join yields the
    * matched key set (8-byte rows), and one anti join filters `a`. The
    * previous `exceptAll` form hash-partitioned and compared EVERY `a`
    * column; here the wide rows shuffle once keyed by a single long (with
    * `broadcastB` the semi stage itself never shuffles the big side), and
    * the distinct/anti machinery only ever touches 8-byte keys. Identical
    * a-rows share a key and an overlap verdict, so non-overlapping
    * duplicates all pass through. */
  def antiJoin(a: DataFrame, b: DataFrame,
               chrom: String = "chrom",
               aStart: String = "start", aEnd: String = "end",
               bStart: String = "bstart", bEnd: String = "bend",
               binSize: Long = 10000L,
               broadcastB: Boolean = false): DataFrame = {
    val withId = a.withColumn("_aid", xxhash64(a.columns.toIndexedSeq.map(col): _*))
    val ab = withBins(withId, chrom, aStart, aEnd, binSize)
    val bb0 = withBins(b.withColumnRenamed(chrom, "_bchrom"), "_bchrom", bStart, bEnd, binSize)
      .withColumnRenamed("_bin", "_bbin")
      .select("_bchrom", "_bbin", bStart, bEnd)
    val bb = if (broadcastB) broadcast(bb0) else bb0
    val hitKeys = ab.join(bb,
        ab(chrom) === bb("_bchrom") && ab("_bin") === bb("_bbin") &&
          ab(aStart) < bb(bEnd) && bb(bStart) < ab(aEnd),
        "left_semi")
      .select("_aid").distinct()
    withId.join(hitKeys, Seq("_aid"), "left_anti").drop("_aid")
  }

  /** Point-in-region semi-join (J9): rows of `points` whose `pos` falls
    * inside `(lo, hi]` of at least one region — the reference's
    * `in_regions` boundary convention (convert_haploid_regions.py:26-35).
    *
    * The naive theta join plans as a BroadcastNestedLoopJoin — O(points ×
    * regions) predicate evaluations, which is ~10¹² at a 100× replica.
    * Here each region explodes to its covered fixed-width bins and each
    * point computes its single bin, so the pairing is a hash equi-join on
    * `_bin` (broadcast when the region list is small) and the exact
    * boundary predicate runs only within buckets. The predicate is
    * evaluated on the ORIGINAL values (doubles included), so results are
    * bit-identical to the naive form — bins only prune, never decide.
    * A point has exactly one bin, so left-semi needs no dedup pass.
    */
  def pointInRegion(points: DataFrame, regions: DataFrame,
                    pos: String = "pos", lo: String = "lo", hi: String = "hi",
                    binSize: Double = 10000.0,
                    broadcastRegions: Boolean = true): DataFrame = {
    val pb = points.withColumn("_bin", floor(col(pos) / binSize))
    val rb0 = regions.withColumn("_rbin",
      explode(sequence(floor(col(lo) / binSize), floor(col(hi) / binSize))))
    val rb = if (broadcastRegions) broadcast(rb0) else rb0
    pb.join(rb,
        pb("_bin") === rb("_rbin") && pb(pos) > rb(lo) && pb(pos) <= rb(hi),
        "left_semi")
      .drop("_bin")
  }

  /** Pairwise interval intersection (J6): overlapping pairs clipped to
    * `[max(starts), min(ends))`, keeping `a`'s non-coordinate columns. */
  def intersectSets(a: DataFrame, b: DataFrame,
                    chrom: String = "chrom",
                    aStart: String = "start", aEnd: String = "end",
                    bStart: String = "bstart", bEnd: String = "bend",
                    binSize: Long = 10000L,
                    broadcastB: Boolean = false): DataFrame = {
    val joined = overlapJoin(a, b, chrom, aStart, aEnd, bStart, bEnd, binSize, broadcastB)
    joined
      .withColumn(aStart, greatest(col(aStart), col(bStart)))
      .withColumn(aEnd, least(col(aEnd), col(bEnd)))
      .drop(bStart, bEnd)
  }

  /** Fold N interval sets into their common intersection (J6 over many
    * files: intersect_bed_files, ugvc/pipelines/vcfeval_flavors.py:99-112).
    * Each fold step clips to pairwise overlaps then merges, so the running
    * result stays minimal. */
  def intersectAll(sets: Seq[DataFrame],
                   chrom: String = "chrom",
                   start: String = "start", end: String = "end",
                   binSize: Long = 10000L): DataFrame = {
    require(sets.nonEmpty, "need at least one interval set")
    sets.reduce { (acc, next) =>
      val b = next.withColumnRenamed(start, "bstart").withColumnRenamed(end, "bend")
        .select(chrom, "bstart", "bend")
      merge(intersectSets(acc.select(chrom, start, end), b,
        chrom, start, end, "bstart", "bend", binSize), chrom, start, end)
    }
  }

  /** Union of overlapping/adjacent intervals per chrom (W5, bedtools merge).
    * Classic gaps-and-islands: an island starts where `start` exceeds the
    * running max of previous `end`s. The window is partitioned by chrom, so
    * at scale each contig sorts independently (range-partitioned shuffle);
    * no single-reducer stage.
    */
  def merge(df: DataFrame,
            chrom: String = "chrom",
            start: String = "start", end: String = "end"): DataFrame = {
    val wPrev = Window.partitionBy(chrom).orderBy(start, end)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(chrom).orderBy(start, end)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_newIsland",
        when(col(start) > max(col(end)).over(wPrev), 1).otherwise(0))
      .withColumn("_island", sum(col("_newIsland")).over(wRun))
      .groupBy(col(chrom), col("_island"))
      .agg(min(col(start)).as(start), max(col(end)).as(end))
      .drop("_island")
  }

  /** Interval subtraction (J7, bedtools subtract): pieces of each `a`
    * interval not covered by any `b` interval. Overlapping b-intervals are
    * collected per a-row (after the binned overlap join) and walked in order;
    * a-rows with no overlap pass through via the left join.
    *
    * The per-row walk is a Scala lambda over a collected array — fine because
    * the array holds only the b-intervals overlapping ONE a-interval (small
    * by construction); the heavy lifting (pairing) stays in the binned join.
    */
  def subtract(a: DataFrame, b: DataFrame,
               chrom: String = "chrom",
               aStart: String = "start", aEnd: String = "end",
               bStart: String = "bstart", bEnd: String = "bend",
               binSize: Long = 10000L,
               broadcastB: Boolean = false): DataFrame = {
    val spark = a.sparkSession
    import spark.implicits._
    val aCols = a.columns.toIndexedSeq
    // deterministic content-hash id: monotonically_increasing_id is not
    // stable across the two evaluations of this subplan (AQE can change
    // partitioning between them), which would silently mis-join covers.
    // Identical a-rows sharing an id is harmless — they collect the same
    // merged cover and carve to the same pieces.
    val withId = a.withColumn("_aid", xxhash64(aCols.map(col): _*))
    val hits = overlapJoin(withId, b, chrom, aStart, aEnd, bStart, bEnd, binSize, broadcastB)
      .groupBy(col("_aid"))
      .agg(sort_array(collect_list(struct(col(bStart).as("s"), col(bEnd).as("e")))).as("_cover"))
    val carve = udf { (s: Long, e: Long, cover: Seq[org.apache.spark.sql.Row]) =>
      if (cover == null) Seq((s, e))
      else {
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        var cur = s
        cover.foreach { r =>
          val (bs, be) = (r.getLong(0), r.getLong(1))
          if (bs > cur) out += ((cur, math.min(bs, e)))
          cur = math.max(cur, be)
        }
        if (cur < e) out += ((cur, e))
        out.toSeq.filter { case (x, y) => x < y }
      }
    }
    withId.join(hits, Seq("_aid"), "left")
      // outer + null-filter: plain explode infers a size>0 pre-Generate
      // filter that evaluates the carve UDF two extra times per row
      .withColumn("_piece", explode_outer(carve(col(aStart), col(aEnd), col("_cover"))))
      .filter(col("_piece").isNotNull)
      .withColumn(aStart, col("_piece._1"))
      .withColumn(aEnd, col("_piece._2"))
      .select(aCols.map(col): _*)
  }
}
