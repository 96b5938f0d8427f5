package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval algebra checked against a brute-force nested-loop reference on
  * deterministic pseudo-random data (mirrors the reference's algebraic
  * invariant style, test/unit/joint/test_gvcf_bed.py:13-29). */
class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  // deterministic LCG so the fixture is stable across runs
  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(x => (x * 6364136223846793005L + 1442695040888963407L) & Long.MaxValue)

  private lazy val aIv: Seq[(String, Long, Long)] = {
    val r = lcg(7).map(_ % 10000).buffered
    (1 to 300).map { _ =>
      val chrom = s"chr${r.next() % 3 + 1}"
      val s0 = r.next()
      (chrom, s0, s0 + 1 + r.next() % 500)
    } ++
      // zero-length intervals: under the brute-force predicate
      // (a.start < b.end && b.start < a.end) a point [p, p) overlaps
      // exactly the intervals STRICTLY containing p and never another
      // point — the binned path must agree in both directions
      Seq(("chr1", 100L, 100L), ("chr2", 0L, 0L))
  }
  private lazy val bIv: Seq[(String, Long, Long)] = {
    val r = lcg(99).map(_ % 10000).buffered
    (1 to 80).map { _ =>
      val chrom = s"chr${r.next() % 3 + 1}"
      val s0 = r.next()
      (chrom, s0, s0 + 1 + r.next() % 800)
    } ++ Seq(("chr1", 500L, 500L), ("chr3", 42L, 42L))
  }

  private lazy val aDf: DataFrame = aIv.toDF("chrom", "start", "end")
  private lazy val bDf: DataFrame = bIv.toDF("chrom", "bstart", "bend")

  private def bruteOverlaps: Seq[((String, Long, Long), (String, Long, Long))] =
    for {
      a <- aIv; b <- bIv
      if a._1 == b._1 && a._2 < b._3 && b._2 < a._3
    } yield (a, b)

  test("overlapJoin matches brute-force nested loop (bin sizes 100/10000)") {
    for (bin <- Seq(100L, 10000L)) {
      val got = Intervals.overlapJoin(aDf, bDf, binSize = bin)
        .select("chrom", "start", "end", "bstart", "bend")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSeq.sorted
      val want = bruteOverlaps
        .map { case (a, b) => (a._1, a._2, a._3, b._2, b._3) }.sorted
      assert(got == want, s"bin=$bin")
    }
  }

  test("semiJoin = rows with >=1 overlap, each exactly once") {
    val got = Intervals.semiJoin(aDf, bDf, binSize = 100L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val want = bruteOverlaps.map(_._1).distinct.sorted
    assert(got == want)
  }

  test("antiJoin complements semiJoin") {
    val semi = Intervals.semiJoin(aDf, bDf, binSize = 100L).count()
    val anti = Intervals.antiJoin(aDf, bDf, binSize = 100L).count()
    assert(semi + anti == aDf.count())
  }

  test("merge: islands cover same bases, are disjoint and sorted") {
    val merged = Intervals.merge(aDf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    // disjoint + strictly separated islands per chrom
    merged.values.foreach { ivs =>
      ivs.sliding(2).foreach {
        case Array((_, _, e1), (_, s2, _)) => assert(e1 < s2)
        case _ =>
      }
    }
    // base-count conservation: union of input == union of merged
    def cover(ivs: Seq[(String, Long, Long)]): Set[(String, Long)] =
      ivs.flatMap { case (c, s, e) => (s until e).map(p => (c, p)) }.toSet
    assert(cover(merged.values.flatten.toSeq) == cover(aIv))
  }

  test("subtract: pieces never overlap b, cover exactly a-minus-b bases") {
    val pieces = Intervals.subtract(aDf, bDf, binSize = 100L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    def cover(ivs: Seq[(String, Long, Long)]): Set[(String, Long)] =
      ivs.flatMap { case (c, s, e) => (s until e).map(p => (c, p)) }.toSet
    val want = cover(aIv) -- cover(bIv.map { case (c, s, e) => (c, s, e) })
    assert(cover(pieces) == want)
  }

  test("intersectAll folds N sets to their common covered bases") {
    val s1 = Seq(("c", 0L, 100L), ("c", 200L, 300L)).toDF("chrom", "start", "end")
    val s2 = Seq(("c", 50L, 250L)).toDF("chrom", "start", "end")
    val s3 = Seq(("c", 60L, 220L), ("c", 240L, 260L)).toDF("chrom", "start", "end")
    val out = Intervals.intersectAll(Seq(s1, s2, s3))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq.sorted
    // common coverage: [60,100) ∩-chain and [200,220) plus [240,250)
    assert(out == Seq((60L, 100L), (200L, 220L), (240L, 250L)))
  }

  test("intersectSets: clipped spans are exactly pairwise overlaps") {
    val got = Intervals.intersectSets(aDf, bDf, binSize = 500L)
      .select("chrom", "start", "end")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val want = bruteOverlaps.map { case (a, b) =>
      (a._1, math.max(a._2, b._2), math.min(a._3, b._3))
    }.sorted
    assert(got == want)
  }
}
