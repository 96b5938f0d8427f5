package graft.operators

import graft.SparkSpec

class OverlapSuppressSpec extends SparkSpec {
  import spark.implicits._

  private def run(rs: Seq[SuppressRecord]): Seq[(Long, Boolean)] =
    OverlapSuppress.suppress(rs.toDS()).collect().toSeq
      .sortBy(r => (r.chrom, r.pos)).map(r => (r.pos, r.uncalledGt))

  test("uncalled records under a deletion with a called variant are dropped") {
    val rs = Seq(
      SuppressRecord("1", 10, 20, called = true, uncalledGt = false), // del spans to 30
      SuppressRecord("1", 15, 0, called = false, uncalledGt = true),  // dropped
      SuppressRecord("1", 25, 0, called = false, uncalledGt = true),  // dropped
      SuppressRecord("1", 40, 0, called = false, uncalledGt = true))  // outside span, kept
    assert(run(rs).map(_._1) == Seq(10L, 40L))
  }

  test("without any called record the buffered group passes through") {
    val rs = Seq(
      SuppressRecord("1", 10, 20, called = false, uncalledGt = false),
      SuppressRecord("1", 15, 0, called = false, uncalledGt = true))
    assert(run(rs).map(_._1) == Seq(10L, 15L))
  }

  test("chained deletions extend the overlap group") {
    val rs = Seq(
      SuppressRecord("1", 10, 10, called = false, uncalledGt = false), // spans to 20
      SuppressRecord("1", 15, 20, called = true, uncalledGt = false),  // extends to 35
      SuppressRecord("1", 30, 0, called = false, uncalledGt = true))   // inside → dropped
    assert(run(rs).map(_._1) == Seq(10L, 15L))
  }

  test("chromosome change closes the group") {
    val rs = Seq(
      SuppressRecord("1", 10, 100, called = true, uncalledGt = false),
      SuppressRecord("2", 15, 0, called = false, uncalledGt = true)) // other chrom, kept
    assert(run(rs).map(_._1) == Seq(10L, 15L))
  }

  test("segmented suppression is exact: equals the sequential run at any segment count") {
    val rnd = new scala.util.Random(23)
    val rs = for {
      chrom <- Seq("1", "2")
      i <- 0 until 1200
    } yield SuppressRecord(chrom,
      pos = i.toLong * 7 + rnd.nextInt(5),   // irregular but increasing-ish
      delLen = if (rnd.nextInt(4) == 0) rnd.nextInt(40).toLong else 0L,
      called = rnd.nextInt(5) == 0,
      uncalledGt = rnd.nextInt(3) == 0)
    val ds = rs.toDS()
    def key(r: SuppressRecord) = (r.chrom, r.pos, r.delLen, r.called, r.uncalledGt)
    val sequential = OverlapSuppress.suppress(ds).collect().map(key)
      .groupBy(identity).view.mapValues(_.length).toMap
    for (segs <- Seq(1, 5, 64)) {
      val seg = OverlapSuppress.suppressSegmented(ds, targetSegments = segs)
        .collect().map(key).groupBy(identity).view.mapValues(_.length).toMap
      assert(seg == sequential, s"targetSegments=$segs")
    }
  }

  test("auto dispatch is exact in both regimes (many small chroms, few hot chroms)") {
    val rnd = new scala.util.Random(71)
    def rec(chrom: String, i: Int) = SuppressRecord(chrom,
      pos = i.toLong * 7 + rnd.nextInt(5),
      delLen = if (rnd.nextInt(4) == 0) rnd.nextInt(40).toLong else 0L,
      called = rnd.nextInt(5) == 0,
      uncalledGt = rnd.nextInt(3) == 0)
    def key(r: SuppressRecord) = (r.chrom, r.pos, r.delLen, r.called, r.uncalledGt)
    // regime 1: 400 chroms x 6 rows — hash placement levels it, plain path
    val many = (for (c <- 0 until 400; i <- 0 until 6) yield rec(s"c$c", i)).toDS()
    // regime 2: 2 chroms x 1500 rows — single chroms dominate, segmented path
    val hot = (for (c <- Seq("a", "b"); i <- 0 until 1500) yield rec(c, i)).toDS()
    for (ds <- Seq(many, hot)) {
      val expected = OverlapSuppress.suppress(ds).collect().map(key)
        .groupBy(identity).view.mapValues(_.length).toMap
      val auto = OverlapSuppress.suppressAuto(ds).collect().map(key)
        .groupBy(identity).view.mapValues(_.length).toMap
      assert(auto == expected)
    }
    // mixed regime: one giant chrom + many tiny ones — only the giant may
    // receive anchors (the hot-chrom candidate filter), result still exact
    val mixed = ((0 until 3000).map(i => rec("giant", i)) ++
      (for (c <- 0 until 200; i <- 0 until 3) yield rec(s"t$c", i))).toDS()
    val expectedM = OverlapSuppress.suppress(mixed).collect().map(key)
      .groupBy(identity).view.mapValues(_.length).toMap
    val segM = OverlapSuppress.suppressSegmented(mixed).collect().map(key)
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(segM == expectedM)
  }
}
