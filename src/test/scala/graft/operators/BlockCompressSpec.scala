package graft.operators

import graft.SparkSpec

/** The W2 automaton, tested in the reference's exact-cardinality style
  * (test/unit/joint/test_compress_gvcf.py:4-22). */
class BlockCompressSpec extends SparkSpec {
  import spark.implicits._

  private def rec(chrom: String, pos: Long, gq: Int, pass: Boolean = false,
                  dp: Int = 30, pl: Seq[Int] = Seq(0, 10, 100),
                  refcall: Boolean = false): GvcfRecord =
    GvcfRecord(chrom, pos, pos + 1, gq, dp, pl, pass, refcall)

  private def compress(rs: Seq[GvcfRecord], thr: Int,
                       refcallThr: Int = 22): Seq[GvcfBlock] =
    BlockCompress.compress(rs.toDS(), thr, refcallThr).collect().toSeq
      .sortBy(b => (b.chrom, b.pos))

  test("records within GQ band merge into one block") {
    val out = compress(Seq(rec("1", 10, 20), rec("1", 11, 22), rec("1", 12, 25)), 10)
    assert(out.size == 1)
    val b = out.head
    assert(b.pos == 10 && b.end == 13 && b.minGq == 20 && b.nRecords == 3)
  }

  test("break depends on running block min/max, not just the previous record") {
    // gqs 20,25,29: each adjacent gap < 6 but max-min = 9 >= 6 when 29 arrives
    // — lag-based logic would wrongly merge all three.
    val out = compress(Seq(rec("1", 1, 20), rec("1", 2, 25), rec("1", 3, 29)), 6)
    assert(out.size == 2)
    assert(out.map(_.nRecords) == Seq(2, 1))
  }

  test("PASS records always emit verbatim and split blocks") {
    val out = compress(Seq(rec("1", 1, 20), rec("1", 2, 21, pass = true), rec("1", 3, 22)), 10)
    assert(out.size == 3)
    assert(out(1).pos == 2 && out(1).nRecords == 1)
  }

  test("chromosome change breaks a block") {
    val out = compress(Seq(rec("1", 1, 20), rec("2", 1, 20)), 10)
    assert(out.size == 2 && out.map(_.chrom) == Seq("1", "2"))
  }

  test("merged block keeps min GQ/DP and elementwise-min PL (compress_gvcf.py:192-212)") {
    val out = compress(Seq(
      rec("1", 1, 20, dp = 30, pl = Seq(0, 50, 90)),
      rec("1", 2, 22, dp = 10, pl = Seq(5, 20, 99))), 10)
    assert(out.size == 1)
    val b = out.head
    assert(b.minGq == 20 && b.minDp == 10 && b.pl == Seq(0, 20, 90))
  }

  test("low-GQ RefCall records never merge, on either side (compress_gvcf.py:153-158)") {
    // a RefCall at GQ <= 22 breaks as the incoming record AND as the
    // previous record — it always stands alone, splitting its neighbors
    val out = compress(Seq(
      rec("1", 1, 20), rec("1", 2, 21, refcall = true), rec("1", 3, 22)), 10)
    assert(out.size == 3)
    assert(out(1).pos == 2 && out(1).nRecords == 1)
    // threshold is <=: GQ exactly 22 is still a solo RefCall
    val edge = compress(Seq(rec("1", 1, 22, refcall = true), rec("1", 2, 22)), 10)
    assert(edge.size == 2)
    // a RefCall ABOVE the threshold merges like any other record
    val high = compress(Seq(rec("1", 1, 23, refcall = true), rec("1", 2, 24)), 10)
    assert(high.size == 1 && high.head.nRecords == 2)
  }

  test("non-RefCall records merge across GQ 22 — only band width matters (compress_gvcf.py:153-158)") {
    // gqs 20 and 24 straddle 22 but are 4 apart: the reference merges them
    val out = compress(Seq(rec("1", 1, 20), rec("1", 2, 24)), 10)
    assert(out.size == 1 && out.head.nRecords == 2)
  }

  test("merged blocks carry PL3-compressed class minima; solo blocks keep PL verbatim (compress_gvcf.py:28-60,164-166)") {
    // triallelic PLs (6 entries) compress to 3 classes on merge:
    //   (0,54,57,990,2,990) -> (0,54,2); (3,40,50,60,70,80) -> (3,40,50)
    val merged = compress(Seq(
      rec("1", 1, 20, pl = Seq(0, 54, 57, 990, 2, 990)),
      rec("1", 2, 22, pl = Seq(3, 40, 50, 60, 70, 80))), 10)
    assert(merged.size == 1)
    assert(merged.head.pl == Seq(0, 40, 2))
    // a solo record is written verbatim: its PL stays 6 entries
    val solo = compress(Seq(rec("1", 1, 20, pl = Seq(0, 54, 57, 990, 2, 990))), 10)
    assert(solo.size == 1 && solo.head.pl == Seq(0, 54, 57, 990, 2, 990))
  }

  test("segmented compression is exact: equals the sequential run at any segment count") {
    val rnd = new scala.util.Random(11)
    // epoch-nano-scale positions: beyond double precision (ulp 256), the
    // regime where sketch-based anchor selection silently breaks
    val base = 1704000000000000000L
    val recs = for {
      chrom <- Seq("1", "2")
      i <- 0 until 1500
    } yield {
      val gq = rnd.nextInt(60)
      rec(chrom, base + i.toLong * 1001L, gq,
        pass = rnd.nextInt(12) == 0,
        refcall = rnd.nextInt(10) == 0,
        pl = Seq(0, 10 + gq, 100))
    }
    val ds = recs.toDS()
    def key(b: GvcfBlock) = (b.chrom, b.pos, b.end, b.minGq, b.minDp, b.pl, b.nRecords)
    val sequential = BlockCompress.compress(ds, 10).collect().map(key).toSet
    for (segs <- Seq(1, 4, 64)) {
      val seg = BlockCompress.compressSegmented(ds, 10, targetSegments = segs)
        .collect().map(key).toSet
      assert(seg == sequential, s"targetSegments=$segs")
    }
  }

  test("auto dispatch is exact in both regimes (many small chroms, few hot chroms)") {
    val rnd = new scala.util.Random(29)
    def rrec(chrom: String, i: Int): GvcfRecord = {
      val gq = rnd.nextInt(60)
      rec(chrom, 1704000000000000000L + i.toLong * 1001L, gq,
        pass = rnd.nextInt(12) == 0, refcall = rnd.nextInt(10) == 0,
        pl = Seq(0, 10 + gq, 100))
    }
    def key(b: GvcfBlock) = (b.chrom, b.pos, b.end, b.minGq, b.minDp, b.pl, b.nRecords)
    // regime 1: 400 chroms x 6 rows — hash placement levels it, plain path
    val many = (for (c <- 0 until 400; i <- 0 until 6) yield rrec(s"c$c", i)).toDS()
    // regime 2: 2 chroms x 1500 rows — single chroms dominate, segmented path
    val hot = (for (c <- Seq("a", "b"); i <- 0 until 1500) yield rrec(c, i)).toDS()
    for (ds <- Seq(many, hot)) {
      val expected = BlockCompress.compress(ds, 10).collect().map(key).toSet
      val auto = BlockCompress.compressAuto(ds, 10).collect().map(key).toSet
      assert(auto == expected)
    }
    // mixed regime: one giant chrom + many tiny ones — only the giant may
    // receive anchors (the hot-chrom candidate filter), result still exact
    val mixed = ((0 until 3000).map(i => rrec("giant", i)) ++
      (for (c <- 0 until 200; i <- 0 until 3) yield rrec(s"t$c", i))).toDS()
    val expectedM = BlockCompress.compress(mixed, 10).collect().map(key).toSet
    val segM = BlockCompress.compressSegmented(mixed, 10).collect().map(key).toSet
    assert(segM == expectedM)
  }

  test("pure step fold equals the partition automaton on a randomized stream") {
    val rnd = new scala.util.Random(17)
    val recs = (1 to 400).map { i =>
      val chrom = if (i <= 200) "1" else "2"
      rec(chrom, i.toLong, 15 + rnd.nextInt(30),
        pass = rnd.nextInt(12) == 0,
        dp = 10 + rnd.nextInt(40),
        pl = Seq(rnd.nextInt(20), rnd.nextInt(60), 40 + rnd.nextInt(60)),
        refcall = rnd.nextInt(5) == 0)
    }
    val viaCompress = compress(recs, 8)
    // per-chrom pos-ordered fold over the pure transition + final flush —
    // exactly what the streaming form does per group
    val viaStep = recs.groupBy(_.chrom).toSeq.flatMap { case (_, rs) =>
      var open = Option.empty[BlockCompress.OpenState]
      val out = Seq.newBuilder[GvcfBlock]
      rs.sortBy(_.pos).foreach { r =>
        val (closed, next) = BlockCompress.step(open, r, 8)
        out ++= closed
        open = next
      }
      out ++= BlockCompress.closeOpen(open)
      out.result()
    }.sortBy(b => (b.chrom, b.pos))
    assert(viaStep == viaCompress)
  }

  test("compression ratio on a GQ-banded run (shape of the 4438->1184 invariant)") {
    // 4 alternating GQ bands of 25 records each; threshold 10 keeps bands apart
    val recs = (0 until 100).map(i => rec("1", i.toLong, gq = (i / 25 % 2) * 30 + 10))
    val out = compress(recs, 10)
    assert(recs.size == 100 && out.size == 4)
    assert(out.map(_.nRecords).sum == 100)
  }
}
