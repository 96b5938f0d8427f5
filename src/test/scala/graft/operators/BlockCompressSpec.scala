package graft.operators

import graft.SparkSpec

/** The W2 automaton, tested in the reference's exact-cardinality style
  * (test/unit/joint/test_compress_gvcf.py:4-22). */
class BlockCompressSpec extends SparkSpec {
  import spark.implicits._

  private def rec(chrom: String, pos: Long, gq: Int, pass: Boolean = false,
                  dp: Int = 30, pl: Seq[Int] = Seq(0, 10, 100)): GvcfRecord =
    GvcfRecord(chrom, pos, pos + 1, gq, dp, pl, pass)

  // refcallThr=0 disables the band edge for the generic band-width tests;
  // the band-edge test passes the reference default explicitly
  private def compress(rs: Seq[GvcfRecord], thr: Int,
                       refcallThr: Int = 0): Seq[GvcfBlock] =
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

  test("records never merge across the refcall GQ band edge (compress_gvcf.py:68-77)") {
    // gqs 20 and 24 straddle the default threshold 22; band width 10 alone
    // would merge them — the band edge must split anyway
    val out = compress(Seq(rec("1", 1, 20), rec("1", 2, 24)), 10, refcallThr = 22)
    assert(out.size == 2)
    // both below the edge: merges as usual
    val low = compress(Seq(rec("1", 1, 15), rec("1", 2, 20)), 10, refcallThr = 22)
    assert(low.size == 1)
  }

  test("compression ratio on a GQ-banded run (shape of the 4438->1184 invariant)") {
    // 4 alternating GQ bands of 25 records each; threshold 10 keeps bands apart
    val recs = (0 until 100).map(i => rec("1", i.toLong, gq = (i / 25 % 2) * 30 + 10))
    val out = compress(recs, 10)
    assert(recs.size == 100 && out.size == 4)
    assert(out.map(_.nRecords).sum == 100)
  }
}
