package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PL vector math, golden-value style (test_correct_genotypes_by_imputation.py:9-44,
  * test_compress_gvcf.py:14-22). */
class PlMathSpec extends SparkSpec {
  import PlMath._

  test("triangular index arithmetic") {
    assert(plIndex(0, 0) == 0 && plIndex(0, 1) == 1 && plIndex(1, 1) == 2)
    assert(plIndex(0, 2) == 3 && plIndex(1, 2) == 4 && plIndex(2, 2) == 5)
    assert(nAlleles(3) == 2 && nAlleles(6) == 3 && nAlleles(10) == 4)
  }

  test("toHaploid keeps homozygous entries, renormalized to min 0") {
    // biallelic pl (0/0, 0/1, 1/1) = (0, 20, 100): homs 0 and 100
    val h = toHaploid(Seq(0, 20, 100))
    assert(h.size == 2 && h.head == 0 && h(1) == 100)
    // equal homs renormalize to both-zero
    assert(toHaploid(Seq(30, 0, 30)) == Seq(0, 0))
  }

  test("toHaploid passes a 2-entry PL through unchanged (convert_haploid_regions.py:43-45)") {
    assert(toHaploid(Seq(17, 3)) == Seq(17, 3))
    assert(toHaploid(Seq(0, 50)) == Seq(0, 50))
  }

  test("toHaploid truncates each entry before the min shift (convert_haploid_regions.py:55-57)") {
    // int(-10*log10(p)) per entry, THEN subtract the min int — for integer
    // PL inputs this equals h_i - min(h), never a rounded float delta
    assert(toHaploid(Seq(0, 99, 6)) == Seq(0, 6))
    val tri = toHaploid(Seq(3, 99, 7, 99, 99, 12)) // homs 3, 7, 12
    assert(tri == Seq(0, 4, 9))
  }

  test("haploidCall: GT is the LAST zero index, GQ = min nonzero PL (convert_haploid_regions.py:58-64)") {
    assert(haploidCall(Seq(0, 50)) == ((0, 50)))
    assert(haploidCall(Seq(40, 0)) == ((1, 40)))
    // tie on zero: the reference's loop leaves the last zero index as GT,
    // and GQ stays at its 10000 sentinel when no nonzero PL exists
    assert(haploidCall(Seq(0, 0)) == ((1, 10000)))
    assert(haploidCall(Seq(0, 0, 5)) == ((1, 5)))
  }

  test("toHaploid/haploidCall equal the exact-integer form over the f14 oracle grid") {
    // For integer PLs, truncate-then-shift reduces exactly to h_i - min(h)
    // over the homozygous entries (the phred offset 10*log10(sum) is shared
    // by every entry). The f14_pl_math DuckDB oracle asserts that closed
    // form; this exhaustively proves it over the full value grid the query
    // can generate (17 x 23 x 29 hom combinations).
    for (a <- 0 until 17; c <- 0 until 23; f <- 0 until 29) {
      val pl = Seq(a, 30, c, 25, 35, f)
      val h = toHaploid(pl)
      val mn = Seq(a, c, f).min
      assert(h == Seq(a - mn, c - mn, f - mn), s"toHaploid($pl)")
      val (gt, gq) = haploidCall(h)
      val expGt = if (f == mn) 2 else if (c == mn) 1 else 0
      val nz = h.filter(_ != 0)
      val expGq = if (nz.isEmpty) 10000 else nz.min
      assert((gt, gq) == ((expGt, expGq)), s"haploidCall($h)")
    }
  }

  test("compressPl3 takes class minima (compress_gvcf.py:28-60)") {
    // triallelic: indices (0,0)=0 (0,1)=1 (1,1)=2 (0,2)=3 (1,2)=4 (2,2)=5
    val pl = Seq(10, 40, 70, 20, 90, 60)
    // hom-ref = 10; het-with-ref = min(pl1, pl3) = 20; rest = min(pl2, pl4, pl5) = 60
    assert(compressPl3(pl) == Seq(10, 20, 60))
    // biallelic passthrough shape
    assert(compressPl3(Seq(0, 30, 55)) == Seq(0, 30, 55))
  }

  test("imputation priors match the reference goldens (test_correct_genotypes_by_imputation.py:9-44)") {
    assert(imputationPriors(Seq(Some(2.0)), 1, 0.01) == Seq(1.0, 0.01, 0.99))
    assert(imputationPriors(Seq(Some(1.0)), 1, 0.01) == Seq(1.0, 0.99, 0.01))
    assert(imputationPriors(Seq(Some(1.0), Some(1.0)), 2, 0.01) ==
      Seq(1.0, 0.99, 0.01, 0.99, 0.99, 0.01))
    assert(imputationPriors(Seq(Some(2.0), None), 2, 0.01) ==
      Seq(1.0, 0.01, 0.99, 0.01, 0.01, 0.01))
  }

  test("reweightByDose: het call flips to hom under a hom dose; hom-ref is pinned") {
    // het likelihood, dose says hom-alt: the call moves to (1,1)
    val (plFlip, gqFlip, gtFlip) = reweightByDose(Seq(40, 0, 5), Seq(Some(2.0)), (0, 1))
    assert(gtFlip == ((1, 1)) && plFlip.min == 0 && gqFlip >= 0)
    // hom-ref prior is 1 and ref/alt balance is preserved: never flips
    val (plRef, _, gtRef) = reweightByDose(Seq(0, 30, 40), Seq(Some(2.0)), (0, 0))
    assert(gtRef == ((0, 0)) && plRef.head == 0)
    // ties keep the current genotype
    val (_, _, gtTie) = reweightByDose(Seq(0, 0, 0), Seq(Some(1.0)), (0, 1))
    assert(gtTie == ((0, 1)))
  }

  test("invIndex inverts plIndex over the triangular layout") {
    for (b <- 0 to 3; a <- 0 to b)
      assert(invIndex(plIndex(a, b)) == ((a, b)))
  }

  test("UDF bindings evaluate inside a DataFrame plan") {
    import spark.implicits._
    val df = Seq(Seq(0, 20, 100), Seq(30, 0, 30)).toDF("pl")
    val out = df.select(toHaploidUdf(col("pl"))).collect().map(_.getSeq[Int](0).toSeq)
    assert(out.toSeq == Seq(Seq(0, 100), Seq(0, 0)))
    val c3 = df.select(compressPl3Udf(col("pl"))).collect().map(_.getSeq[Int](0).toSeq)
    assert(c3.toSeq == Seq(Seq(0, 20, 100), Seq(30, 0, 30)))
  }

  test("ElementwiseMinPl aggregator min-merges vectors groupwise") {
    import spark.implicits._
    val ds = Seq(("a", Seq(0, 50, 90)), ("a", Seq(5, 20, 99)), ("b", Seq(1, 2, 3)))
      .toDS()
    val out = ds.groupByKey(_._1).mapValues(_._2)
      .agg(ElementwiseMinPl.toColumn.name("pl"))
      .collect().toMap
    assert(out("a") == Seq(0, 20, 90) && out("b") == Seq(1, 2, 3))
  }
}
