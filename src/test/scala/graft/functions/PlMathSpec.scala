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

  test("haploidCall: argmin GT, GQ = gap to second-best, tie keeps lower index") {
    assert(haploidCall(Seq(0, 50)) == ((0, 50)))
    assert(haploidCall(Seq(40, 0)) == ((1, 40)))
    assert(haploidCall(Seq(7, 7)) == ((0, 0)))
  }

  test("compressPl3 takes class minima (compress_gvcf.py:28-60)") {
    // triallelic: indices (0,0)=0 (0,1)=1 (1,1)=2 (0,2)=3 (1,2)=4 (2,2)=5
    val pl = Seq(10, 40, 70, 20, 90, 60)
    // hom-ref = 10; het-with-ref = min(pl1, pl3) = 20; rest = min(pl2, pl4, pl5) = 60
    assert(compressPl3(pl) == Seq(10, 20, 60))
    // biallelic passthrough shape
    assert(compressPl3(Seq(0, 30, 55)) == Seq(0, 30, 55))
  }

  test("reweightByDose shifts calls toward the dosage prior") {
    // likelihood prefers hom-ref; dose 2.0 (prior ~ all alt/alt) flips the call
    val (_, gtLow, _) = reweightByDose(Seq(0, 30, 40), 0.0)
    val (_, gtHigh, _) = reweightByDose(Seq(40, 30, 0), 2.0)
    assert(gtLow == 0 && gtHigh == 2)
    // a flat likelihood follows the prior entirely
    val (_, gtPrior, _) = reweightByDose(Seq(0, 0, 0), 2.0)
    assert(gtPrior == 2)
    // reweighted PL is still min-0 normalized
    val (pl, _, gq) = reweightByDose(Seq(10, 20, 30), 1.0)
    assert(pl.min == 0 && gq >= 0)
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
