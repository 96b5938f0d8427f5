package graft.pipelines

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

class DomainPipelinesSpec extends SparkSpec {
  import spark.implicits._

  test("MotifStats: dense canonical domain is 96 classes, revcomp folds") {
    assert(MotifStats.motifDomain(spark, canonicalOnly = true).count() == 96)
    assert(MotifStats.motifDomain(spark, canonicalOnly = false).count() == 192)
    // TGT ref=G alt=A folds to ACA alt=T; ACA stays
    val snvs = Seq(
      ("T", "G", "T", "A"),   // folds: motif TGT -> revcomp ACA, alt A -> T
      ("A", "C", "A", "T")    // canonical already: ACA, alt T
    ).toDF("left_motif", "ref", "right_motif", "alt")
    val counts = MotifStats.motifCounts(snvs)
    assert(counts.count() == 96)
    val aca = counts.filter(col("motif") === "ACA" && col("alt") === "T")
      .head.getAs[Long]("n")
    assert(aca == 2L, "forward + revcomp counts must fold onto one class")
    assert(counts.agg(sum("n")).head.getLong(0) == 2L)
  }

  test("HitFraction: broadcast semi-join fraction with AF floor") {
    val calls = Seq(
      ("1", 100L, "A", "T", 0.5), ("1", 200L, "G", "C", 0.5),
      ("1", 300L, "T", "A", 0.01) // below minAf: ignored
    ).toDF("chrom", "pos", "ref", "major_alt", "af")
    val truth = Seq(("1", 100L, "A", "T"), ("1", 200L, "G", "C"))
      .toDF("chrom", "pos", "ref", "major_alt")
    val r = HitFraction.hitFraction(calls, truth).head
    assert(r.getAs[Long]("n_hits") == 2L && r.getAs[Long]("n_truth") == 2L)
    assert(r.getAs[Double]("hit_fraction") == 1.0 && r.getAs[Boolean]("accepted"))
  }

  test("ImputationRefinement: dosage prior flips calls and counters tally") {
    val df = Seq(
      ("snp", Seq(0, 30, 40), 2.0),   // hom-ref likelihood vs all-alt prior
      ("snp", Seq(40, 30, 0), 2.0),   // already hom-alt: stays
      ("indel", Seq(30, 0, 30), 1.0)  // het likelihood, balanced prior: stays
    ).toDF("variant_type", "pl", "dose")
    val counters = ImputationRefinement.changeCounters(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // hom-ref and hom-alt calls keep their genotype (hom-ref prior is
    // pinned to 1 and the ref/alt balance is preserved)
    assert(counters((("snp", "same"))) == 2L)
    assert(counters.keys.exists(_._1 == "indel"))
    val corrected = ImputationRefinement.correct(df)
    assert(corrected.filter(col("gq_corrected") < 0).count() == 0)
  }

  test("SkewJoin: salted join equals plain join result") {
    val big = (1 to 2000).map(i => (if (i % 10 == 0) "hot" else s"k$i", i))
      .toDF("key", "v")
    val small = Seq(("hot", 1.0), ("k5", 2.0)).toDF("key", "w")
    val plain = big.join(small, Seq("key")).agg(count(lit(1)), sum("v")).head
    val salted = SkewJoin.saltedJoin(big, small, "key", parts = 8)
      .agg(count(lit(1)), sum("v")).head
    assert(plain.getLong(0) == salted.getLong(0) && plain.getLong(1) == salted.getLong(1))
  }

  test("ConvertHaploidRegions: PL collapses to haploid only inside regions") {
    val variants = Seq(
      ("X", 100L, Seq(0, 20, 100)),  // inside region
      ("X", 900L, Seq(0, 20, 100))   // outside
    ).toDF("chrom", "pos", "pl")
    val regions = Seq(("X", 50L, 200L)).toDF("chrom", "bstart", "bend")
    val out = ConvertHaploidRegions.convert(variants, regions).collect()
      .map(r => r.getLong(1) -> r).toMap
    val in100 = out(100L)
    assert(in100.getSeq[Int](in100.fieldIndex("haploid_pl")).toSeq == Seq(0, 100))
    assert(in100.getAs[Int]("haploid_gt") == 0 && in100.getAs[Int]("haploid_gq") == 100)
    assert(out(900L).isNullAt(out(900L).fieldIndex("haploid_gt")))
  }

  test("ConvertHaploidRegions: no-call genotypes stay no-call (convert_haploid_regions.py:65-68)") {
    val variants = Seq(
      ("X", 100L, Seq(0, 20, 100), Seq[Integer](0, 1)),      // called
      ("X", 120L, Seq(0, 20, 100), Seq[Integer](null, null)) // (None, None)
    ).toDF("chrom", "pos", "pl", "gt")
    val regions = Seq(("X", 50L, 200L)).toDF("chrom", "bstart", "bend")
    val out = ConvertHaploidRegions.convert(variants, regions).collect()
      .map(r => r.getLong(1) -> r).toMap
    assert(out(100L).getAs[Int]("haploid_gt") == 0)
    // no-call: the collapsed PL is still written but the GT stays null
    val nc = out(120L)
    assert(nc.getSeq[Int](nc.fieldIndex("haploid_pl")).toSeq == Seq(0, 100))
    assert(nc.isNullAt(nc.fieldIndex("haploid_gt")))
  }

  test("ConvertHaploidRegions: membership is region_start < pos <= region_end (convert_haploid_regions.py:26-35)") {
    val variants = Seq(
      ("X", 50L, Seq(0, 20, 100)),   // pos == region_start: OUTSIDE
      ("X", 51L, Seq(0, 20, 100)),   // first position inside
      ("X", 200L, Seq(0, 20, 100)),  // pos == region_end: INSIDE
      ("X", 201L, Seq(0, 20, 100))   // just past the end: outside
    ).toDF("chrom", "pos", "pl")
    val regions = Seq(("X", 50L, 200L)).toDF("chrom", "bstart", "bend")
    val out = ConvertHaploidRegions.convert(variants, regions).collect()
      .map(r => r.getLong(1) -> r).toMap
    def converted(pos: Long): Boolean = !out(pos).isNullAt(out(pos).fieldIndex("haploid_gt"))
    assert(!converted(50L))
    assert(converted(51L))
    assert(converted(200L))
    assert(!converted(201L))
  }
}
