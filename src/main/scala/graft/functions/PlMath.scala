package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Genotype-likelihood (PL) vector math — F14 in SURVEY.md §2.8.
  *
  * A PL vector holds phred-scaled genotype likelihoods in the standard
  * triangular layout: for alleles a <= b the genotype (a,b) sits at index
  * b*(b+1)/2 + a; n alleles give n*(n+1)/2 entries. Homozygous (i,i) is at
  * i*(i+1)/2 + i.
  *
  * Reference semantics:
  *  - diploid→haploid renormalization: ugvc/pipelines/convert_haploid_regions.py:38-70
  *  - PL3 compression (ref-pair / het / hom-alt class minima): ugvc/joint/compress_gvcf.py:28-60
  *  - imputation prior reweighting: ugvc/pipelines/correct_genotypes_by_imputation.py:182-251
  *
  * Implemented as typed Scala UDFs over ArrayType — the logic is per-row
  * index arithmetic with data-dependent loops, the one place SURVEY §2.11
  * sanctions UDFs. All pure functions, exposed both as plain Scala (unit
  * tested) and as Columns.
  */
object PlMath {

  /** Index of genotype (a,b), a <= b, in the triangular PL layout. */
  def plIndex(a: Int, b: Int): Int = b * (b + 1) / 2 + a

  /** Number of alleles for a triangular PL vector of size m. */
  def nAlleles(m: Int): Int = ((math.sqrt(8.0 * m + 1) - 1) / 2).toInt

  /** Diploid → haploid: keep homozygous entries, unphred, renormalize,
    * re-phred; returns the haploid PL (one entry per allele).
    * convert_haploid_regions.py:38-70. */
  def toHaploid(pl: Seq[Int]): Seq[Int] = {
    val n = nAlleles(pl.size)
    val homs = (0 until n).map(i => pl(plIndex(i, i)))
    val probs = homs.map(q => math.pow(10.0, -q / 10.0))
    val tot = probs.sum
    val renorm = probs.map(_ / tot)
    val minQ = renorm.map(p => -10.0 * math.log10(p))
    val shift = minQ.min
    minQ.map(q => math.round(q - shift).toInt)
  }

  /** Haploid genotype call from a haploid PL: argmin index, with GQ =
    * second-min minus min (ties keep the lower index). */
  def haploidCall(haploidPl: Seq[Int]): (Int, Int) = {
    val gt = haploidPl.indices.minBy(i => (haploidPl(i), i))
    val rest = haploidPl.indices.filter(_ != gt)
    val gq = if (rest.isEmpty) 0 else rest.map(haploidPl).min - haploidPl(gt)
    (gt, gq)
  }

  /** Compress a triangular PL to 3 classes (compress_gvcf.py:28-60):
    * [ hom-ref, min over het-with-ref, min over everything-else ]. */
  def compressPl3(pl: Seq[Int]): Seq[Int] = {
    val n = nAlleles(pl.size)
    val homRef = pl(0)
    val hetRef = (1 until n).map(b => pl(plIndex(0, b)))
    val rest = for {
      b <- 1 until n; a <- 1 to b
    } yield pl(plIndex(a, b))
    Seq(homRef,
      if (hetRef.isEmpty) Int.MaxValue else hetRef.min,
      if (rest.isEmpty) Int.MaxValue else rest.min)
  }

  /** Reweight a diploid 3-PL by an imputation dosage prior and re-call
    * (correct_genotypes_by_imputation.py:182-251): prior over {ref/ref,
    * ref/alt, alt/alt} from dose d in [0,2] under Hardy-Weinberg,
    * posterior = likelihood * prior renormalized, GT = argmin of the new
    * PL (ties keep original), GQ = secondMin - min. */
  def reweightByDose(pl3: Seq[Int], dose: Double): (Seq[Int], Int, Int) = {
    require(pl3.size == 3)
    val p = math.max(0.0, math.min(1.0, dose / 2.0))
    val prior = Seq((1 - p) * (1 - p), 2 * p * (1 - p), p * p).map(x => math.max(x, 1e-12))
    val lik = pl3.map(q => math.pow(10.0, -q / 10.0))
    val post = lik.zip(prior).map { case (l, pr) => l * pr }
    val tot = post.sum
    val q = post.map(x => -10.0 * math.log10(x / tot))
    val shift = q.min
    val newPl = q.map(x => math.round(x - shift).toInt)
    val gt = newPl.indices.minBy(i => (newPl(i), i))
    val sorted = newPl.sorted
    (newPl, gt, sorted(1) - sorted(0))
  }

  // ---- Column bindings ----------------------------------------------------

  val toHaploidUdf: Column => Column = {
    val f = udf((pl: Seq[Int]) => if (pl == null) null else toHaploid(pl))
    c => f(c)
  }
  val compressPl3Udf: Column => Column = {
    val f = udf((pl: Seq[Int]) => if (pl == null) null else compressPl3(pl))
    c => f(c)
  }
  val reweightUdf: (Column, Column) => Column = {
    val f = udf((pl3: Seq[Int], dose: Double) =>
      if (pl3 == null) null else {
        val (pl, gt, gq) = reweightByDose(pl3, dose)
        (pl, gt, gq)
      })
    (c, d) => f(c, d)
  }

  /** Elementwise-min aggregator for PL vectors (SURVEY.md §2.11) — the
    * groupwise merge used by gVCF block compression when expressed
    * relationally. Vectors of unequal length are min-merged over the
    * shorter prefix padded with the other's values. */
  object ElementwiseMinPl extends Aggregator[Seq[Int], Seq[Int], Seq[Int]] {
    def zero: Seq[Int] = Seq.empty
    def reduce(buf: Seq[Int], row: Seq[Int]): Seq[Int] = merge(buf, row)
    def merge(a: Seq[Int], b: Seq[Int]): Seq[Int] =
      if (a.isEmpty) b else if (b.isEmpty) a
      else a.zipAll(b, Int.MaxValue, Int.MaxValue).map { case (x, y) => math.min(x, y) }
    def finish(r: Seq[Int]): Seq[Int] = r
    def bufferEncoder: Encoder[Seq[Int]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Int]]()
    def outputEncoder: Encoder[Seq[Int]] = bufferEncoder
  }
}
