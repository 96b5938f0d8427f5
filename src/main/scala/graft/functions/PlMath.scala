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
    * truncate each re-phred entry to int (`int(-10*log10(p))`), THEN
    * min-shift; returns the haploid PL (one entry per allele). A 2-entry
    * PL is already haploid and passes through unchanged
    * (convert_haploid_regions.py:43-57). */
  def toHaploid(pl: Seq[Int]): Seq[Int] = {
    if (pl.size == 2) return pl
    val n = nAlleles(pl.size)
    val homs = (0 until n).map(i => pl(plIndex(i, i)))
    val probs = homs.map(q => math.pow(10.0, -q / 10.0))
    val tot = probs.sum
    val ints = probs.map(p => (-10.0 * math.log10(p / tot)).toInt)
    val shift = ints.min
    ints.map(_ - shift)
  }

  /** Haploid genotype call from a haploid PL: the called haplotype is the
    * LAST index whose PL is 0, and GQ is the minimum nonzero PL (10000 when
    * every entry is zero) — a single pass mirroring the reference's loop
    * (convert_haploid_regions.py:58-64). */
  def haploidCall(haploidPl: Seq[Int]): (Int, Int) = {
    var gt = 0
    var gq = 10000
    var i = 0
    while (i < haploidPl.length) {
      val p = haploidPl(i)
      if (p == 0) gt = i else if (p < gq) gq = p
      i += 1
    }
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

  /** Genotype pair (a, b), a <= b, at triangular index `idx`. */
  def invIndex(idx: Int): (Int, Int) = {
    var b = 0
    while ((b + 1) * (b + 2) / 2 <= idx) b += 1
    (idx - b * (b + 1) / 2, b)
  }

  /** Imputation genotype priors from per-alt-allele dosages
    * (correct_genotypes_by_imputation.py:182-207; goldens
    * test_correct_genotypes_by_imputation.py:9-44): per alt allele a,
    * f_het = clamp(2 - ds_a), f_hom = clamp(ds_a - 1) into [eps, 1-eps];
    * a genotype's prior is the max over its alt alleles (missing dosage →
    * eps); hom-ref is pinned to 1. */
  def imputationPriors(ds: Seq[Option[Double]], nAlt: Int,
                       epsilon: Double): Seq[Double] = {
    def clamp(x: Double) = math.max(epsilon, math.min(x, 1 - epsilon))
    val fHet = ds.map(_.map(d => clamp(2 - d)))
    val fHom = ds.map(_.map(d => clamp(math.max(d, 1) - 1)))
    val m = nAlt + 1
    (0 until m * (m + 1) / 2).map { idx =>
      val (a, b) = invIndex(idx)
      if (a == 0 && b == 0) 1.0
      else (1 to nAlt).map { al =>
        if (a == al || b == al)
          (if (a == b) fHom(al - 1) else fHet(al - 1)).getOrElse(epsilon)
        else 0.0
      }.max
    }
  }

  /** Reweight a triangular PL by imputation dosages and re-call
    * (modify_stats_with_imp, correct_genotypes_by_imputation.py:209-253):
    * unphred, multiply alt entries by the genotype priors, renormalize the
    * alt mass so the ref/alt balance is preserved (hom-ref PL is never
    * changed), re-phred and min-shift with rounding; GT keeps the current
    * call on ties, else argmin; GQ = gap between the two smallest PLs. */
  def reweightByDose(pl: Seq[Int], ds: Seq[Option[Double]],
                     currentGt: (Int, Int),
                     epsilon: Double = 0.01): (Seq[Int], Int, (Int, Int)) = {
    val nAlt = nAlleles(pl.size) - 1
    val f = imputationPriors(ds, nAlt, epsilon)
    val u = pl.map(q => math.pow(10.0, -q / 10.0))
    val pf = u.zip(f).map { case (x, y) => x * y }
    val scale = u.tail.sum / pf.tail.sum
    val pfn = u.head +: pf.tail.map(_ * scale)
    val phredv = pfn.map(p => -10.0 * math.log10(p))
    val mn = phredv.min
    val newPl = phredv.map(q => math.round(q - mn).toInt)
    val gtIdx = plIndex(currentGt._1, currentGt._2)
    val newGt =
      if (phredv(gtIdx) == mn) currentGt
      else invIndex(phredv.zipWithIndex.minBy { case (v, i) => (v, i) }._2)
    val sorted = newPl.sorted
    (newPl, sorted(1) - sorted(0), newGt)
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
  /** toHaploid + haploidCall in one pass: returns (haploid_pl, gt, gq).
    * `noCall` carries the reference's 'maintain no call' step
    * (convert_haploid_regions.py:65-68): when the original GT[0] was None
    * the haploid GT stays null (the PL/GQ are still computed, as the
    * reference still writes the collapsed PL). */
  val haploidConvertUdf: (Column, Column) => Column = {
    val f = udf((pl: Seq[Int], noCall: Boolean) =>
      if (pl == null) null else {
        val h = toHaploid(pl)
        val (gt, gq) = haploidCall(h)
        (h, if (noCall) None else Some(gt), gq)
      })
    (c, n) => f(c, n)
  }
  /** Biallelic binding: one dose column, current GT = argmin of the input
    * PL; returns (pl, gtIndex, gq) where gtIndex is the triangular index. */
  val reweightUdf: (Column, Column) => Column = {
    val f = udf((pl3: Seq[Int], dose: Double) =>
      if (pl3 == null) null else {
        val curIdx = pl3.indices.minBy(i => (pl3(i), i))
        val (pl, gq, gt) = reweightByDose(pl3, Seq(Some(dose)), invIndex(curIdx))
        (pl, plIndex(gt._1, gt._2), gq)
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
