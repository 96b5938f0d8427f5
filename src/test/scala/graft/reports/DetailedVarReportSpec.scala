package graft.reports

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DetailedVarReport — the one-pass stratified performance table against
  * an independent per-stratum brute force that replicates the notebook's
  * pandas loops verbatim (detailedVarReport.v0.ipynb cells 2-6). */
// top-level: a spec-nested case class has no encoder scope
case class DvrV(classifyGt: String, filter: String, treeScore: Double,
  indel: Boolean, indelLength: Int, hmerIndelLength: Int,
  gcContent: Double, coverage: Double, lcr: Boolean, mappability: Boolean,
  ugHcr: Boolean, exome: Boolean)

class DetailedVarReportSpec extends SparkSpec {
  import spark.implicits._

  private type V = DvrV
  private val V = DvrV

  private def mkData(seed: Int, n: Int): Seq[V] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val cls = Seq("tp", "fp", "fn")(rnd.nextInt(3))
      val indel = rnd.nextBoolean()
      V(cls,
        if (rnd.nextBoolean()) "PASS" else "LOW_SCORE",
        // negative scores exercise the opt-sweep mask; the i*1e-7 jitter
        // keeps scores UNIQUE — with exact score ties the notebook's
        // per-row cumulative sweep is intra-tie-order-dependent (pandas
        // quicksort), so tie behavior is undefined in the reference
        math.floor(rnd.nextDouble() * 20 - 2) / 10.0 + i * 1e-7,
        indel,
        if (indel) rnd.nextInt(4) else 0,
        if (indel) rnd.nextInt(13) else 0,
        rnd.nextDouble(), rnd.nextInt(60).toDouble,
        rnd.nextBoolean(), rnd.nextBoolean(), rnd.nextBoolean(),
        rnd.nextBoolean())
    }
  }

  // ---- verbatim pandas replica ------------------------------------------
  private case class C(label: Int, filter: String, cls: String, score: Double,
    cvg: Double, gc: Double)

  private def classifyRef(v: V): C = {
    val label = if (v.classifyGt == "fp") 0 else 1
    val filter = if (v.classifyGt == "fn") "MISS" else v.filter
    val cls =
      if (label == 1 && filter == "PASS") "TP"
      else if (label == 1) "FN"
      else if (filter != "PASS") "TN"
      else "FP"
    // notebook cell 1: tree_score = np.where(classify_gt=='fn', -1, score)
    val score = if (v.classifyGt == "fn") -1.0 else v.treeScore
    C(label, filter, cls, score, v.coverage, v.gcContent)
  }

  private def statRef(d: Seq[C]): Option[(Long, Long, Long, Double, Double, Double, Double)] = {
    val pos = d.count(_.label == 1)
    if (d.isEmpty || pos == 0) return None
    val tp = d.count(_.cls == "TP"); val fp = d.count(_.cls == "FP")
    val fn = d.count(_.cls == "FN")
    val maxRecall = 1.0 - d.count(_.filter == "MISS").toDouble / pos
    val recall = tp.toDouble / (tp + fn)
    val precision = if (tp + fp > 0) tp.toDouble / (tp + fp) else Double.NaN
    val f1 = tp / (tp + 0.5 * fn + 0.5 * fp)
    Some((tp.toLong, fp.toLong, fn.toLong, maxRecall, recall, precision, f1))
  }

  private def optRef(d0: Seq[C]): Option[(Double, Double, Double)] = {
    val d = d0.sortBy(_.score)
    val pos = d.count(_.label == 1); val neg = d.size - pos
    if (d.isEmpty) return None
    var cfn = 0; var cneg = 0
    val rows = d.map { c =>
      cfn += c.label; cneg += 1 - c.label
      val tp = pos - cfn; val fp = neg - cneg
      (c.score, tp, cfn, fp)
    }.filter { case (s, tp, fn, fp) => tp + fn >= 1 && tp + fp >= 1 && s >= 0 }
    if (rows.isEmpty) return None
    val withF1 = rows.map { case (s, tp, fn, fp) =>
      (s, tp.toDouble / (tp + fn), tp.toDouble / (tp + fp),
        tp / (tp + 0.5 * fn + 0.5 * fp)) }
    val maxF1 = withF1.map(_._4).max
    val first = withF1.find(_._4 == maxF1).get
    Some((first._2, first._3, first._4))
  }

  private def varCatRef(cat: String, v: V): Boolean = cat match {
    case "All" => true
    case "SNP" => !v.indel
    case "Indel" => v.indel
    case "non-hmer" => v.indel && v.hmerIndelLength == 0 && v.indelLength > 1
    case "hmer 0-1" => v.indel && v.hmerIndelLength == 0 && v.indelLength <= 1
    case "hmer 2-4" => v.indel && v.hmerIndelLength > 0 && v.hmerIndelLength <= 4
    case "hmer 5-8" => v.indel && v.hmerIndelLength > 4 && v.hmerIndelLength <= 8
    case "hmer 9-10" => v.indel && v.hmerIndelLength > 8 && v.hmerIndelLength <= 10
    case "hmer 11+" => v.indel && v.hmerIndelLength > 10
  }

  private def catRef(cat: String, v: V): Boolean = cat match {
    case "All" => true
    case "GC 0-20" => v.gcContent >= 0 && v.gcContent < 0.2
    case "GC 20-80" => v.gcContent >= 0.2 && v.gcContent < 0.8
    case "GC 80-100" => v.gcContent >= 0.8 && v.gcContent < 1.0
    case "CVG 0-20" => v.coverage >= 0 && v.coverage < 20
    case "CVG 20-40" => v.coverage >= 20 && v.coverage < 40
    case "CVG 40-100" => v.coverage >= 40 && v.coverage < 100
    case "LCR" => v.lcr
    case "Non-LCR" => !v.lcr
    case "Mappable" => v.mappability
    case "Non-Mappable" => !v.mappability
    case "UG high confidence" => v.ugHcr
    case "UG low confidence" => !v.ugHcr
  }

  private val cats = Seq("All", "GC 0-20", "GC 20-80", "GC 80-100",
    "CVG 0-20", "CVG 20-40", "CVG 40-100", "LCR", "Non-LCR", "Mappable",
    "Non-Mappable", "UG high confidence", "UG low confidence")

  test("detailed_vars matches the verbatim pandas brute force on every stratum") {
    val data = mkData(0x1dd, 400)
    val df = data.toDF()
      .select(col("classifyGt").as("classify_gt"), col("filter"),
        col("treeScore").as("tree_score"), col("indel"),
        col("indelLength").as("indel_length"),
        col("hmerIndelLength").as("hmer_indel_length"),
        col("gcContent").as("gc_content"), col("coverage"), col("lcr"),
        col("mappability"), col("ugHcr").as("ug_hcr"), col("exome"))
    val out = DetailedVarReport.detailedVars(df, Seq("Exome" -> col("exome")))
      .collect()
      .map(r => (r.getAs[String]("region"), r.getAs[String]("variant"),
        r.getAs[String]("category")) -> r).toMap

    val regions = Seq("All", "Exome")
    var checked = 0
    for (reg <- regions; vc <- DetailedVarReport.VariantCategories; cat <- cats) {
      val sel = data.filter(v => (reg == "All" || v.exome) &&
        varCatRef(vc, v) && catRef(cat, v))
      val key = (reg, vc, cat)
      if (sel.isEmpty) {
        assert(!out.contains(key), s"unexpected row for empty stratum $key")
      } else {
        checked += 1
        val row = out.getOrElse(key, fail(s"missing stratum $key"))
        val cs = sel.map(classifyRef)
        assert(row.getAs[Long]("num_pos") == cs.count(_.label == 1), key)
        statRef(cs) match {
          case None =>
            assert(row.isNullAt(row.fieldIndex("f1_stat")), key)
            assert(row.isNullAt(row.fieldIndex("tp")), key)
          case Some((tp, fp, fn, maxR, rec, prec, f1)) =>
            assert(row.getAs[Long]("tp") == tp, key)
            assert(row.getAs[Long]("fp") == fp, key)
            assert(row.getAs[Long]("fn") == fn, key)
            assert(math.abs(row.getAs[Double]("max_recall") - maxR) < 1e-12, key)
            assert(math.abs(row.getAs[Double]("recall_stat") - rec) < 1e-12, key)
            if (!prec.isNaN)
              assert(math.abs(row.getAs[Double]("precision_stat") - prec) < 1e-12, key)
            assert(math.abs(row.getAs[Double]("f1_stat") - f1) < 1e-12, key)
        }
        optRef(cs) match {
          case None => assert(row.isNullAt(row.fieldIndex("f1_opt")), key)
          case Some((rec, prec, f1)) =>
            assert(math.abs(row.getAs[Double]("recall_opt") - rec) < 1e-12, key)
            assert(math.abs(row.getAs[Double]("precision_opt") - prec) < 1e-12, key)
            assert(math.abs(row.getAs[Double]("f1_opt") - f1) < 1e-12, key)
        }
        val avgCvg = cs.map(_.cvg).sum / cs.size
        assert(math.abs(row.getAs[Double]("avg_cvg") - avgCvg) < 1e-9, key)
      }
    }
    assert(checked > 100, s"only $checked non-empty strata — data too thin")
  }

  test("registerAll registers detailed_vars") {
    val df = mkData(7, 60).toDF()
      .select(col("classifyGt").as("classify_gt"), col("filter"),
        col("treeScore").as("tree_score"), col("indel"),
        col("indelLength").as("indel_length"),
        col("hmerIndelLength").as("hmer_indel_length"),
        col("gcContent").as("gc_content"), col("coverage"), col("lcr"),
        col("mappability"), col("ugHcr").as("ug_hcr"), col("exome"))
    val names = Reports.registerAll(spark, detailed = Some(
      Reports.DetailedInputs(df, Seq("Exome" -> col("exome")))))
    assert(names == Seq("detailed_vars"))
    assert(spark.sql(
      "SELECT * FROM detailed_vars WHERE variant = 'SNP'").count() > 0)
  }
}
