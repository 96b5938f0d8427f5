package graft.reports

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NoGtReportSpec extends SparkSpec {
  import spark.implicits._

  private def variants = Seq(
    // (ref, alt, left, right, af, gt, hmer)
    ("A", "T", "GGA", "CCC", 0.5, Seq(0, 1), 0L),   // snv
    ("C", "G", "TTT", "AAA", 0.99, Seq(1, 1), 0L),  // snv hom
    ("A", "AT", "GGG", "CCC", 0.3, Seq(0, 1), 2L),  // ins het
    ("ATT", "A", "GGG", "CCC", 1.0, Seq(1, 1), 3L)  // del hom
  ).toDF("ref", "alt", "left_motif", "right_motif", "af", "gt", "hmer_indel_length")

  test("report tables compose: spectrum over SNVs only, AF bins, indel 2-D") {
    val t = NoGtReport.tables(variants)
    // motif spectrum: 96-class dense domain, 2 SNVs counted
    assert(t("motif_spectrum").count() == 96)
    assert(t("motif_spectrum").agg(sum("n")).head.getLong(0) == 2L)
    // AF histogram: af=1.0 clamps into bin 99
    val af = t("af_histogram").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(af(("snp", 50L)) == 1L && af(("snp", 99L)) == 1L)
    assert(af(("ins", 30L)) == 1L && af(("del", 99L)) == 1L)
    // indel 2-D histogram
    val ih = t("indel_histogram").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(ih(("ins", "het", 2L)) == 1L && ih(("del", "hom", 3L)) == 1L)
  }
}
