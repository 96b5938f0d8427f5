package graft.reports

import graft.SparkSpec
import graft.sources.MultiTable
import java.nio.file.Files

class VarReportSpec extends SparkSpec {
  import spark.implicits._

  private def concordance = {
    val rnd = new scala.util.Random(11)
    (1 to 200).map { i =>
      val tp = i % 4 != 0
      (i % 2 == 0, (i % 7).toLong, tp, !tp && i % 8 == 0, !tp && i % 8 != 0,
        rnd.nextDouble() * 100, i.toLong)
    }.toDF("indel", "hmer_indel_length", "tp", "fp", "fn", "score", "row_key")
  }

  test("report tables: metrics per stratum, curve, optimal point (report_utils.py:67-106)") {
    val t = VarReport.tables(concordance)
    assert(t.keySet == Set("accuracy_metrics", "recall_precision_curve",
      "optimal_recall_precision"))
    val cats = t("accuracy_metrics").select("category").as[String].collect().toSet
    assert(cats.contains("ALL") && cats.contains("SNP") && cats.contains("INDEL"))
    val opt = t("optimal_recall_precision").collect()
    assert(opt.length == 1 && opt.head.getAs[Double]("f1") > 0.0)
  }

  test("report round-trips through the keyed store and answers SQL") {
    val dir = Files.createTempDirectory("graftreport").toString
    VarReport.write(concordance, dir)
    assert(MultiTable.keys(spark, dir).toSet ==
      Set("accuracy_metrics", "recall_precision_curve", "optimal_recall_precision"))
    VarReport.registerViews(spark, concordance)
    val snp = spark.sql(
      "SELECT precision, recall FROM accuracy_metrics WHERE category = 'ALL'").head
    assert(snp.getDouble(0) > 0 && snp.getDouble(1) > 0)
  }
}
