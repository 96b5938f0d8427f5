package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Locus layout: a chrom+pos-range read over the written store must prune
  * partition directories (chrom) and push the pos range to parquet. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def frame = {
    val rnd = new scala.util.Random(11)
    (1 to 5000).map { i =>
      (s"chr${1 + i % 4}", rnd.nextInt(1000000).toLong, s"payload_$i")
    }.toDF("chrom", "pos", "v")
  }

  test("readRegion equals the straight filter and prunes in the plan") {
    val df = frame
    val path = java.nio.file.Files.createTempDirectory("layout").toString
    Layout.writeLocusLayout(df, path, totalShards = 8)
    val got = Layout.readRegion(spark, path, "chr2", 100000L, 500000L)
    val expected = df.filter(col("chrom") === "chr2" &&
      col("pos") >= 100000L && col("pos") < 500000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted.toSeq
    val rows = got.collect()
      .map(r => (r.getAs[String]("chrom"), r.getAs[Long]("pos"), r.getAs[String]("v")))
      .sorted.toSeq
    assert(rows == expected)
    assert(rows.nonEmpty)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("chrom"),
      "chrom equality must prune partition directories")
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThanOrEqual(pos"),
      "pos range must reach the parquet scan")
  }

  test("the layout writes one directory per chromosome") {
    val df = frame
    val path = java.nio.file.Files.createTempDirectory("layout2").toString
    Layout.writeLocusLayout(df, path, totalShards = 8)
    val dirs = new java.io.File(path).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("chrom=")).sorted
    assert(dirs.toSeq == Seq("chrom=chr1", "chrom=chr2", "chrom=chr3", "chrom=chr4"))
  }
}
