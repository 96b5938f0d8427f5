package graft.sources

import graft.SparkSpec
import java.nio.file.Files

class MultiTableSpec extends SparkSpec {
  import spark.implicits._

  test("keyed store round-trips tables with skip-keys and column pruning") {
    val dir = Files.createTempDirectory("graftmt").toString
    val stats = Seq(("mean", 12.5), ("max", 99.0)).toDF("stat", "value")
    val hist = Seq((1, 10L), (2, 20L)).toDF("coverage", "count")
    MultiTable.write(Map("stats" -> stats, "histogram" -> hist), dir)

    assert(MultiTable.keys(spark, dir) == Seq("histogram", "stats"))
    val all = MultiTable.readAll(spark, dir, skipKeys = Set("histogram"))
    assert(all.keySet == Set("stats"))
    assert(all("stats").collect().map(_.getString(0)).toSet == Set("mean", "max"))

    val pruned = MultiTable.read(spark, dir, "histogram", columnsSubset = Seq("count"))
    assert(pruned.columns.toSeq == Seq("count"))
    assert(pruned.as[Long].collect().sorted.toSeq == Seq(10L, 20L))
  }
}
