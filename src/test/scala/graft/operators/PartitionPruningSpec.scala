package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The S1 posture at genome scale: depth written partitioned by chrom means
  * a per-contig query touches one directory, not 3.1e9 rows — verified
  * structurally via PartitionFilters in the scan. */
class PartitionPruningSpec extends SparkSpec {
  import spark.implicits._

  test("chrom-partitioned depth scan prunes partitions for contig queries") {
    val dir = Files.createTempDirectory("graftdepth").toString
    val depth = (for {
      c <- Seq("chr1", "chr2", "chr3"); p <- 0L until 500L
    } yield (c, p, p + 1, (p % 60).toDouble)).toDF("chrom", "start", "end", "coverage")
    depth.write.mode("overwrite").partitionBy("chrom").parquet(dir)

    val q = spark.read.parquet(dir)
      .filter(col("chrom") === "chr2" && col("start") >= 100 && col("start") < 200)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.matches("(?s).*PartitionFilters: \\[[^\\]]*chrom[^\\]]*\\].*"),
      s"chrom filter must prune partitions:\n$plan")
    assert(plan.contains("PushedFilters") && plan.contains("start"),
      "start range must push to parquet")
    assert(q.count() == 100)
  }
}
