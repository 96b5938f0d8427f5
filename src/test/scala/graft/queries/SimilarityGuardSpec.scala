package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The flat-broadcast centroid collect must refuse oversized cell counts
  * with guidance instead of OOMing the driver. */
class SimilarityGuardSpec extends SparkSpec {

  test("assignToCells errors past the broadcast-cell cap, pointing at two-level") {
    val all = spark.range(1).select(col("id").as("vec_id"),
      array(lit(0.1), lit(0.2)).as("v"), lit(1.0).as("nrm"))
    val over = spark.range(Similarity.MaxBroadcastCells + 1).select(
      col("id").as("cid"), array(lit(0.1), lit(0.2)).as("cv"), lit(1.0).as("cnrm"))
    val e = intercept[IllegalArgumentException] {
      Similarity.assignToCells(all, over).count()
    }
    assert(e.getMessage.contains("assignToCellsTwoLevel"))

    // at the cap it still works
    val ok = spark.range(3).select(
      col("id").as("cid"), array(lit(0.1) * col("id"), lit(0.2)).as("cv"), lit(1.0).as("cnrm"))
    assert(Similarity.assignToCells(all, ok).count() == 1L)
  }
}
