package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MaxTieCounts — the skew-flat "rows tying the group max, per tag"
  * aggregate j2 runs — against a driver-side brute force, across
  * partitionings (the buffer transitions must be merge-order-invariant)
  * and tie patterns. */
class MaxTieCountsSpec extends SparkSpec {
  import spark.implicits._

  private def brute(rows: Seq[(Long, Double, String)]): Map[String, Long] =
    rows.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      val m = g.map(_._2).max
      g.filter(_._2 == m).map(_._3)
    }.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }

  private def run(rows: Seq[(Long, Double, String)], parts: Int): Map[String, Long] = {
    val mtc = udaf(new MaxTieCounts)
    rows.toDF("k", "v", "tag").repartition(parts)
      .groupBy("k").agg(mtc(col("v"), col("tag")).as("mc"))
      .select(explode(col("mc")).as(Seq("tag", "c")))
      .groupBy("tag").agg(sum("c").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("matches brute force across tie patterns and partitionings") {
    val rnd = new scala.util.Random(0x3a7)
    for (trial <- 1 to 3) {
      // small value domain forces heavy ties; several groups per trial
      val rows = Seq.fill(400 + rnd.nextInt(200)) {
        (rnd.nextInt(12).toLong, rnd.nextInt(5).toDouble,
          Seq("R", "A", "N")(rnd.nextInt(3)))
      }
      val expected = brute(rows)
      for (parts <- Seq(1, 7, 32)) {
        assert(run(rows, parts) == expected,
          s"trial $trial parts=$parts diverges from brute force")
      }
    }
  }

  test("single-row groups and all-tied groups") {
    val rows = Seq(
      (1L, 5.0, "R"),                                // singleton
      (2L, 3.0, "A"), (2L, 3.0, "A"), (2L, 3.0, "N") // all tied at max
    )
    assert(run(rows, 4) == Map("R" -> 1L, "A" -> 2L, "N" -> 1L))
  }

  test("later larger value resets earlier tie counts") {
    val rows = Seq((1L, 1.0, "R"), (1L, 1.0, "R"), (1L, 2.0, "A"))
    assert(run(rows, 2) == Map("A" -> 1L))
  }

  test("NaN orders above +Infinity deterministically; -0.0 ties 0.0") {
    // NaN must win the group under ANY partitioning (Double.compare total
    // order) — under IEEE > / == it would silently drop whichever side
    // arrived second, partitioning-dependently
    val nan = Seq((1L, Double.NaN, "R"), (1L, 5.0, "A"),
      (1L, Double.PositiveInfinity, "N"), (1L, Double.NaN, "A"))
    for (parts <- Seq(1, 2, 7))
      assert(run(nan, parts) == Map("R" -> 1L, "A" -> 1L), s"parts=$parts")
    // mixed zeros are one tie group (SQL = semantics), not two levels
    val zeros = Seq((1L, 0.0, "R"), (1L, -0.0, "A"), (1L, -1.0, "N"))
    for (parts <- Seq(1, 3))
      assert(run(zeros, parts) == Map("R" -> 1L, "A" -> 1L), s"parts=$parts")
  }
}
