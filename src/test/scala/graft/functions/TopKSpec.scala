package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** TopKBySim: the bounded-heap partial aggregate behind the ANN rank
  * stages. Pins (1) the raw heap algebra against a brute-force sort
  * under randomized reduce/merge orders — the partitioning-independence
  * a partial aggregate must prove, (2) the end-to-end Dataset form
  * against the row_number window it replaces, tie-heavy on purpose. */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def brute(xs: Seq[(Double, Long)], k: Int): Seq[(Double, Long)] =
    xs.sortWith { (a, c) =>
      val cmp = java.lang.Double.compare(c._1, a._1)
      cmp < 0 || (cmp == 0 && a._2 < c._2)
    }.take(k)

  test("heap algebra == brute force under random reduce/merge trees (tie-heavy fuzz)") {
    val rnd = new scala.util.Random(0x70c1)
    for (trial <- 0 until 60) {
      val k = 1 + rnd.nextInt(7)
      val agg = new TopKBySim(k)
      val n = rnd.nextInt(300)
      // few distinct sims -> dense ties; ids unique
      val xs = (0 until n).map(i => (rnd.nextInt(5).toDouble / 4.0, i.toLong))
      // random partitioning into 1..8 buffers, reduced independently,
      // merged in a random order (the shuffle's associativity contract)
      val parts = xs.grouped(math.max(1, n / (1 + rnd.nextInt(8)) + 1)).toSeq
      val bufs = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
      val merged = rnd.shuffle(bufs).foldLeft(agg.zero)(agg.merge)
      assert(agg.finish(merged) == brute(xs, k), s"trial=$trial k=$k n=$n")
    }
  }

  test("k past the input size returns everything, ranked; empty input returns empty") {
    val agg = new TopKBySim(10)
    val xs = Seq((0.5, 3L), (0.9, 1L), (0.5, 2L))
    val b = xs.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(b) == Seq((0.9, 1L), (0.5, 2L), (0.5, 3L)))
    assert(agg.finish(agg.zero).isEmpty)
  }

  test("Dataset top-k via the aggregate == row_number window, incl. ties") {
    val rnd = new scala.util.Random(0x70c2)
    val rows = (0 until 4000).map { i =>
      (i % 7L, rnd.nextInt(9).toDouble / 8.0, i.toLong) // 7 qids, dense ties
    }.toDF("qid", "sim", "vec_id").repartition(13)
    val topk = udaf(new TopKBySim(5))
    val viaAgg = rows.groupBy("qid").agg(topk(col("sim"), col("vec_id")).as("tk"))
      .select(col("qid"), posexplode(col("tk")))
      .select(col("qid"), (col("pos") + 1).as("rank"),
        col("col._2").as("vec_id"), col("col._1").as("sim"))
      .collect().map(_.toSeq).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("sim").desc, col("vec_id").asc)
    val viaWindow = rows.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("qid", "rank", "vec_id", "sim")
      .collect().map(_.toSeq).toSet
    assert(viaAgg == viaWindow && viaAgg.nonEmpty)
  }
}
