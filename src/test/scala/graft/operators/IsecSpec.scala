package graft.operators

import graft.SparkSpec

/** N-way isec partition classes (create_somatic_gt_file.py:74-170 style). */
class IsecSpec extends SparkSpec {
  import spark.implicits._

  test("partition tags every key with its set-presence bitmask") {
    val a = Seq(1L, 2L, 3L, 3L).toDF("k")       // dup inside a set counts once
    val b = Seq(2L, 3L, 4L).toDF("k")
    val c = Seq(3L, 4L, 5L).toDF("k")
    val out = Isec.partition(Seq(a, b, c), Seq("k")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == ((1L, 1L)))  // private to a
    assert(out(2L) == ((3L, 2L)))  // a+b
    assert(out(3L) == ((7L, 3L)))  // all three
    assert(out(4L) == ((6L, 2L)))  // b+c
    assert(out(5L) == ((4L, 1L)))  // private to c
  }

  test("partitionSizes collapses to one row per class") {
    val a = Seq(1L, 2L).toDF("k")
    val b = Seq(2L, 3L).toDF("k")
    val sizes = Isec.partitionSizes(Seq(a, b), Seq("k")).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(sizes == Map(1L -> 1L, 3L -> 1L, 2L -> 1L))
  }

  test("fused same-source form equals the general partition on random data") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(17)
    // dup keys + a row matching NO predicate (must vanish from both forms)
    val rows = Seq.fill(500)((rnd.nextInt(40).toLong, rnd.nextInt(30).toLong,
      rnd.nextInt(100)))
    val src = rows.toDF("k1", "k2", "v")
    val preds = Seq(col("v") < 30, col("v") % 7 === 0, col("v") >= 55)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val general = canon(Isec.partition(preds.map(src.filter), Seq("k1", "k2")))
    val fused = canon(Isec.partitionFromPredicates(src, preds, Seq("k1", "k2")))
    assert(fused == general)
    assert(general.nonEmpty && general.values.exists(_._2 > 1L),
      "random data should produce multi-set classes")
    val gSizes = Isec.partitionSizes(preds.map(src.filter), Seq("k1", "k2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val fSizes = Isec.partitionSizesFromPredicates(src, preds, Seq("k1", "k2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(fSizes == gSizes)
  }
}
