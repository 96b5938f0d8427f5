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
}
