package graft.queries

import org.apache.spark.sql.functions._

/** Same-window interleaved A/B for the r17 question D3PlanPeek left open:
  * should [[TextDedup.bandStarEdges]]'s stats join-back get the same merge
  * hint pairScoresGrouped's join-backs got in r16, or stay adaptive?
  *
  * The structural difference from the d3 pathology: here the would-be
  * broadcast side is the bc>=2-filtered band aggregate ABOVE its own
  * shuffle stage, so under AQE the broadcast-vs-merge choice is made from
  * the aggregate's MEASURED output size (the d3 broadcast side was a
  * scan-side exploded stream with no shuffle below it — static parquet
  * stats were all Catalyst had, and they under-estimated 30x). When the
  * multi-band set is genuinely small (real-corpus dup density), the
  * adaptive broadcast skips re-shuffling the whole exploded band stream —
  * strictly better than the pinned merge join; when it is huge, AQE's
  * re-optimization sees the real size and keeps the shuffle join. So the
  * hint should LOSE or tie at the 100x replica (where every band is
  * multi-member — the aggregate is as large as it ever gets relative to
  * the corpus) and lose clearly at production density. This probe records
  * that anti-lever measurement; edge-set identity is asserted per rep via
  * count/sum(doc_a)/sum(doc_b) checksums.
  *
  * Usage: runMain graft.queries.D7EdgesProbe [sfDir] [reps]
  */
object D7EdgesProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf100")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.Spark.session("d7-edges-probe")

    def timed(name: String)(f: => Seq[Any]): Seq[Any] = {
      graft.Bench.coldReset(spark)
      val t0 = System.nanoTime()
      val r = f
      println(f"[edgeprobe] $name%-18s ${(System.nanoTime() - t0) / 1e9}%7.2f s  sums=$r")
      r
    }
    def sums(df: org.apache.spark.sql.DataFrame): Seq[Any] =
      df.agg(count(lit(1)), sum(col("doc_a")), sum(col("doc_b")))
        .collect()(0).toSeq

    graft.Tables.documents(spark, d).agg(count(lit(1))).collect() // warm-up
    val sig = AtRest.ensureSignatures(spark, d) // pre-seed OUTSIDE timing

    for (rep <- 1 to reps) {
      println(s"[edgeprobe] --- rep $rep ---")
      val arms = Seq(
        "adaptive(shipped)" -> (() =>
          sums(TextDedup.bandStarEdges(spark.read.parquet(sig)))),
        "merge-pinned" -> (() =>
          sums(TextDedup.bandStarEdges(spark.read.parquet(sig),
            pinMerge = true))))
      val run = if (rep % 2 == 1) arms else arms.reverse
      val rs = run.map { case (n, f) => n -> timed(n)(f()) }.toMap
      assert(rs.values.toSet.size == 1,
        s"pinned edge set diverges from adaptive: $rs")
    }
    spark.stop()
  }
}
