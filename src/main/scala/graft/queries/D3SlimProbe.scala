package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.Text

/** Same-window interleaved A/B for VERDICT r17 #2: slim the d3/d4 band
  * exchange. The shipped shared pass (pairScoresGrouped) ships BOTH the
  * K-long signature vector and the sorted shingle set through the band
  * exchange and scores est-sim + Jaccard inside each band group (a pair
  * co-occurring in b bands is scored b times; dedup afterwards). The slim
  * arm ships ONLY (doc_id, sig) through the band exchange
  * (estSimPairsGrouped), dedups to distinct pairs, then joins the shingle
  * payload back per PAIR SIDE and computes Jaccard once per distinct pair
  * (Text.jaccardSorted — the same exact-integer-double arithmetic as the
  * automaton's closure).
  *
  * The trade under test: band-exchange bytes (each doc's set rides <=
  * BANDS times) + b-fold Jaccard evaluation vs two pair-side joins that
  * ship each doc's set once per pair ROLE plus a light 3-column pair
  * shuffle. At real-corpus dup density pairs << docs and the slim arm's
  * join-back is small; at the 100x replica pairs >> docs (the r10 lesson),
  * so this probe measures the adversarial end.
  *
  * Checksum identity asserted every rep: count / sum(doc_a) / sum(doc_b) /
  * sum(round(est*1e6)) / sum(round(jac*1e6)).
  * Usage: runMain graft.queries.D3SlimProbe [sfDir] [reps]
  */
object D3SlimProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf100")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.Spark.session("d3slim-probe")

    def timed(name: String)(f: => Seq[Any]): Seq[Any] = {
      graft.Bench.coldReset(spark)
      val t0 = System.nanoTime()
      val r = f
      println(f"[d3slim] $name%-18s ${(System.nanoTime() - t0) / 1e9}%7.2f s  sums=$r")
      r
    }
    def sums(df: org.apache.spark.sql.DataFrame): Seq[Any] =
      df.agg(count(lit(1)), sum(col("doc_a")), sum(col("doc_b")),
        sum(round(col("est_sim") * 1e6).cast("long")),
        sum(round(col("jaccard") * 1e6).cast("long"))).collect()(0).toSeq

    graft.Tables.documents(spark, d).agg(count(lit(1))).collect() // warm-up
    AtRest.ensureSignatures(spark, d) // pre-seed OUTSIDE timing (Bench posture)

    for (rep <- 1 to reps) {
      println(s"[d3slim] --- rep $rep ---")
      val arms = Seq(
        "shared(shipped)" -> (() => {
          val sh = Curation.cachedShingleSets(spark, d)
          val mh = spark.read.parquet(AtRest.ensureSignatures(spark, d))
          sums(TextDedup.pairScoresGrouped(spark, sh, mh))
        }),
        "slim(join-back)" -> (() => {
          val sh = Curation.cachedShingleSets(spark, d)
          val mh = spark.read.parquet(AtRest.ensureSignatures(spark, d))
          val pairs = TextDedup.estSimPairsGrouped(spark, mh)
          sums(pairs
            .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("_sha")), Seq("doc_a"))
            .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("_shb")), Seq("doc_b"))
            .select(col("doc_a"), col("doc_b"), col("est_sim"),
              Text.jaccardSorted(col("_sha"), col("_shb")).as("jaccard")))
        }))
      val run = if (rep % 2 == 1) arms else arms.reverse
      val rs = run.map { case (n, f) => n -> timed(n)(f()) }.toMap
      assert(rs.values.toSet.size == 1, s"slim arm diverges: $rs")
    }
    spark.stop()
  }
}
