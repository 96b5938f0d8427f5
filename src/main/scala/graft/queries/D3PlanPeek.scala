package graft.queries

import org.apache.spark.sql.functions._

/** Diagnostic for the D3StoreProbe regression: print the EXECUTED plans of
  * pairScoresGrouped over the at-rest parquet signature table vs the
  * in-session memo frame, to locate where the store arm loses ~25-30% at
  * the 100x replica despite identical pair sets.
  * Usage: runMain graft.queries.D3PlanPeek [sfDir]
  */
object D3PlanPeek {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = graft.Spark.session("d3-plan-peek")
    val sh = Curation.cachedShingleSets(s, d)
    val th = Curation.cachedTokenHashes(s, d)
    val mhMemo = TextDedup.signatureFrameFromTh(th).persist()
    mhMemo.count()
    val mhStore = s.read.parquet(AtRest.ensureSignatures(s, d))
    def shape(tag: String, df: org.apache.spark.sql.DataFrame): Unit = {
      df.queryExecution.toRdd.count() // execute so AQE finalizes
      val p = df.queryExecution.executedPlan.toString
      println(s"=== $tag ===")
      println(p)
      // anchor each operator name on a non-letter left boundary so the
      // counts are disjoint ("Exchange" must not also count every
      // ReusedExchange/BroadcastExchange — r16 advisor)
      println(s"--- $tag summary: " +
        Seq("Exchange", "ReusedExchange", "BroadcastHashJoin",
          "SortMergeJoin", "ShuffledHashJoin", "FileScan", "InMemoryTableScan")
          .map(k => s"$k=${s"(?<![A-Za-z])$k".r.findAllIn(p).length}")
          .mkString(" "))
    }
    shape("STORE", TextDedup.pairScoresGrouped(s, sh, mhStore))
    shape("MEMO", TextDedup.pairScoresGrouped(s, sh, mhMemo))
    // the same static-stats question for d7/x22's star-edge join-back
    shape("EDGES-STORE", TextDedup.bandStarEdges(mhStore))
    s.stop()
  }
}
