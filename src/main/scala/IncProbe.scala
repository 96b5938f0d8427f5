import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** A/B for the r18 incrementalComponents contraction (x18/x23's fold step):
  * the r14-r17 union form (full CC over labels-as-stars ∪ new edges) vs the
  * cluster-contracted form (CC over the batch-proportional rep graph + one
  * relabel join). Inputs (old labels, new-batch edges) are built ONCE and
  * persisted so the arms time exactly the fold; every rep asserts (rows,
  * checksum) identity between arms. Usage: runMain IncProbe <sfDir> [reps]
  */
object IncProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.Spark.session("inc-probe")
    spark.range(1000000).selectExpr("id % 97 AS k").groupBy("k").count()
      .write.format("noop").mode("overwrite").save()

    val mh = spark.read.parquet(graft.queries.AtRest.ensureSignatures(spark, d))
    val isNew = pmod(col("doc_id"), lit(5)) === 0
    val labels = graft.operators.Dedup.connectedComponents(
      graft.queries.TextDedup.bandStarEdges(mh.filter(!isNew))).persist()
    println(s"[incprobe] labels=${labels.count()}")
    val newEdges = graft.queries.TextDedup.incrementalEstSimPairs(spark, mh, isNew)
      .select("doc_a", "doc_b").persist()
    println(s"[incprobe] newEdges=${newEdges.count()}")

    def run(name: String, f: => DataFrame): (Long, Long) = {
      val t0 = System.nanoTime()
      val r = f.agg(count(lit(1)), sum(col("id") * 31 + col("comp"))).head()
      val (n, cs) = (r.getLong(0), r.getLong(1))
      println(f"[incprobe] $name%-12s ${(System.nanoTime() - t0) / 1e9}%7.2f s rows=$n checksum=$cs")
      (n, cs)
    }
    for (rep <- 1 to reps) {
      // alternate arm order per rep so JIT/page-cache warmth cannot
      // systematically favor the second arm
      println(s"[incprobe] --- rep $rep ---")
      val (a, b) =
        if (rep % 2 == 1)
          (run(s"union", graft.operators.Dedup.incrementalComponents(labels, newEdges)),
           run(s"contract", graft.operators.Dedup.incrementalComponentsContracted(labels, newEdges)))
        else {
          val y = run(s"contract", graft.operators.Dedup.incrementalComponentsContracted(labels, newEdges))
          val x = run(s"union", graft.operators.Dedup.incrementalComponents(labels, newEdges))
          (x, y)
        }
      assert(a == b, s"arms diverged: $a vs $b")
    }
    spark.stop()
  }
}
