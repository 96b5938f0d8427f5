import org.apache.spark.sql.functions._

/** d7 (duplicate-cluster resolution) stage profile at the 100x replica:
  * where do the ~9.6 s go — the cold signature pass (md5 per token over
  * the corpus), the star-edge build (band explode + per-band stats +
  * join-back + distinct), or the CC label-propagation rounds themselves
  * (fused round 1 + jumped rounds over the persisted edge set)? The CC
  * operator's own levers are already measured (pointer jumping 128->104 s
  * on the pre-star r11 graph; star edges vs clique pairs collapsed the
  * edge count from 22.6 M to <= BANDS x docs) — this probe records the
  * residual split so the 9.6 s carries the same evidence the other
  * heavies do. Band key construction is replicated inline from
  * TextDedup.bandStructs (K=8, 4 bands of 2 rows — a probe-local copy,
  * the library keeps its one definition). Usage: runMain D7Probe /tmp/sf100 [reps]
  */
object D7Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf100")
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = graft.Spark.session("d7-probe")

    def docs = graft.Tables.documents(spark, d)
    def timedWarm(name: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[d7probe] $name%-26s $t%7.2f s")
      t
    }
    def timed(name: String)(f: => Unit): Double = {
      graft.Bench.coldReset(spark) // cold stages; warm-input stages use timedWarm
      timedWarm(name)(f)
    }
    def sink(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // the library's ONE banding definition — no probe-local replica that
    // could silently diverge from what d7 actually runs
    def starEdges(mh: org.apache.spark.sql.DataFrame) =
      graft.queries.TextDedup.bandStarEdges(mh)

    docs.agg(count(lit(1))).collect() // warm-up
    // round 14: pre-seed the at-rest store so the from-store arm prices
    // the steady state (the build itself is x19's honestly-priced cost)
    graft.queries.AtRest.ensureSignatures(spark, d)

    for (rep <- 1 to reps) {
      println(s"[d7probe] --- rep $rep ---")
      timed("shipped(d7 registered)") {
        sink(graft.SparkEntry.queries("d7_dedup_resolve")(spark, d))
      }
      timed("alt:from-atrest") {
        val mhStore = spark.read.parquet(
          graft.queries.AtRest.ensureSignatures(spark, d))
        sink(graft.operators.Dedup.connectedComponents(starEdges(mhStore))
          .select(col("id").as("doc_id"), col("comp").as("canonical")))
      }
      timed("stage:signatures") {
        sink(graft.queries.TextDedup.signatureFrame(docs))
      }
      // warm signature frame for the remaining stage isolations (no
      // coldReset before these — the warm input IS the isolation)
      graft.Bench.coldReset(spark)
      val mh = graft.queries.TextDedup.signatureFrame(docs).persist()
      mh.count()
      timedWarm("stage:star-edges(warm mh)") { sink(starEdges(mh)) }
      val edges = starEdges(mh).persist()
      edges.count()
      // capture the labels frame so the summary line reads the CC run the
      // timer measured (labels is checkpoint-backed) instead of paying a
      // whole second CC job for a count
      var labels: org.apache.spark.sql.DataFrame = null
      timedWarm("stage:cc(warm edges)") {
        labels = graft.operators.Dedup.connectedComponents(edges)
        sink(labels)
      }
      println(s"[d7probe] edges=${edges.count()} " +
        s"comps=${labels.agg(countDistinct(col("comp"))).collect()(0).getLong(0)}")
      edges.unpersist(); mh.unpersist()
    }
    spark.stop()
  }
}
