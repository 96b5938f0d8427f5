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

    // probe-local replica of the star-edge build over a signature frame
    def starEdges(mh: org.apache.spark.sql.DataFrame) = {
      val bandStructs = array((1 to 4).map { b =>
        struct(lit(b).as("bid"),
          concat_ws("_", col(s"mh${2 * b - 1}"), col(s"mh${2 * b}")).as("key"))
      }: _*)
      val bands = mh.filter(col("mh1").isNotNull)
        .select(col("doc_id"), explode(bandStructs).as("band"))
        .select(col("doc_id"), col("band.bid").as("bid"), col("band.key").as("key"))
      val stats = bands.groupBy("bid", "key")
        .agg(count(lit(1)).as("bc"), min("doc_id").as("mindoc"))
      bands.join(stats, Seq("bid", "key"))
        .filter(col("bc") >= 2 && col("doc_id") =!= col("mindoc"))
        .select(col("mindoc").as("doc_a"), col("doc_id").as("doc_b"))
        .distinct()
    }

    docs.agg(count(lit(1))).collect() // warm-up

    for (rep <- 1 to reps) {
      println(s"[d7probe] --- rep $rep ---")
      timed("shipped(d7 registered)") {
        sink(graft.SparkEntry.queries("d7_dedup_resolve")(spark, d))
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
      timedWarm("stage:cc(warm edges)") {
        sink(graft.operators.Dedup.connectedComponents(edges))
      }
      println(s"[d7probe] edges=${edges.count()} " +
        s"comps=${graft.operators.Dedup.connectedComponents(edges)
          .agg(countDistinct(col("comp"))).collect()(0).getLong(0)}")
      edges.unpersist(); mh.unpersist()
    }
    spark.stop()
  }
}
