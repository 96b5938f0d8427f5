import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Where do d7/x18/x22/x23's seconds go at bench scale — the star-edge
  * build, or the CC label-propagation rounds (and how many rounds run)?
  * Times a phase-instrumented REPLICA of Dedup.connectedComponents' loop
  * (same dataflow, extra timers) and asserts its (rows, checksum) equal
  * the library CC's every rep so the replica cannot silently diverge.
  * Usage: runMain CcProbe <sfDir> [reps]
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = graft.Spark.session("cc-probe")
    spark.range(1000000).selectExpr("id % 97 AS k").groupBy("k").count()
      .write.format("noop").mode("overwrite").save()
    graft.queries.AtRest.ensureSignatures(spark, d)

    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ccprobe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    /** mode: "nojump" | "jumpCur" (r17 shipped: jump via the CURRENT round's
      * freshly checkpointed table — 2 checkpoints/round) | "jumpPrev" (r18
      * candidate: jump via the PREVIOUS round's already-materialized table,
      * folded into the same projection — 1 checkpoint/round). */
    def replica(mode: String): (Long, Long, Double) = {
      val jump = mode != "nojump"
      val t0 = System.nanoTime()
      val mh = spark.read.parquet(graft.queries.AtRest.ensureSignatures(spark, d))
      val pairs = graft.queries.TextDedup.bandStarEdges(mh)
      val edges = t("edges build+persist") {
        val e = pairs.select(explode(array(
            struct(col("doc_a").as("src"), col("doc_b").as("dst")),
            struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
          .select(col("e.src").as("src"), col("e.dst").as("dst"))
          .repartition(col("dst"))
          .persist()
        e.count()
        e
      }
      var labels = t("round 1 (fused) + cp") {
        val l = edges.groupBy(col("dst"))
          .agg(min(col("src")).as("_nmin"))
          .select(col("dst").as("id"), least(col("dst"), col("_nmin")).as("comp"))
          .localCheckpoint()
        l.count()
        l
      }
      val nNodes = t("jump-gate count")(labels.count())
      var iter = 1
      var converged = false
      while (iter < 10 && !converged) {
        val (updated, changed) = t(s"round ${iter + 1} join+cp+count") {
          val neighborMin = edges.join(labels, edges("dst") === labels("id"))
            .groupBy(col("src")).agg(min("comp").as("ncomp"))
          var u =
            if (mode == "jumpPrev") {
              // jump through the PREVIOUS labels table (already
              // materialized) inside the SAME round projection — one
              // checkpoint per round instead of two
              val cand = labels.join(neighborMin, labels("id") === neighborMin("src"), "left")
                .select(col("id"), col("comp").as("_old"),
                  least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("_c1"))
              val j = labels.select(col("id").as("_jid"), col("comp").as("_jcomp"))
              cand.join(j, cand("_c1") === j("_jid"), "left")
                .select(col("id"), col("_old"),
                  least(col("_c1"), coalesce(col("_jcomp"), col("_c1"))).as("comp"))
                .localCheckpoint()
            } else labels.join(neighborMin, labels("id") === neighborMin("src"), "left")
              .select(col("id"), col("comp").as("_old"),
                least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"))
              .localCheckpoint()
          if (mode == "jumpCur") {
            val j = u.select(col("id").as("_jid"), col("comp").as("_jcomp"))
            u = u.join(j, u("comp") === j("_jid"), "left")
              .select(u("id"), u("_old"),
                coalesce(col("_jcomp"), u("comp")).as("comp"))
              .localCheckpoint()
          }
          (u, u.filter(col("comp") =!= col("_old")).count())
        }
        labels = updated.select("id", "comp")
        converged = changed == 0
        println(s"[ccprobe]   changed=$changed nodes=$nNodes")
        iter += 1
      }
      edges.unpersist()
      val r = labels.agg(count(lit(1)), sum(col("comp"))).head
      (r.getLong(0), r.getLong(1), (System.nanoTime() - t0) / 1e9)
    }

    for (rep <- 1 to reps) {
      println(s"[ccprobe] --- rep $rep ---")
      graft.Bench.coldReset(spark)
      println("[ccprobe] ARM jump-cur (r17 shipped: 2 cp/round)")
      val (n, sum1, wallCur) = replica("jumpCur")
      graft.Bench.coldReset(spark)
      println("[ccprobe] ARM jump-prev (1 cp/round)")
      val (nJ, sumJ, wallPrev) = replica("jumpPrev")
      assert(n == nJ && sum1 == sumJ,
        s"jump-prev arm diverged: ($n,$sum1) vs ($nJ,$sumJ)")
      println(f"[ccprobe] walls: jump-cur $wallCur%.2f s  jump-prev $wallPrev%.2f s")
      graft.Bench.coldReset(spark)
      val (n2, sum2) = t("library CC end-to-end") {
        val mh2 = spark.read.parquet(graft.queries.AtRest.ensureSignatures(spark, d))
        val lib = graft.operators.Dedup.connectedComponents(
          graft.queries.TextDedup.bandStarEdges(mh2))
        val r = lib.agg(count(lit(1)), sum(col("comp"))).head
        (r.getLong(0), r.getLong(1))
      }
      assert(n == n2 && sum1 == sum2,
        s"replica diverged: ($n,$sum1) vs library ($n2,$sum2)")
      println(s"[ccprobe] rows=$n checksum=$sum1 (library-identical)")
    }
    spark.stop()
  }
}
