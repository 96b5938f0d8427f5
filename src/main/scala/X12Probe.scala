import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** x12 (TF-IDF top-k) stage profile at the 100x replica: where do the
  * ~17 s go — the (doc,term) tf groupBy + 28M-row cache build, the df
  * aggregate, the term join, or the per-doc window? And does the unhinted
  * tf⋈df join actually broadcast under AQE? Usage: runMain X12Probe /tmp/sf100 [reps]
  */
object X12Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf100")
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = graft.Spark.session("x12-probe")

    def docs = graft.Tables.documents(spark, d)
    def timed(name: String)(f: => Unit): Double = {
      graft.Bench.coldReset(spark)
      val t0 = System.nanoTime()
      f
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[x12probe] $name%-26s $t%7.2f s")
      t
    }
    def sink(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    docs.agg(count(lit(1))).collect() // warm-up

    def tfFrame = docs
      .select(col("doc_id"), explode(graft.functions.Text.tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

    def tfNative = docs
      .withColumn("_tc", graft.functions.Text.termCounts(
        graft.functions.Text.tokens(col("text"))))
      .select(col("doc_id"), explode_outer(col("_tc")).as("e"))
      .filter(col("e").isNotNull)
      .select(col("doc_id"), col("e.term").as("term"), col("e.tf").as("tf"))

    def fullFrom(tfP: org.apache.spark.sql.DataFrame) = {
      val dfc = tfP.groupBy("term").agg(count(lit(1)).as("df"))
      tfP.join(dfc, Seq("term"))
        .crossJoin(broadcast(docs.agg(count(lit(1)).as("n_docs"))))
        .withColumn("tfidf", // r6 is private[queries]; inline its form
          floor(col("tf") * log(col("n_docs").cast("double") / col("df")) * 1e6 + 0.5) / 1e6)
        .withColumn("rk", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("term"))))
        .filter(col("rk") <= 5)
        .select("doc_id", "term", "tf", "df", "tfidf")
    }

    for (rep <- 1 to reps) {
      println(s"[x12probe] --- rep $rep ---")
      timed("old:tf groupBy persist") {
        val tf = tfFrame.persist(); tf.count(); tf.unpersist()
      }
      timed("new:tf termCounts persist") {
        val tf = tfNative.persist(); tf.count(); tf.unpersist()
      }
      timed("old:full query") {
        val tf = tfFrame.persist(); tf.count()
        sink(fullFrom(tf)); tf.unpersist()
      }
      timed("new:full query") {
        val tf = tfNative.persist(); tf.count()
        sink(fullFrom(tf)); tf.unpersist()
      }
      timed("new:no-persist") { sink(fullFrom(tfNative)) }
      timed("new:no-persist bcast-df") {
        val tf = tfNative
        val dfc = tf.groupBy("term").agg(count(lit(1)).as("df"))
        sink(tf.join(broadcast(dfc), Seq("term"))
          .crossJoin(broadcast(docs.agg(count(lit(1)).as("n_docs"))))
          .withColumn("tfidf",
            floor(col("tf") * log(col("n_docs").cast("double") / col("df")) * 1e6 + 0.5) / 1e6)
          .withColumn("rk", row_number().over(
            Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("term"))))
          .filter(col("rk") <= 5)
          .select("doc_id", "term", "tf", "df", "tfidf"))
      }
    }
    // does the unhinted tf-df join broadcast? inspect the adaptive final plan
    val tf = tfFrame.persist(); tf.count()
    val dfc = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val j = tf.join(dfc, Seq("term"))
    j.write.format("noop").mode("overwrite").save()
    val plan = j.queryExecution.executedPlan.toString
    println("[x12probe] tf-df join plan: " +
      (if (plan.contains("BroadcastHashJoin")) "BroadcastHashJoin"
       else if (plan.contains("SortMergeJoin")) "SortMergeJoin"
       else "other"))
    val nTerms = dfc.count()
    println(s"[x12probe] distinct terms = $nTerms")
    spark.stop()
  }
}
