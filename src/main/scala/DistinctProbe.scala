import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** VERDICT r17 #6: probe the distinct-aggregate block (a15/a18 + u2) — is
  * Spark 4's two-phase distinct aggregate actually optimal, or does an
  * explicit pre-aggregation / operator reorder win?
  *
  * Arms (each checksum-asserted identical to the shipped form, coldReset
  * before timing, order alternated per rep):
  *   - a15: groupBy(part).agg(countDistinct(supp)/count) vs explicit
  *     two-step (groupBy(part,supp).count -> groupBy(part)).
  *   - a18: mixed exact+HLL distinct vs pre-dedup (event,user) then plain
  *     count + HLL (HLL is duplicate-idempotent, so results are equal).
  *   - u2: distinct-then-semi-join vs semi-join-then-distinct (the join
  *     side broadcasts after its filter, so join-first dedups survivors
  *     only instead of shuffling the whole fact side first).
  * Usage: runMain DistinctProbe [sfDir] [reps]
  */
object DistinctProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf100")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.Spark.session("distinct-probe")
    spark.range(1000000).selectExpr("id % 97 AS k").groupBy("k").count()
      .write.format("noop").mode("overwrite").save()

    def timed(name: String)(f: => Seq[Any]): Seq[Any] = {
      graft.Bench.coldReset(spark)
      val t0 = System.nanoTime()
      val r = f
      println(f"[distinct] $name%-14s ${(System.nanoTime() - t0) / 1e9}%7.2f s  sums=$r")
      r
    }
    def li = graft.Tables.lineitem(spark, d)
    def ev = graft.Tables.events(spark, d).select(col("event_type"), col("user_id"))
    def partK = graft.Tables.part(spark, d).filter(col("p_size") > 25)
      .select(col("p_partkey").as("k"))

    def a15sums(df: DataFrame): Seq[Any] =
      df.agg(count(lit(1)), sum(col("l_partkey")),
        sum(round(col("supp_rate") * 1e6).cast("long")), sum(col("n"))).collect()(0).toSeq
    def a18sums(df: DataFrame): Seq[Any] =
      df.agg(count(lit(1)), sum(col("exact_users")), sum(col("approx_users"))).collect()(0).toSeq
    def u2sums(df: DataFrame): Seq[Any] =
      df.agg(count(lit(1)), sum(col("k"))).collect()(0).toSeq

    val r6e = (c: org.apache.spark.sql.Column) => floor(c * 1000000.0 + 0.5) / 1000000.0

    for (rep <- 1 to reps) {
      println(s"[distinct] --- rep $rep ---")
      val arms = Seq(
        "a15_cur" -> (() => a15sums(li.groupBy("l_partkey")
          .agg(r6e(countDistinct("l_suppkey").cast("double") / count(lit(1))).as("supp_rate"),
            count(lit(1)).as("n")))),
        "a15_preagg" -> (() => a15sums(
          li.groupBy("l_partkey", "l_suppkey").agg(count(lit(1)).as("c"))
            .groupBy("l_partkey")
            .agg(r6e(count(col("l_suppkey")).cast("double") / sum(col("c"))).as("supp_rate"),
              sum(col("c")).as("n")))),
        "a18_cur" -> (() => a18sums(ev.groupBy("event_type")
          .agg(count_distinct(col("user_id")).as("exact_users"),
            approx_count_distinct(col("user_id"), 0.02).as("approx_users")))),
        "a18_preagg" -> (() => a18sums(
          ev.distinct().groupBy("event_type")
            .agg(count(col("user_id")).as("exact_users"),
              approx_count_distinct(col("user_id"), 0.02).as("approx_users")))),
        "u2_cur" -> (() => u2sums(
          li.select(col("l_partkey").as("k")).distinct()
            .join(partK, Seq("k"), "left_semi"))),
        "u2_joinfirst" -> (() => u2sums(
          li.select(col("l_partkey").as("k"))
            .join(partK, Seq("k"), "left_semi").distinct())))
      val run = if (rep % 2 == 1) arms else arms.reverse
      val rs = run.map { case (n, f) => n -> timed(n)(f()) }.toMap
      for (q <- Seq("a15", "a18", "u2"))
        assert(rs.filter(_._1.startsWith(q)).values.toSet.size == 1,
          s"$q arms diverged: ${rs.filter(_._1.startsWith(q))}")
    }
    spark.stop()
  }
}
