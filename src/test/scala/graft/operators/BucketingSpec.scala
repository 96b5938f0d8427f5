package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed-by-key join plans without any Exchange (co-located)") {
    val a = (1 to 5000).map(i => (i.toLong % 700, s"a$i")).toDF("k", "va")
    val b = (1 to 3000).map(i => (i.toLong % 700, i * 1.5)).toDF("k", "vb")
    Bucketing.writeBucketed(a, "bkt_a", "k", 8)
    Bucketing.writeBucketed(b, "bkt_b", "k", 8)
    // force the shuffle-join path (broadcast would win at this toy size and
    // hide the bucketing effect — at fact-fact scale broadcast is not an option)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.colocatedJoin(spark, "bkt_a", "bkt_b", "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      // correctness unchanged vs plain join
      val expected = a.join(b, Seq("k")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }
}
