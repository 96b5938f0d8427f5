package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator from SURVEY.md §2 (plus the
  * LLM-data-pipeline extensions) to a DataFrame program over the driver's
  * parquet tables; `oracleSql` carries the DuckDB-equivalent SQL the driver
  * uses as the correctness oracle at sf0.01.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Fact-fact equi-join (orders grows with lineitem — NOT broadcast; AQE
    * picks shuffled-hash/SMJ and handles skew) + partial/final agg: the
    * canonical shape of the engine's fact-table pipelines.
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$d/lineitem.parquet")
    val o = spark.read.parquet(s"$d/orders.parquet")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag", "o_orderstatus")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
           count(lit(1)).as("n"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ IntervalOps.queries ++ TextDedup.queries ++
      Similarity.queries ++ MultimodalQ.queries ++ DomainMath.queries ++
      Curation.queries ++ ReportGrid.queries ++ AtRest.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ IntervalOps.oracles ++ TextDedup.oracles ++
      Similarity.oracles ++ MultimodalQ.oracles ++ DomainMath.oracles ++
      Curation.oracles ++ ReportGrid.oracles ++ AtRest.oracles
}
