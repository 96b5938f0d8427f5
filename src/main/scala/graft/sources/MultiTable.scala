package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Keyed multi-table store (SURVEY.md §2.1 S8/S9): the reference keeps
  * result dictionaries in one HDF5 file under named keys
  * (`stats`, `percentiles`, `histogram`, per-chromosome frames —
  * ugvc/pipelines/coverage_analysis.py:532-534, evaluate_concordance.py:100-105)
  * or a dill pickle (sv_stats_collect.py:240-262).
  *
  * Spark-native form: a directory of parquet tables, key ↔ subdirectory.
  * `skip_keys` becomes choosing subdirs; `columns_subset` becomes column
  * pruning at read — both free.
  */
object MultiTable {

  def write(tables: Map[String, DataFrame], path: String): Unit =
    tables.foreach { case (key, df) =>
      df.write.mode("overwrite").parquet(s"$path/$key")
    }

  def keys(spark: SparkSession, path: String): Seq[String] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName).toSeq.sorted
  }

  /** Read one key; `columnsSubset` prunes at scan. */
  def read(spark: SparkSession, path: String, key: String,
           columnsSubset: Seq[String] = Seq.empty): DataFrame = {
    val df = spark.read.parquet(s"$path/$key")
    if (columnsSubset.isEmpty) df
    else df.select(columnsSubset.map(org.apache.spark.sql.functions.col): _*)
  }

  /** Read all keys except `skipKeys` (read_hdf's skip_keys semantics). */
  def readAll(spark: SparkSession, path: String,
              skipKeys: Set[String] = Set.empty): Map[String, DataFrame] =
    keys(spark, path).filterNot(skipKeys).map(k => k -> read(spark, path, k)).toMap
}
