package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import scala.collection.mutable

/** GATKReport ("fixed-width" external tool output) reader — SURVEY §2.9 M4:
  * consume the outputs of external tools as tables. Replays
  * `_parse_single_report` (ugvc/pipelines/run_no_gt_report.py:219-256):
  * a report file is a sequence of sections headed by `#:GATKTable:<name>...`
  * lines; for each wanted table name, the line AFTER the header is the
  * whitespace-split column list, and rows follow while their
  * whitespace-token count equals the header count. All values stay strings
  * (the reference keeps the pandas frame untyped; downstream casts).
  *
  * Reports are KB-scale single files produced per tool invocation, so the
  * parse is intentionally driver-side (sequential section structure cannot
  * split) and the result becomes a DataFrame per table via
  * `createDataFrame` — at fleet scale you ingest MANY reports, and that
  * parallelism belongs at the file level ([[readAll]]: one task per file
  * via the distributed text read, each task parsing its own whole report).
  */
object GatkReport {

  /** The table families the reference extracts
    * (run_no_gt_report.py:231-243). */
  val DefaultTables: Seq[String] = Seq(
    "CompOverlap", "CountVariants", "TiTvVariantEvaluator",
    "IndelLengthHistogram", "IndelSummary", "MetricsCollection",
    "ValidationReport", "VariantSummary", "MultiallelicSummary")

  /** Parse one report's lines into (tableName → (headers, rows)). A
    * repeated table name keeps the LAST occurrence, matching the
    * reference's dict overwrite. */
  private[sources] def parseLines(lines: Iterator[String],
                                  tables: Seq[String]): Map[String, (Seq[String], Seq[Seq[String]])] = {
    val out = mutable.LinkedHashMap.empty[String, (Seq[String], Seq[Seq[String]])]
    val it = lines.buffered
    while (it.hasNext) {
      val line = it.next()
      tables.find(t => line.contains(s"#:GATKTable:$t")) match {
        case Some(name) if it.hasNext =>
          val headers = it.next().trim.split("\\s+").toSeq.filter(_.nonEmpty)
          val rows = mutable.ArrayBuffer.empty[Seq[String]]
          var ok = headers.nonEmpty
          while (ok && it.hasNext) {
            val toks = it.head.stripLineEnd.trim.split("\\s+").toSeq.filter(_.nonEmpty)
            if (toks.length == headers.length) { rows += toks; it.next() }
            else ok = false
          }
          out(name) = (headers, rows.toSeq)
        case _ => ()
      }
    }
    out.toMap
  }

  /** Read one report file → one DataFrame per extracted table. */
  def read(spark: SparkSession, path: String,
           tables: Seq[String] = DefaultTables): Map[String, DataFrame] = {
    val p = new Path(path)
    val in = p.getFileSystem(spark.sessionState.newHadoopConf()).open(p)
    val src = scala.io.Source.fromInputStream(in, "ISO-8859-1")
    val parsed =
      try parseLines(src.getLines(), tables)
      finally src.close()
    parsed.map { case (name, (headers, rows)) =>
      val schema = StructType(headers.map(h => StructField(h, StringType)))
      name -> spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(Row.fromSeq), 1), schema)
    }
  }

  /** Fleet-scale ingestion: MANY reports → one long frame per table name,
    * tagged with the source file. Parallelism is per file (wholetext read);
    * each report's internal parse stays sequential, which is exactly the
    * data's shape. Output columns: (file, table, row_index, column, value)
    * — a uniform long format that pivots back per table, so heterogeneous
    * report schemas across tool versions coexist in one frame.
    */
  def readAll(spark: SparkSession, glob: String,
              tables: Seq[String] = DefaultTables): DataFrame = {
    import spark.implicits._
    val files = spark.read.option("wholetext", "true").text(glob)
      .select(org.apache.spark.sql.functions.input_file_name().as("file"),
              org.apache.spark.sql.functions.col("value"))
      .as[(String, String)]
    files.flatMap { case (file, text) =>
      parseLines(text.linesIterator, tables).iterator.flatMap {
        case (table, (headers, rows)) =>
          rows.iterator.zipWithIndex.flatMap { case (row, i) =>
            headers.iterator.zip(row.iterator).map { case (h, v) =>
              (file, table, i.toLong, h, v)
            }
          }
      }
    }.toDF("file", "table", "row_index", "column", "value")
  }
}
