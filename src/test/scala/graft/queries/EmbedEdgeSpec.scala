package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Totality of the embedding family over adversarial vectors — above all
  * the ZERO vector, whose cosine is undefined: Spark 4 ANSI throws
  * DIVIDE_BY_ZERO even for double division while DuckDB yields NULL, so
  * the engine's contract is exclusion at ingest (vecs() filters nrm > 0;
  * the oracles carry the same predicate). */
class EmbedEdgeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_embedge")
    val rnd = new scala.util.Random(7)
    val rows = (0L until 40L).map { i =>
      (i, Array.tabulate(8)(j => rnd.nextFloat() - 0.5f), (i % 3).toInt)
    } :+ ((40L, Array.fill(8)(0.0f), 1)) // the zero vector
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(d.resolve("embeddings.parquet").toString)
    d.toString
  }

  test("e1/e2/d6 are total with a zero vector present; the zero vector is excluded") {
    for (q <- Seq("e1_knn_cosine", "e2_ivf_ann", "d6_cosine_dedup")) {
      val out = Similarity.queries(q)(spark, dir).collect() // must not throw
      val ids = out.flatMap { r =>
        (0 until r.length).collect {
          case i if r.schema(i).name.matches("vec_id|qid|vec_b") && !r.isNullAt(i) =>
            r.getLong(i)
        }
      }.toSet
      assert(!ids.contains(40L), s"$q surfaced the zero vector")
      assert(out.nonEmpty, q)
    }
  }
}
