package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** VERDICT r17 #4: measure d6's persist-vs-recompute trade at scale and
  * pick a scale-safe storage level. The shipped d6 persists the
  * (label, cid)-assigned frame — full vectors included — MEMORY_AND_DISK
  * across the self-join; at 100 TB that cached frame is corpus-sized, so
  * the question is whether the O(C)-per-row assignment argmax recompute
  * (the pre-r17 shape: both join sides re-run scan+norm+argmax) actually
  * costs more than materializing the vectors, and whether DISK_ONLY (no
  * unified-pool pressure) changes the answer.
  *
  * Arms (each its own fresh build, coldReset before timing, pair checksums
  * asserted identical): MEMORY_AND_DISK (shipped) / DISK_ONLY / recompute
  * (no persist). Usage: runMain graft.queries.D6PersistProbe [sfDir] [reps]
  */
object D6PersistProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf100")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.Spark.session("d6-persist-probe")
    graft.Tables.documents(spark, d).agg(count(lit(1))).collect() // warm-up

    def assignedFrame(): org.apache.spark.sql.DataFrame = {
      val nCells = Similarity.cellCountForDedup(
        graft.Tables.embeddings(spark, d).count())
      val all = Similarity.vecs(spark, d).join(
        graft.Tables.embeddings(spark, d).select(col("vec_id"), col("label")),
        Seq("vec_id"))
      val cents = all.filter(col("vec_id") < nCells)
        .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
      Similarity.assignToCellsAuto(all, cents, nCells)
        .select("vec_id", "label", "v", "nrm", "cid")
    }
    def pairs(assigned: org.apache.spark.sql.DataFrame) = {
      val b = assigned.select(col("label"), col("cid"), col("vec_id").as("vec_b"),
        col("v").as("vb"), col("nrm").as("nrmb"))
      assigned.join(b, Seq("label", "cid"))
        .filter(col("vec_id") < col("vec_b"))
        .select(col("vec_id").as("vec_a"), col("vec_b"),
          roundSim(Similarity.dot(col("v"), col("vb")) / (col("nrm") * col("nrmb"))).as("sim"))
        .filter(col("sim") >= 0.4)
    }
    def sums(df: org.apache.spark.sql.DataFrame): Seq[Any] =
      df.agg(count(lit(1)), sum(col("vec_a")), sum(col("vec_b")),
        sum(round(col("sim") * 1e6).cast("long"))).collect()(0).toSeq

    def timed(name: String)(f: => Seq[Any]): Seq[Any] = {
      graft.Bench.coldReset(spark)
      val t0 = System.nanoTime()
      val r = f
      println(f"[d6persist] $name%-16s ${(System.nanoTime() - t0) / 1e9}%7.2f s  sums=$r")
      r
    }

    def persistArm(level: StorageLevel): Seq[Any] = {
      val a = assignedFrame().persist(level)
      a.count()
      val r = sums(pairs(a))
      a.unpersist(true)
      r
    }
    for (rep <- 1 to reps) {
      println(s"[d6persist] --- rep $rep ---")
      val arms = Seq(
        "mem_disk" -> (() => persistArm(StorageLevel.MEMORY_AND_DISK)),
        "disk_only" -> (() => persistArm(StorageLevel.DISK_ONLY)),
        "recompute" -> (() => sums(pairs(assignedFrame()))))
      val run = if (rep % 2 == 1) arms else arms.reverse
      val rs = run.map { case (n, f) => n -> timed(n)(f()) }.toMap
      assert(rs.values.toSet.size == 1, s"arms diverged: $rs")
    }
    spark.stop()
  }
}
