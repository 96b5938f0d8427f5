import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A/B probe for the r15 band-key packing (VERDICT r14 #3): the band
  * grouping key used to be (bid, concat_ws("_", mh_a, mh_b)) — a 25-45
  * byte variable-width STRING riding the d-family's biggest exchange —
  * and is now the two source longs (bid, k1, k2) verbatim: 16 fixed
  * bytes, long compares instead of string compares under MapGroups, and
  * collision-free by construction (no derived hash to check).
  *
  * Arms, interleaved per rep with order flipped between reps (NOTES #10:
  * the second run of a back-to-back pair reads ~1.8x slow):
  *   old:x21-string   — probe-local replica of the r14 string-keyed
  *                      estSim automaton over the at-rest signature table
  *                      (x21's shape), including the per-row group-change
  *                      string compare the old BandPairIterator paid
  *   new:x21          — the registered x21 (packed keys)
  *   new:d3           — the registered d3 (packed keys, shared d3+d4 pass)
  *
  * After timing, both x21 arms' outputs are checksummed (count, sum doc_a,
  * sum doc_b, sum round(est_sim*1e6)) and MUST match — and the new output
  * is written to /tmp/bandpack_new.parquet for the independent DuckDB
  * replay of the d3 oracle SQL (the string-keyed band/cap pipeline) to
  * arbitrate, as in the r14 miscount investigation.
  *
  * Usage: runMain BandKeyProbe [sfDir] [reps]
  */
object BandKeyProbe {

  // ---- probe-local replica of the r14 STRING-keyed form (kept verbatim
  // so the A arm prices exactly what r14 shipped; the library keeps only
  // the packed form) ----
  case class OldBandedDoc(bid: Int, key: String, docId: Long, sh: Array[Long])

  private val estSim: (Array[Long], Array[Long]) => Double = (a, b) => {
    var i = 0; var c = 0
    while (i < a.length) { if (a(i) == b(i)) c += 1; i += 1 }
    c.toDouble / a.length
  }

  private final class OldBandPairIterator[P, R](
      iter: Iterator[(Int, String, Long, P)], cap: Int, score: (P, P) => R)
      extends Iterator[(Long, Long, R)] {
    private val pending = scala.collection.mutable.Queue.empty[(Long, Long, R)]
    private var curBid = Int.MinValue
    private var curKey: String = null
    private val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, P)]
    private var hot = false
    private var center: (Long, P) = null
    private def flushGroup(): Unit = {
      if (!hot && buf.length >= 2) {
        var i = 0
        while (i < buf.length) {
          var j = i + 1
          while (j < buf.length) {
            pending.enqueue((buf(i)._1, buf(j)._1, score(buf(i)._2, buf(j)._2)))
            j += 1
          }
          i += 1
        }
      }
      buf.clear(); hot = false; center = null
    }
    private def accept(d: (Int, String, Long, P)): Unit = {
      if (d._1 != curBid || d._2 != curKey) {
        flushGroup(); curBid = d._1; curKey = d._2
      }
      if (hot) pending.enqueue((center._1, d._3, score(center._2, d._4)))
      else {
        buf.append((d._3, d._4))
        if (buf.length > cap) {
          hot = true; center = buf.head
          var i = 1
          while (i < buf.length) {
            pending.enqueue((center._1, buf(i)._1, score(center._2, buf(i)._2)))
            i += 1
          }
          buf.clear()
        }
      }
    }
    override def hasNext: Boolean = {
      while (pending.isEmpty && iter.hasNext) accept(iter.next())
      if (pending.isEmpty) flushGroup()
      pending.nonEmpty
    }
    override def next(): (Long, Long, R) = pending.dequeue()
  }

  private def oldEstSimPairs(s: SparkSession, mh: DataFrame): DataFrame = {
    import s.implicits._
    val K = 8; val BANDS = 4
    val cap = graft.queries.TextDedup.HOT_BAND_CAP
    val sig = array((1 to K).map(i => col(s"mh$i")): _*)
    val bandStructs = array((1 to BANDS).map { b =>
      struct(lit(b).as("bid"),
        concat_ws("_", col(s"mh${2 * b - 1}"), col(s"mh${2 * b}")).as("key"))
    }: _*)
    val rows = mh.filter(col("mh1").isNotNull)
      .select(col("doc_id"), sig.as("sig"), explode(bandStructs).as("band"))
      .select(col("band.bid").as("bid"), col("band.key").as("key"),
        col("doc_id").as("docId"), col("sig").as("sh"))
    rows.as[OldBandedDoc]
      .groupBy(col("bid"), col("key")).as[(Int, String), OldBandedDoc]
      .flatMapSortedGroups(col("docId")) { case ((bid, key), it) =>
        new OldBandPairIterator(it.map(d => (bid, key, d.docId, d.sh)), cap,
          estSim)
      }
      .toDF("doc_a", "doc_b", "est_sim")
      .dropDuplicates("doc_a", "doc_b")
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf100")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.Spark.session("bandkey-probe")

    def timed(name: String)(f: => Unit): Double = {
      graft.Bench.coldReset(spark)
      val t0 = System.nanoTime()
      f
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[bandkey] $name%-22s $t%7.2f s")
      t
    }
    def sink(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    graft.Tables.documents(spark, d).agg(count(lit(1))).collect() // warm-up
    val sigPath = graft.queries.AtRest.ensureSignatures(spark, d) // pre-seed

    val arms: Seq[(String, () => Unit)] = Seq(
      "old:x21-string" -> (() =>
        sink(oldEstSimPairs(spark, spark.read.parquet(sigPath)))),
      "new:x21" -> (() =>
        sink(graft.SparkEntry.queries("x21_atrest_pairs")(spark, d))),
      "new:d3" -> (() =>
        sink(graft.SparkEntry.queries("d3_lsh_pairs")(spark, d)))
    )
    for (rep <- 1 to reps) {
      println(s"[bandkey] --- rep $rep ---")
      val order = if (rep % 2 == 1) arms else arms.reverse
      order.foreach { case (n, f) => timed(n)(f()) }
    }

    // pair-set identity: checksums over both x21 arms, then the new
    // output at rest for the DuckDB oracle replay
    def checksum(df: DataFrame): Seq[Any] =
      df.agg(count(lit(1)), sum(col("doc_a")), sum(col("doc_b")),
        sum(floor(col("est_sim") * 1000000 + 0.5).cast("long")))
        .collect()(0).toSeq
    graft.Bench.coldReset(spark)
    val oldSum = checksum(oldEstSimPairs(spark, spark.read.parquet(sigPath)))
    val newDf = graft.SparkEntry.queries("x21_atrest_pairs")(spark, d)
    newDf.write.mode("overwrite").parquet("/tmp/bandpack_new.parquet")
    val newSum = checksum(spark.read.parquet("/tmp/bandpack_new.parquet"))
    println(s"[bandkey] checksum old=$oldSum")
    println(s"[bandkey] checksum new=$newSum")
    assert(oldSum == newSum,
      "PAIR SET MISMATCH between string-keyed and packed band automatons")
    println("[bandkey] pair sets identical (old == new)")
    spark.stop()
  }
}
