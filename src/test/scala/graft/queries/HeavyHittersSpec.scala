package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Two-pass Misra-Gries heavy hitters: the sketch's superset guarantee and
  * the exactness + partitioning-invariance of the final output. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** 2000 docs of unique junk tokens + planted frequent tokens well past
    * the 1/64 threshold, all in one language. */
  private def corpus = {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 2000L).map { i =>
      val junk = Seq.fill(20)(s"junk_${i}_${rnd.nextInt(1 << 30)}")
      // "hot" in every doc (freq 1/21 of the stream), "warm" in every 4th
      val toks = junk :+ "hot"
      val withWarm = if (i % 4 == 0) toks :+ "warm" else toks
      (i, withWarm.mkString(" "), "en")
    }
    rows.toDF("doc_id", "text", "lang")
  }

  test("planted frequent tokens surface with exact counts; junk does not") {
    val out = Curation.heavyHitters(corpus).collect()
      .map(r => (r.getString(1), r.getLong(2))).toMap
    assert(out.contains("hot"), "token in every doc must be found")
    assert(out("hot") == 2000L, "phase-2 count must be exact")
    // ~42500 total tokens -> threshold ~ 665; warm (500) must NOT pass,
    // and no unique junk token can
    assert(!out.contains("warm"))
    assert(out.keys.forall(!_.startsWith("junk_")))
  }

  test("output is invariant under repartitioning (merge-order independence)") {
    val base = Curation.heavyHitters(corpus).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted.toSeq
    val shuffled = Curation.heavyHitters(corpus.repartition(7)).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted.toSeq
    assert(base == shuffled)
  }

  test("heavyHitters equals the exact computation on the real documents") {
    val d = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, d)
    val got = Curation.heavyHitters(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted.toSeq
    val toks = docs.select(col("lang"),
      explode(split(col("text"), " ")).as("token"))
    val tot = toks.groupBy("lang").agg(count(lit(1)).as("total"))
    val exact = toks.groupBy("lang", "token").agg(count(lit(1)).as("cnt"))
      .join(tot, Seq("lang"))
      .filter(col("cnt") >= greatest(lit(4), ceil(col("total") / lit(Curation.HH_DIV))))
      .select("lang", "token", "cnt").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted.toSeq
    assert(got == exact)
    assert(got.nonEmpty, "sf0.001 documents should have at least one heavy hitter")
  }

  test("sketch state stays bounded at k counters and keeps guaranteed items") {
    // "hot" has frequency 1/21; k=64 guarantees survival of anything
    // above 1/65 regardless of partitioning (k=16 would NOT — its 1/17
    // floor legitimately allows evicting hot)
    val mg = udaf(new graft.functions.MisraGries(64))
    val toks = corpus.select(col("lang"),
      explode(split(col("text"), " ")).as("token"))
    val keys = toks.groupBy("lang").agg(mg(col("token")).as("sk"))
      .select(map_keys(col("sk"))).as[Seq[String]].head()
    assert(keys.size <= 64)
    assert(keys.contains("hot"), "token above the 1/(k+1) floor must survive")
  }
}
