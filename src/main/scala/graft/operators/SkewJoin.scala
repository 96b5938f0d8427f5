package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (hot contigs: at genome scale chr1/chr2 hold
  * ~8% of all rows each, so a plain shuffle on `chrom` melts two reducers).
  *
  * AQE's skew-join handling (enabled in [[graft.Spark.session]]) covers
  * sort-merge joins at runtime; this helper is the explicit form for when
  * the skewed side must hash-join or the skew is known up front:
  * the big side gets a random salt in [0, parts), the small side is
  * exploded `parts`-fold, and the join key becomes (key, salt) — fanning
  * each hot key over `parts` reducers.
  */
object SkewJoin {

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 parts: Int, joinType: String = "inner"): DataFrame = {
    val salted = big.withColumn("_salt",
      (rand(42) * parts).cast("int"))
    val exploded = small.withColumn("_salt",
      explode(sequence(lit(0), lit(parts - 1))))
    salted.join(exploded, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
