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

  /** `shuffle = true` pins a shuffled hash join (the scenario salting
    * exists for: the small side is past broadcast size, so the join must
    * shuffle — and without the salt every row of a hot key lands on one
    * reducer). Left false, Spark may still broadcast a tiny small side,
    * which is the better plan when it fits. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 parts: Int, joinType: String = "inner",
                 shuffle: Boolean = false): DataFrame = {
    val salted = big.withColumn("_salt",
      (rand(42) * parts).cast("int"))
    val exploded0 = small.withColumn("_salt",
      explode(sequence(lit(0), lit(parts - 1))))
    val exploded = if (shuffle) exploded0.hint("shuffle_hash") else exploded0
    salted.join(exploded, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
