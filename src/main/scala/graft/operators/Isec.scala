package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-way set intersection partition — the `bcftools isec -p` table
  * (reference: ugvc/scripts/create_somatic_gt_file.py:74-170, which runs
  * pairwise isec repeatedly to carve exact/position/private partitions;
  * isec's 0000..NNNN output files are exactly the subset-combination
  * classes of the input sets).
  *
  * Every distinct key is tagged with the BITMASK of the sets that contain
  * it (bit i = sets(i)), so one pass yields all 2^N - 1 partition classes:
  * mask 1 = private to set 0, mask 3 = shared by sets 0 and 1 only, etc.
  *
  * Scale shape: per-set distinct + union + one hash aggregate on the key —
  * map-side combine everywhere, no joins, no driver state; N only widens
  * the unioned input linearly.
  */
object Isec {

  /** Tag each distinct key with its presence bitmask and set count.
    * All frames must expose `keyCols`. */
  def partition(sets: Seq[DataFrame], keyCols: Seq[String]): DataFrame = {
    require(sets.nonEmpty && sets.size <= 62, "1..62 sets")
    val tagged = sets.zipWithIndex.map { case (df, i) =>
      df.select(keyCols.map(col): _*).distinct()
        .withColumn("_m", lit(1L << i))
    }
    tagged.reduce(_ unionByName _)
      .groupBy(keyCols.map(col): _*)
      .agg(sum("_m").as("mask"), count(lit(1)).as("n_sets"))
  }

  /** Collapse the partition to its class sizes: one row per mask. */
  def partitionSizes(sets: Seq[DataFrame], keyCols: Seq[String]): DataFrame =
    partition(sets, keyCols)
      .groupBy("mask", "n_sets")
      .agg(count(lit(1)).as("n_keys"))

  /** Same-source special case: every set is a predicate over ONE frame
    * (the bcftools-isec shape in practice — one callset, N filter
    * definitions). Equal to `partition(preds.map(source.filter), keyCols)`
    * but ONE scan + ONE hash aggregate replace N scans, N distinct
    * shuffles and the union: each row contributes the OR of its matching
    * predicate bits, the per-key mask is the bit-OR aggregate (dup keys
    * within a set collapse by idempotence — the distinct is free), and
    * n_sets is the popcount of the final mask. */
  def partitionFromPredicates(source: DataFrame, preds: Seq[org.apache.spark.sql.Column],
                              keyCols: Seq[String]): DataFrame = {
    require(preds.nonEmpty && preds.size <= 62, "1..62 predicates")
    val rowMask = preds.zipWithIndex
      .map { case (p, i) => when(p, lit(1L << i)).otherwise(lit(0L)) }
      .reduce(_ bitwiseOR _)
    source.select(keyCols.map(col) :+ rowMask.as("_m"): _*)
      .filter(col("_m") =!= 0L)
      .groupBy(keyCols.map(col): _*)
      .agg(bit_or(col("_m")).as("mask"))
      .withColumn("n_sets", bit_count(col("mask")).cast("long"))
  }

  /** Class sizes of [[partitionFromPredicates]]: one row per mask. */
  def partitionSizesFromPredicates(source: DataFrame,
                                   preds: Seq[org.apache.spark.sql.Column],
                                   keyCols: Seq[String]): DataFrame =
    partitionFromPredicates(source, preds, keyCols)
      .groupBy("mask", "n_sets")
      .agg(count(lit(1)).as("n_keys"))
}
