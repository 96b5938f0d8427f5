package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Final stage of near-duplicate deduplication: candidate pairs (from LSH /
  * cosine blocking) form an undirected graph; connected components give the
  * duplicate clusters, and the minimum doc id in each cluster becomes the
  * canonical representative every member collapses to.
  *
  * Distributed min-label propagation: each iteration joins labels across
  * edges and keeps the elementwise min — O(diameter) rounds of hash joins,
  * no driver-side union-find, so it scales to billions of edges. Duplicate
  * clusters from text dedup are tiny and dense (diameter 2-3), so this
  * converges in a handful of rounds.
  */
object Dedup {

  /** (id, component) for every id appearing in `pairs`; component = min id
    * reachable. Runs until fixpoint or `maxIter`. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 10): DataFrame = {
    // symmetrize with ONE pass over `pairs`: a two-branch union evaluates
    // the whole upstream pipeline (LSH band join + distinct at 100x) twice;
    // exploding both directions from each row reads it once.
    // Persisted PRE-PARTITIONED on the per-round join key: InMemoryRelation
    // keeps the hash partitioning, so the edge set is shuffled once here,
    // not once per iteration (only the small labels side moves each round)
    val edges = pairs.select(explode(array(
        struct(col("doc_a").as("src"), col("doc_b").as("dst")),
        struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .repartition(col("dst"))
      .persist()
    // localCheckpoint per round truncates lineage — without it the nested
    // plan grows with every iteration and planning itself blows up
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val neighborMin = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(col("src")).agg(min("comp").as("ncomp"))
      // carry the previous label through the checkpoint so convergence is
      // a scan of the materialized rows — not an extra join + shuffle
      val updated = labels.join(neighborMin, labels("id") === neighborMin("src"), "left")
        .select(col("id"), col("comp").as("_old"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"))
        .localCheckpoint()
      val changed = updated.filter(col("comp") =!= col("_old")).count()
      labels = updated.select("id", "comp")
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    labels
  }

  /** Every document mapped to its canonical id: cluster minimum for members
    * of a duplicate cluster, itself otherwise. `docs` needs a `doc_id`. */
  def canonicalAssignment(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val comps = connectedComponents(pairs)
    docs.join(comps, docs("doc_id") === comps("id"), "left")
      .select(docs("doc_id"),
        coalesce(col("comp"), docs("doc_id")).as("canonical_id"))
      .withColumn("is_duplicate", col("canonical_id") =!= col("doc_id"))
  }
}
