package org.apache.spark.ml.tree

/** Bridge for the one piece of tree state the public `ml.tree` API hides:
  * a leaf's training class counts (`LeafNode.impurityStats` is
  * `private[ml]`). `RandomForestClassificationModel.predictRaw` votes with
  * each leaf's NORMALIZED class distribution — compiling that vote into a
  * Catalyst expression (graft.pipelines.FilterModel.scoreCompiled) needs
  * the counts, not just the majority-class `prediction`. Structure-only
  * access (splits, children, GBT leaf values) goes through the public API.
  */
object GraftTreeShim {
  def classCounts(leaf: LeafNode): Array[Double] = leaf.impurityStats.stats.clone()
}
