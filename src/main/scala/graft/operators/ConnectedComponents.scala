package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative connected components over the verified duplicate-pair graph —
  * the clustering stage (north-star requirement; no analog in the reference,
  * which serves per-query top-k).
  *
  * Algorithm: alternating **min-label propagation + pointer jumping**
  * (the DataFrame form of hash-to-min / Kiveris et al. star contraction):
  * each iteration every vertex takes the min label over itself and its
  * neighbors, then follows its label's label (path compression). Pointer
  * jumping gives O(log n) convergence on pathological chains, not O(n).
  *
  * Catalyst cannot express iteration (SURVEY §4), so the loop is
  * driver-side with `localCheckpoint` per iteration to cut lineage — the
  * plan stays constant-size no matter how many rounds run.
  *
  * Labels are the conv_id strings themselves (cluster id = lexicographic
  * min conv_id of the component): deterministic across reruns and
  * parallelism levels, and immune to the id-collision risk a hash-to-long
  * mapping would add at 10^12 scale.
  */
object ConnectedComponents {

  /** @param edges (id_a, id_b) undirected edges, any orientation
    * @param maxIter safety bound (log₂ of the largest component diameter;
    *                32 covers anything representable)
    * @return (conv_id, cluster_id) for every vertex that appears in an edge
    */
  def components(edges: DataFrame, maxIter: Int = 32): DataFrame = {
    // Materialize the edge list once: every iteration joins against it, and
    // without this the full upstream pipeline (signatures → candidates →
    // verify) would be recomputed per iteration.
    val sym = edges
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint(eager = true)

    var labels = sym
      .select(col("src").as("id"))
      .distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(eager = true)

    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // neighbor-min: smallest label among my neighbors
      val nbrMin = sym
        .join(labels.withColumnRenamed("id", "src").withColumnRenamed("label", "src_label"), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(min(col("src_label")).as("nbr_label"))

      val propagated = labels
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("label").as("old_label"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))

      // pointer jumping: label := min(label, label(label)). The whole round
      // stays in codegen'd Column expressions (no typed map — deserializing
      // every row out of Tungsten per round was measurable fixed cost);
      // convergence is a narrow scan of the just-materialized checkpoint.
      val jumpTargets = propagated.select(col("id").as("label"), col("label").as("label2"))
      val jumped = propagated
        .join(jumpTargets, Seq("label"), "left")
        .select(col("id"), col("old_label"), least(col("label"), coalesce(col("label2"), col("label"))).as("label"))
        .localCheckpoint(eager = true)

      converged = jumped.filter(col("old_label") =!= col("label")).isEmpty
      labels = jumped.select(col("id"), col("label"))
      iter += 1
    }
    labels.select(col("id").as("conv_id"), col("label").as("cluster_id"))
  }

  /** Full cluster assignment: every document gets a cluster — vertices in
    * the pair graph get their component min-id, untouched documents are
    * singleton clusters of themselves. Also emits the canonical flag via
    * deterministic min-id rule (≙ row_number canonicalization, SURVEY §2.6).
    *
    * @param allIds DataFrame with a `conv_id` column covering the corpus
    */
  def assign(allIds: DataFrame, edges: DataFrame, maxIter: Int = 32): DataFrame = {
    val comp = components(edges, maxIter)
    allIds
      .select(col("conv_id"))
      .join(comp.withColumnRenamed("cluster_id", "component_id"), Seq("conv_id"), "left")
      .select(
        col("conv_id"),
        coalesce(col("component_id"), col("conv_id")).as("cluster_id")
      )
      .withColumn("is_canonical", (col("conv_id") === col("cluster_id")).cast("boolean"))
  }
}
