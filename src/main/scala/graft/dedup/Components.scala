package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair list — the missing piece between
  * near-dup PAIRS (minhash/simhash/cosine candidates) and dedup DECISIONS:
  * near-duplication is transitive in practice (A≈B, B≈C ⇒ keep one of
  * {A,B,C}), so clusters are the components of the pair graph.
  *
  * Iterative min-label propagation: each vertex adopts the smallest label
  * in its neighborhood until fixpoint. Every iteration is one shuffle on
  * the edge list; lineage is cut by localCheckpoint to keep plans bounded.
  * For pair graphs from dedup candidates the diameter is tiny (clusters are
  * near-cliques), so this converges in 2-4 iterations.
  */
object Components {

  /** edges: (id_a, id_b) long columns. Returns (id, component) where
    * component = min id reachable. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col("id_a").cast("long").as("src"), col("id_b").cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // undirected adjacency
    val adj = edges.unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    var labels = adj.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint()

    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // each vertex's candidate label: min of its own and neighbors' labels
      val neighborLabels = adj
        .join(labels.withColumnRenamed("id", "dst").withColumnRenamed("component", "n_comp"), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("n_comp")).as("min_neighbor"))
      val updated = labels.join(neighborLabels, Seq("id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("min_neighbor"), col("component"))).as("component"))
        .localCheckpoint()
      val changed = updated.alias("u")
        .join(labels.alias("l"), Seq("id"))
        .filter(col("u.component") =!= col("l.component"))
        .limit(1).count()
      labels = updated
      converged = changed == 0
      iter += 1
    }
    edges.unpersist(); adj.unpersist()
    labels
  }

  /** Full dedup decision: given docs + near-dup pairs, pick the minimum id
    * of each component as canonical; docs in no pair map to themselves. */
  def canonicalize(docIds: DataFrame /* id */, pairs: DataFrame): DataFrame = {
    val comps = connectedComponents(pairs)
    docIds.select(col("id").cast("long").as("id"))
      .join(comps, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("canonical_id"))
      .withColumn("is_duplicate", col("id") =!= col("canonical_id"))
  }
}
