package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Block hygiene for iterative loops that cut lineage with
  * `localCheckpoint` (PageRank/KCore/LabelPropagation/ShortestPaths/
  * Walks/Components): `Dataset.unpersist()` is a NO-OP for a
  * checkpointed frame — it is not in the cache manager — so every
  * superseded generation's O(E)/O(V) MEMORY_AND_DISK blocks used to
  * stay resident until driver GC + ContextCleaner got around to them,
  * and peak storage grew with the iteration budget (the round-15
  * ADVICE finding). [[release]] frees the generation's blocks eagerly
  * by unpersisting the underlying checkpointed RDD itself.
  */
object Lineage {

  /** Eagerly free a SUPERSEDED generation. Safe ONLY after every
    * consumer of `df` has fully materialized: a local checkpoint is not
    * recomputable — a later read of the freed blocks fails the job (the
    * same no-fault-tolerance contract the checkpoint itself has on
    * executor loss). Falls back to plain `unpersist()` for frames that
    * are cached rather than checkpointed (e.g. an iterative loop's
    * persisted seed generation). */
  def release(df: DataFrame): Unit = df.queryExecution.analyzed match {
    case l: LogicalRDD => l.rdd.unpersist(blocking = false)
    case _ => df.unpersist()
  }
}
