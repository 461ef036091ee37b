package graft

import org.apache.spark.sql.SparkSession

/** One place for session config so Verify, Bench, and tests agree.
  * Sized for local[N] here; on a real cluster only master/memory change —
  * the SQL conf (AQE, shuffle partitions ≈ cores, nanos handling) carries.
  */
object Sessions {
  def base(builder: SparkSession.Builder, cpus: String): SparkSession.Builder =
    builder
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // reliable checkpoints (Bfs.collapse when a checkpoint dir is set)
      // are otherwise never deleted: with this on, the ContextCleaner
      // removes a checkpoint's files once its RDD is garbage-collected,
      // so long-lived drivers don't accrete checkpoint dirs (intermediate
      // collapses are additionally deleted eagerly — see Bfs.closure)
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.sql.warehouse.dir",
        sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-warehouse")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")

  def local(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")): SparkSession = {
    val s = base(SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.VectorExpressions.register(s)
    s
  }
}
