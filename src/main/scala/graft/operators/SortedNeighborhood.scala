package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sorted-neighborhood blocking (Hernández & Stolfo, SIGMOD 1995) — the
  * classic entity-resolution candidate generator: sort records by a
  * blocking key, slide a window of size `w`, and compare only records
  * that fall within the same window, turning O(n²) comparison into
  * O(n·w).
  *
  * The Spark shape: the sort is a WINDOW PARTITIONED BY A BLOCK PREFIX
  * (the first `prefixLen` characters of the key), not a global order — a
  * global `Window.orderBy` would funnel every row through one partition.
  * Windows never cross a prefix boundary, which is the standard
  * multi-pass-blocking compromise (records differing in their first
  * characters are out of reach of a small window anyway; a second pass
  * with a different key catches them). Each partition sorts locally after
  * one hash shuffle on the prefix; `lead()` materializes the w−1 forward
  * neighbors; one `levenshtein` per candidate pair verifies.
  */
object SortedNeighborhood {

  /** Candidate pairs (id_a < id_b by sort order) within `window` positions
    * of each other under `keyCol` order inside each `prefixLen`-character
    * block, verified to Levenshtein distance ≤ `maxDist`.
    * Output: (id_a, id_b, key_a, key_b, dist).
    */
  def candidates(df: DataFrame, idCol: String, keyCol: String,
                 prefixLen: Int, window: Int, maxDist: Int): DataFrame = {
    val recs = df.select(col(idCol).as("id"), col(keyCol).as("key"))
      .withColumn("blk", substring(col("key"), 1, prefixLen))
    // deterministic total order inside a block: key, then id breaks ties
    val w = Window.partitionBy(col("blk")).orderBy(col("key"), col("id"))
    val withNbrs = recs.withColumn("nbrs", array(
      (1 until window).map(i =>
        struct(lead(col("id"), i).over(w).as("id_b"),
               lead(col("key"), i).over(w).as("key_b"))): _*))
    withNbrs
      .select(col("id").as("id_a"), col("key").as("key_a"), explode(col("nbrs")).as("n"))
      .filter(col("n.id_b").isNotNull)
      .withColumn("dist", levenshtein(col("key_a"), col("n.key_b")))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("n.id_b").as("id_b"),
        col("key_a"), col("n.key_b").as("key_b"), col("dist").cast("long").as("dist"))
  }
}
