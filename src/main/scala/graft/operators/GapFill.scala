package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization — the feature-store "as-of materialization"
  * primitive: resample an irregular event stream onto a fixed time grid
  * (one row per key per bucket over the key's own active span) and
  * forward-fill each gap with the last observation (LOCF).
  *
  * Scale shape: the observation collapse is one map-combined groupBy
  * (key, bucket) with a deterministic struct-max (latest ts wins, ties
  * by event id — no window); the spine is generated per key with
  * `sequence()` — pure codegen, rows proportional to the OUTPUT grid,
  * not to input events; the forward fill is `last(ignoreNulls) OVER
  * (PARTITION BY key ORDER BY bucket)` — partitioned by key, never
  * global, and each key's partition is bounded by its span/step. No
  * cross-key shuffle beyond the one hash exchange on the key.
  */
object GapFill {

  /** Hourly LOCF fill. Input needs `keyCol`, `tsCol` (timestamp), and
    * `valueCol` (nulls ignored as non-observations), `tieCol` (unique id breaking same-ts ties). Output:
    * (key, hour, value, observed) — one row per key per hour of the
    * key's observed span, `value` forward-filled. */
  def hourlyFfill(df: DataFrame, keyCol: String, tsCol: String,
                  valueCol: String, tieCol: String): DataFrame = {
    val obs = df.filter(col(valueCol).isNotNull)
      .select(col(keyCol).as("key"),
        date_trunc("hour", col(tsCol)).as("hour"),
        col(tsCol).as("ts"), col(tieCol).as("tie"), col(valueCol).as("v"))
      .groupBy(col("key"), col("hour"))
      // latest observation in the bucket wins; event_id breaks ts ties
      .agg(max(struct(col("ts"), col("tie"), col("v"))).as("last_obs"))
      .select(col("key"), col("hour"), col("last_obs.v").as("obs_value"))

    val spine = obs.groupBy(col("key"))
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
      .select(col("key"),
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("hour"))

    val w = Window.partitionBy(col("key")).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, 0)
    spine.join(obs, Seq("key", "hour"), "left_outer")
      .select(col("key"), col("hour"),
        last(col("obs_value"), ignoreNulls = true).over(w).as("value"),
        col("obs_value").isNotNull.as("observed"))
  }
}
