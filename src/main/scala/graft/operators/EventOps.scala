package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-stream operators over the batch events table (the streaming
  * variants live in graft.streaming — same transforms under readStream).
  */
object EventOps {

  /** Gap-based sessionization: a new session starts when the gap from the
    * previous event of the same key exceeds `gapMinutes`. Classic
    * lag + cumulative-sum-of-flags; one shuffle on the key.
    */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
                 gapMinutes: Int): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(tsCol)
    events
      .withColumn("_prev_ts", lag(col(tsCol), 1).over(w))
      .withColumn("_new_session",
        when(col("_prev_ts").isNull ||
          unix_timestamp(col(tsCol)) - unix_timestamp(col("_prev_ts"))
            > gapMinutes * 60L, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum("_new_session").over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("_prev_ts", "_new_session")
  }

  /** Tumbling-window aggregation (hour granularity via date_trunc so the
    * oracle SQL is expressible identically in DuckDB).
    */
  def tumblingHourly(events: DataFrame, tsCol: String,
                     typeCol: String): DataFrame =
    events.groupBy(date_trunc("hour", col(tsCol)).as("hour"), col(typeCol))
      .agg(count("*").as("n_events"),
        round(sum("value"), 4).as("sum_value"))

  /** As-of join: for each left event, attach the latest right event of
    * the same key with right.ts <= left.ts. Implemented as the scalable
    * union + windowed last-non-null carry: ONE shuffle on (key), no
    * range-join explosion, skew-safe via AQE. This is the composition
    * route (SURVEY.md §2.8) — no custom physical operator needed.
    *
    * @param left      probe side, must have keyCol + tsCol
    * @param right     value side, must have keyCol + tsCol + valueCol
    * @param valueCol  right column carried to the left rows (renamed
    *                  `asof_<valueCol>`)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, valueCol: String): DataFrame = {
    val l = left.withColumn("_side", lit(1))
      .withColumn("_v", lit(null).cast(right.schema(valueCol).dataType))
    val r = right.select(col(keyCol), col(tsCol), col(valueCol).as("_v"))
      .withColumn("_side", lit(0))
    val unioned = l.select(l.columns.map(col).toSeq: _*)
      .unionByName(
        r.select((left.columns.map(c =>
          if (c == keyCol || c == tsCol) col(c)
          else lit(null).cast(left.schema(c).dataType).as(c)).toSeq
          :+ col("_side") :+ col("_v")): _*))
    // right rows sort before left rows at equal ts => "<=" semantics;
    // _v tie-breaks equal-ts right rows deterministically (max wins)
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol), col("_side"), col("_v"))
    unioned
      .withColumn(s"asof_$valueCol",
        last("_v", ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("_side") === 1)
      .drop("_side", "_v")
  }
}
