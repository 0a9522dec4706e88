package graft.queries

import graft.Q
import graft.util.Exact
import graft.util.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event sessionization (round-3 north-star): the batch form of the
  * classic clickstream operator — a session is a maximal run of one
  * user's events with inter-event gaps ≤ 12 h.
  *
  * Shape: lag → boundary flag → running sum (session index) → per-session
  * aggregate. Everything keys on user_id: one shuffle feeds the two window
  * passes (same partition+order ⇒ one Exchange + one Sort) AND the final
  * groupBy (partial aggregation map-side). At 100 TB this is the standard
  * sessionize plan — per-user data colocated once, no driver state; the
  * streaming twin (session_window + watermark) lives in
  * streaming/Streams.scala.
  */
object SessionQueries {

  /** 12 h in microseconds — calibrated so the testdata's sparse event
    * stream (≈ 2 events/user/day) forms real multi-event sessions. */
  private val GapUs = 12L * 3600 * 1000000L

  val sessionize = Q("q_sessionize", "gap-based event sessionization")(
    "WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM events), " +
      s"g AS (SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL OR ts_us - lag(ts_us) OVER w > $GapUs " +
      "THEN 1 ELSE 0 END AS is_new FROM e " +
      "WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)), " +
      "s AS (SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id " +
      "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM g) " +
      "SELECT user_id, session_id, count(*) AS n_events, " +
      "min(ts_us) AS start_us, max(ts_us) AS end_us, " +
      "max(ts_us) - min(ts_us) AS duration_us, " +
      Exact.Sql.sum("value") + " AS total_value " +
      "FROM s GROUP BY 1, 2") {
    (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val lagTs = lag(col("ts_us"), 1).over(w)
      events(s, d)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("ts_us"), col("value"))
        .withColumn("is_new",
          when(lagTs.isNull || col("ts_us") - lagTs > GapUs, 1).otherwise(0))
        .withColumn("session_id",
          sum(col("is_new"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("long"))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min("ts_us").as("start_us"), max("ts_us").as("end_us"),
          (max("ts_us") - min("ts_us")).as("duration_us"),
          Exact.exactSum(col("value")).as("total_value"))
  }

  val all: Seq[Q] = Seq(sessionize)
}
