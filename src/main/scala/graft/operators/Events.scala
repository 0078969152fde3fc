package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics in batch form. Each query here is the exact batch
  * twin of a Structured Streaming pipeline in `graft.streaming` — same
  * transformations, so the streaming path is verified against the same
  * oracle semantics.
  *
  * `events.ts` is parquet timestamp[ns]; both engines truncate to µs (see
  * Tables.events). Session cutoffs compare epoch-microsecond longs so the
  * two engines agree bit-for-bit.
  *
  * Scale: time-bucketed aggregation partial-aggregates before the shuffle;
  * sessionization shuffles once on user_id (the same partitioning a
  * streaming flatMapGroupsWithState would keep as state-store partitioning).
  */
object Events {
  val defs: Seq[Q] = Seq(

    // Tumbling-window aggregation (batch twin of a 1-day window groupBy).
    Q("e_daily_by_type",
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
        |       count(*) AS n, round(sum(value), 4) AS sum_value,
        |       count(DISTINCT user_id) AS uniq_users
        |FROM events GROUP BY 1, 2
        |ORDER BY day, event_type""".stripMargin, bench = true) {
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("value")), 4).as("sum_value"),
            countDistinct(col("user_id")).as("uniq_users"))
          .orderBy(col("day"), col("event_type"))
    },

    // JSON extraction from the props payload.
    Q("e_json_extract",
      """SELECT json_extract_string(props, '$.k') AS k, count(*) AS n
        |FROM events GROUP BY 1 ORDER BY k NULLS FIRST""".stripMargin) {
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(get_json_object(col("props"), "$.k").as("k"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("k").asc_nulls_first)
    },

    // Funnel: per-user signup→purchase conversion (conditional min/max
    // aggregates; the sequence check is on epoch-µs, exact in both engines).
    Q("e_funnel_signup_purchase",
      """WITH t AS (
        |  SELECT user_id,
        |         min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS first_signup,
        |         max(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS last_purchase
        |  FROM events GROUP BY user_id)
        |SELECT user_id,
        |       CASE WHEN first_signup IS NOT NULL AND last_purchase IS NOT NULL
        |                 AND first_signup < last_purchase THEN 1 ELSE 0 END AS converted
        |FROM t ORDER BY user_id""".stripMargin) {
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(col("user_id"))
          .agg(
            min(when(col("event_type") === "signup", unix_micros(col("ts")))).as("first_signup"),
            max(when(col("event_type") === "purchase", unix_micros(col("ts")))).as("last_purchase"))
          .select(col("user_id"),
            when(col("first_signup").isNotNull && col("last_purchase").isNotNull
              && col("first_signup") < col("last_purchase"), 1).otherwise(0).as("converted"))
          .orderBy(col("user_id"))
    },

    // Sessionization: 30-minute inactivity gap → session id per user via
    // lag + cumulative sum (batch twin of session windows /
    // flatMapGroupsWithState). Epoch-µs arithmetic matches both engines.
    // Every window and the final sort order by (ts, event_id) — a TOTAL
    // order (event_id is unique), so session assignment under duplicate
    // (user_id, ts) pairs is deterministic and engine-independent.
    Q("e_sessionize",
      """WITH marked AS (
        |  SELECT user_id, ts, event_id, value,
        |         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
        |                OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |              <= 1800000000 THEN 0 ELSE 1 END AS new_session
        |  FROM events)
        |SELECT user_id,
        |       sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id,
        |       ts, event_id, value
        |FROM marked
        |ORDER BY user_id, ts, event_id""".stripMargin, bench = true) {
      (s, dir) => {
        val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val cum = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, dir)
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
          .withColumn("new_session",
            when(unix_micros(col("ts")) - col("prev_us") <= 1800000000L, 0).otherwise(1))
          .select(col("user_id"),
            sum(col("new_session")).over(cum).as("session_id"),
            col("ts"), col("event_id"), col("value"))
          .orderBy(col("user_id"), col("ts"), col("event_id"))
      }
    },

    // Session summary: sessions per user with bounds and size (deterministic,
    // compact output for the oracle).
    Q("e_session_stats",
      """WITH marked AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
        |                OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |              <= 1800000000 THEN 0 ELSE 1 END AS new_session
        |  FROM events),
        |sessions AS (
        |  SELECT user_id, ts,
        |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM marked)
        |SELECT user_id, session_id, count(*) AS n_events,
        |       min(ts) AS session_start, max(ts) AS session_end
        |FROM sessions GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin) {
      (s, dir) => {
        val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val cum = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, dir)
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
          .withColumn("new_session",
            when(unix_micros(col("ts")) - col("prev_us") <= 1800000000L, 0).otherwise(1))
          .withColumn("session_id", sum(col("new_session")).over(cum))
          .groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n_events"),
            min(col("ts")).as("session_start"),
            max(col("ts")).as("session_end"))
          .orderBy(col("user_id"), col("session_id"))
    }
    }
  )
}
