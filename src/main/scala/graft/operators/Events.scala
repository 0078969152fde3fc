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

    // Strict ORDERED 3-stage funnel (view → click → purchase, each stage
    // after the previous one): per-stage first-times computed with ONE
    // scan + ONE user-keyed window pass — for each event, the running
    // minimum view-time strictly before it gates clicks, and the running
    // minimum gated-click-time gates purchases. No self-joins: at 100 TB
    // the events table is shuffled once on user_id (the same partitioning
    // sessionization uses) instead of three times. Epoch-µs comparisons
    // are exact in both engines.
    Q("e_funnel_stages",
      """WITH o AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
        |         min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS min_view_before
        |  FROM events),
        |c AS (
        |  SELECT user_id, event_type, us, event_id, min_view_before,
        |         min(CASE WHEN event_type = 'click' AND min_view_before IS NOT NULL
        |                  THEN us END)
        |           OVER (PARTITION BY user_id ORDER BY us, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS min_click_after
        |  FROM o),
        |u AS (
        |  SELECT user_id,
        |         min(CASE WHEN event_type = 'view' THEN us END) AS t_view,
        |         min(CASE WHEN event_type = 'click' AND min_view_before IS NOT NULL
        |                  THEN us END) AS t_click,
        |         min(CASE WHEN event_type = 'purchase' AND min_click_after IS NOT NULL
        |                  THEN us END) AS t_purchase
        |  FROM c GROUP BY user_id)
        |SELECT user_id,
        |       CASE WHEN t_view IS NULL THEN 0
        |            WHEN t_click IS NULL THEN 1
        |            WHEN t_purchase IS NULL THEN 2 ELSE 3 END AS stage_reached
        |FROM u ORDER BY user_id""".stripMargin) {
      (s, dir) => funnelStages(Tables.events(s, dir))
    },

    // Retention cohorts: users grouped by first-active day, distinct-user
    // counts per (cohort, day-offset) — the classic retention triangle.
    // The cohort assignment reuses the user-keyed shuffle (groupBy
    // user_id), then joins back co-partitioned on the same key; the final
    // (cohort, offset) aggregate is a partial-agg rollup over a
    // cardinality-bounded key space (days²).
    Q("e_retention_cohorts",
      """WITH first_day AS (
        |  SELECT user_id, CAST(min(date_trunc('day', ts)) AS TIMESTAMP) AS cohort_day
        |  FROM events GROUP BY user_id)
        |SELECT cohort_day,
        |       date_diff('day', cohort_day, CAST(date_trunc('day', ts) AS TIMESTAMP))
        |         AS day_offset,
        |       count(DISTINCT e.user_id) AS active_users
        |FROM events e JOIN first_day f ON e.user_id = f.user_id
        |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin) {
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val firstDay = ev.groupBy(col("user_id"))
          .agg(min(date_trunc("day", col("ts"))).as("cohort_day"))
        ev.join(firstDay, Seq("user_id"))
          .groupBy(col("cohort_day"),
            datediff(date_trunc("day", col("ts")), col("cohort_day")).as("day_offset"))
          .agg(countDistinct(col("user_id")).as("active_users"))
          .orderBy(col("cohort_day"), col("day_offset"))
      }
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
        |       CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id,
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
        |         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
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
,

    // Calendar gap-fill: a day spine × the event-type dimension, daily
    // counts zero-filled. Fully relational — the spine derives from a
    // 1-row min/max aggregate exploded through sequence(), never a
    // driver-side loop. The cross join is deliberate and bounded: both
    // sides are tiny derived dimensions (days × event types = the output
    // domain), which is the standard gap-fill shape; the fact table is
    // touched once by the daily partial aggregate.
    Q("e_daily_gapfill",
      """WITH b AS (SELECT CAST(date_trunc('day', min(ts)) AS DATE) AS lo,
        |                  CAST(date_trunc('day', max(ts)) AS DATE) AS hi FROM events),
        |spine AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day FROM b),
        |types AS (SELECT DISTINCT event_type FROM events),
        |daily AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
        |                 count(*) AS c FROM events GROUP BY 1, 2)
        |SELECT s.day, t.event_type, coalesce(d.c, 0) AS n
        |FROM spine s CROSS JOIN types t
        |LEFT JOIN daily d ON d.day = s.day AND d.event_type = t.event_type
        |ORDER BY s.day, t.event_type""".stripMargin) {
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val bounds = ev.agg(
          to_date(date_trunc("day", min(col("ts")))).as("lo"),
          to_date(date_trunc("day", max(col("ts")))).as("hi"))
        val spine = bounds
          .select(explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
        val types = ev.select(col("event_type")).distinct()
        val daily = ev
          .groupBy(to_date(date_trunc("day", col("ts"))).as("day"), col("event_type"))
          .agg(count(lit(1)).as("c"))
        spine.crossJoin(broadcast(types))
          .join(daily, Seq("day", "event_type"), "left")
          .select(col("day"), col("event_type"), coalesce(col("c"), lit(0L)).as("n"))
          .orderBy(col("day"), col("event_type"))
      }
    },

    // Per-type z-score anomaly detection — the standard telemetry/metrics
    // outlier scan (and, in corpus terms, the numeric twin of quality
    // filtering: flag rows whose value is far outside its group's
    // distribution). One partial-aggregated group-by builds the per-type
    // moments; the 5-row stats side is broadcast back onto the fact scan,
    // so the fact table is never shuffled — two scans (moments + probe),
    // zero wide exchanges of event rows.
    // Both engines round z to 1e-6 BEFORE the threshold so a summation-
    // order ulp can't flip a borderline row in one engine only.
    Q("e_anomaly_zscore",
      """WITH s AS (SELECT event_type, avg(value) AS m, stddev_samp(value) AS sd
        |           FROM events GROUP BY event_type)
        |SELECT e.event_id, e.event_type, e.value,
        |       round((e.value - s.m) / s.sd, 6) AS z
        |FROM events e JOIN s USING (event_type)
        |WHERE round((e.value - s.m) / s.sd, 6) > 2.5
        |ORDER BY e.event_id""".stripMargin) {
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val stats = ev.groupBy(col("event_type"))
          .agg(avg(col("value")).as("m"), stddev_samp(col("value")).as("sd"))
        ev.join(broadcast(stats), Seq("event_type"))
          .withColumn("z", round((col("value") - col("m")) / col("sd"), 6))
          .filter(col("z") > 2.5)
          .select(col("event_id"), col("event_type"), col("value"), col("z"))
          .orderBy(col("event_id"))
      }
    },

    // Time-based rolling window: per event type, the count and value-sum of
    // everything in the trailing hour — the standard telemetry rate/volume
    // monitor. RANGE frame over epoch-µs longs, so rows with equal
    // timestamps are peers in BOTH engines (a ROWS frame would depend on
    // tie order). Scale: one shuffle on event_type (the same partitioning a
    // streaming sliding-window agg keeps), then a single sorted pass per
    // partition; no self-join, no per-row subquery.
    Q("e_rolling_1h",
      """SELECT event_id, event_type, ts,
        |       CAST(count(*) OVER w AS BIGINT) AS n_1h,
        |       round(sum(value) OVER w, 4) AS sum_1h
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_type, ts, event_id""".stripMargin) {
      (s, dir) => {
        val w = Window.partitionBy(col("event_type"))
          .orderBy(unix_micros(col("ts")))
          .rangeBetween(-3600000000L, Window.currentRow)
        Tables.events(s, dir)
          .select(col("event_id"), col("event_type"), col("ts"),
            count(lit(1)).over(w).as("n_1h"),
            round(sum(col("value")).over(w), 4).as("sum_1h"))
          .orderBy(col("event_type"), col("ts"), col("event_id"))
      }
    },

    // AS-OF join: each purchase picks the most recent prior click of the
    // same user (prior in the total (ts, event_id) order, so ties are
    // deterministic in both engines). Spark-first formulation: NO range
    // join and NO per-row subquery — one running-max window over a
    // sortable (epoch-µs ‖ event_id) zero-padded key finds the as-of
    // match in a single sort pass, then one equi-join on the unique
    // event id fetches the matched row's payload. Cost at scale: the
    // same user-partitioned sort every sessionization query already
    // does, plus a key-equi-join AQE can plan freely.
    Q("e_asof_join",
      """WITH marked AS (
        |  SELECT user_id, event_id, ts, event_type,
        |         max(CASE WHEN event_type = 'click' THEN
        |              lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') ||
        |              lpad(CAST(event_id AS VARCHAR), 20, '0') END)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ck
        |  FROM events)
        |SELECT m.user_id, m.event_id, m.ts,
        |       CAST(substr(m.ck, 21, 20) AS BIGINT) AS click_event_id,
        |       c.value AS click_value
        |FROM marked m
        |LEFT JOIN events c ON c.event_id = CAST(substr(m.ck, 21, 20) AS BIGINT)
        |WHERE m.event_type = 'purchase'
        |ORDER BY m.user_id, m.ts, m.event_id""".stripMargin) {
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // width 20 covers any non-negative long (19 digits max) — lpad
        // TRUNCATES overlong strings, so an undersized pad would corrupt
        // keys silently in both engines. Negative values are a second
        // silent corruption ('-' breaks lexicographic order identically in
        // both engines, so the oracle could not catch it): fail loudly.
        // The assert lives INSIDE the key expression — coalesce(NULL-on-
        // pass, '') keeps the concat a no-op — because a free-standing
        // guard column would be pruned away by Catalyst before evaluating.
        // NULL-safe: a NULL ts/event_id yields a NULL key (which max()
        // skips, same as the oracle) — the assert must not fire on NULL,
        // only on genuinely negative values, so coalesce the 3VL condition
        // to true first
        val nonNegative = coalesce(
          assert_true(
            coalesce(unix_micros(col("ts")) >= 0 && col("event_id") >= 0, lit(true)),
            lit("e_asof_join: ts and event_id must be non-negative for the padded sortable key"))
            .cast("string"),
          lit(""))
        val clickKey = when(col("event_type") === "click",
          concat(lpad(unix_micros(col("ts")).cast("string"), 20, "0"),
            nonNegative,
            lpad(col("event_id").cast("string"), 20, "0")))
        ev.withColumn("ck", max(clickKey).over(w))
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts"),
            substring(col("ck"), 21, 20).cast("long").as("click_event_id"))
          .join(ev.select(col("event_id").as("c_id"), col("value").as("click_value")),
            col("click_event_id") === col("c_id"), "left")
          .select(col("user_id"), col("event_id"), col("ts"),
            col("click_event_id"), col("click_value"))
          .orderBy(col("user_id"), col("ts"), col("event_id"))
      }
    },

    // RANGE join: clicks per purchase within the preceding 30 minutes.
    // Spark-first formulation: bucketize time into 30-minute buckets and
    // equi-join on (user, bucket) with each click exploded into its own
    // and the following bucket — any pair within the range collides on
    // exactly one bucket key — then filter the precise interval and
    // aggregate. This is the standard sub-quadratic range-join layout:
    // the plan is a hash equi-join (AQE-splittable), never a
    // nested-loop over all (purchase, click) pairs.
    Q("e_range_join",
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, p.ts, count(c.ts) AS clicks_30m
        |FROM p LEFT JOIN c ON c.user_id = p.user_id
        |  AND epoch_us(p.ts) - epoch_us(c.ts) >= 0
        |  AND epoch_us(p.ts) - epoch_us(c.ts) < 1800000000
        |GROUP BY p.event_id, p.user_id, p.ts
        |ORDER BY p.user_id, p.ts, p.event_id""".stripMargin) {
      (s, dir) => {
        val W = 1800000000L // 30 min in µs = the bucket width
        val ev = Tables.events(s, dir)
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"),
            unix_micros(col("ts")).as("p_us"),
            expr(s"unix_micros(ts) div $W").as("b"))
        val c = ev.filter(col("event_type") === "click")
          .select(col("user_id").as("c_user"), unix_micros(col("ts")).as("c_us"))
          .withColumn("b", explode(array(
            expr(s"c_us div $W"), expr(s"c_us div $W + 1"))))
        val matched = p.join(c,
            p("user_id") === c("c_user") && p("b") === c("b"))
          .filter(col("p_us") - col("c_us") >= 0 && col("p_us") - col("c_us") < W)
          .groupBy(col("event_id")).agg(count(lit(1)).as("n"))
        p.join(matched, Seq("event_id"), "left")
          .select(col("event_id"), col("user_id"), col("ts"),
            coalesce(col("n"), lit(0L)).as("clicks_30m"))
          .orderBy(col("user_id"), col("ts"), col("event_id"))
      }
    },

    // Temporal train/eval split — the LEAKAGE-SAFE split for time-ordered
    // data: everything after the 80% mark of the observed time range is
    // eval, so no future signal ever reaches training (a hash split like
    // t_hash_split would leak future events of the same user into train).
    // The [min,max] bounds are a 1-row broadcast dimension; floor() is
    // explicit because Spark truncates double→long where DuckDB rounds.
    Q("e_temporal_split",
      """WITH e AS (SELECT epoch_us(ts) AS us, user_id, event_type FROM events),
        |b AS (SELECT min(us) AS mn, max(us) AS mx FROM e),
        |s AS (SELECT CASE WHEN us < mn + CAST(floor((mx - mn) * 0.8) AS BIGINT)
        |                  THEN 'train' ELSE 'eval' END AS split,
        |             user_id, event_type
        |      FROM e, b)
        |SELECT split, count(*) AS n, count(DISTINCT user_id) AS n_users,
        |       count(DISTINCT event_type) AS n_types
        |FROM s GROUP BY split ORDER BY split""".stripMargin) {
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(unix_micros(col("ts")).as("us"), col("user_id"), col("event_type"))
        val b = e.agg(min(col("us")).as("mn"), max(col("us")).as("mx"))
        e.crossJoin(broadcast(b))
          .select(
            when(col("us") < col("mn") +
                floor((col("mx") - col("mn")) * 0.8).cast("long"), "train")
              .otherwise("eval").as("split"),
            col("user_id"), col("event_type"))
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("n_users"),
            countDistinct(col("event_type")).as("n_types"))
          .orderBy(col("split"))
      }
    }
  )

  /** The e_funnel_stages plan over any (user_id, event_type, ts, event_id)
    * relation — public so the spec can drive synthetic orderings through
    * the exact production plan (the fixture's users all happen to reach
    * stage 3, which would make a fixture-only check vacuous).
    */
  def funnelStages(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val before = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val o = events
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("ts"))
      .withColumn("min_view_before",
        min(when(col("event_type") === "view", col("us"))).over(before))
    val beforeUs = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val c = o.withColumn("min_click_after",
      min(when(col("event_type") === "click" && col("min_view_before").isNotNull,
        col("us"))).over(beforeUs))
    c.groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", col("us"))).as("t_view"),
        min(when(col("event_type") === "click" && col("min_view_before").isNotNull,
          col("us"))).as("t_click"),
        min(when(col("event_type") === "purchase" && col("min_click_after").isNotNull,
          col("us"))).as("t_purchase"))
      .select(col("user_id"),
        when(col("t_view").isNull, 0)
          .when(col("t_click").isNull, 1)
          .when(col("t_purchase").isNull, 2)
          .otherwise(3).as("stage_reached"))
      .orderBy(col("user_id"))
  }
}
