package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-analytics tier over the `events` fixture — the batch equivalents of
  * the streaming operators in [[graft.streaming.EventStreams]] (tumbling
  * windows, sessionization). Batch and stream share the same groupBy/window
  * expressions, so the oracle checks here also pin the streaming semantics.
  */
object Events {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  val entries: Seq[QueryDef] = Seq(

    // tumbling 1-hour window aggregation (batch form of readStream+window)
    QueryDef.checked(
      "q24_events_hourly",
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
        |  event_type, count(*) AS n_events, sum(value) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
        .select(col("w.start").as("window_start"), col("event_type"),
          col("n_events"), col("sum_value"))
    },

    // 30-minute-gap sessionization (batch form of session_window /
    // flatMapGroupsWithState): lag + cumulative session counter.
    QueryDef.checked(
      "q25_sessionize",
      """WITH g AS (
        |  SELECT user_id, event_id, value, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |s AS (
        |  SELECT user_id, event_id, value,
        |    CAST(sum(CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
        |                  THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS session_id
        |  FROM g)
        |SELECT user_id, session_id, count(*) AS n_events, sum(value) AS sum_value
        |FROM s GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("value"), col("ts"))
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_sess",
          // exact µs arithmetic — a double-seconds difference has ~2.4e-7s
          // rounding at epoch magnitude, enough to flip a gap of exactly
          // 1800s against the oracle's exact interval compare
          when(col("prev_ts").isNull ||
            (unix_micros(col("ts")) - unix_micros(col("prev_ts"))) > 1800000000L, 1L)
            .otherwise(0L))
        .withColumn("session_id",
          sum(col("new_sess")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
    },

    // SCD-2 dimension history: collapse each user's CONSECUTIVE runs of
    // one event_type into a validity interval [valid_from, valid_to)
    // (open-ended for the current state) — the slowly-changing-dimension
    // build: change detection (lag), run grouping (the cumulative-flag
    // islands trick), and interval chaining (lead), all in two window
    // passes over one key shuffle.
    QueryDef.checked(
      "q102_scd2_intervals",
      """WITH o AS (SELECT user_id, event_type, ts, event_id,
        |   lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        | FROM events),
        |c AS (SELECT *, sum(CASE WHEN prev IS NULL OR prev <> event_type
        |                    THEN 1 ELSE 0 END)
        |        OVER (PARTITION BY user_id ORDER BY ts, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        | FROM o),
        |runs AS (SELECT user_id, event_type, grp, min(ts) AS valid_from,
        |         count(*) AS n_events
        |  FROM c GROUP BY 1, 2, 3)
        |SELECT user_id, event_type, valid_from,
        |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
        |    AS valid_to,
        |  n_events
        |FROM runs""".stripMargin) { (s, dir) =>
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val runs = t(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("prev", lag(col("event_type"), 1).over(byUser))
        .withColumn("grp",
          sum(when(col("prev").isNull || col("prev") =!= col("event_type"), 1L)
            .otherwise(0L))
            .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("event_type"), col("grp"))
        .agg(min(col("ts")).as("valid_from"), count(lit(1)).as("n_events"))
      runs.select(col("user_id"), col("event_type"), col("valid_from"),
        lead(col("valid_from"), 1)
          .over(Window.partitionBy(col("user_id")).orderBy(col("valid_from")))
          .as("valid_to"),
        col("n_events"))
    },

    // SLIDING (hopping) 1-hour windows every 30 minutes, batch form —
    // each event lands in exactly window/slide = 2 windows; the oracle
    // materializes both bucket starts per event, pinning the overlap
    // semantics the streaming sliding-window test relies on.
    QueryDef.checked(
      "q106_events_sliding",
      """SELECT ws AS window_start, event_type, count(*) AS n_events,
        |  sum(value) AS sum_value
        |FROM (SELECT event_type, value,
        |        unnest([time_bucket(INTERVAL 30 MINUTE, ts),
        |                time_bucket(INTERVAL 30 MINUTE, ts)
        |                  - INTERVAL 30 MINUTE]) AS ws
        |      FROM events)
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
        .select(col("w.start").as("window_start"), col("event_type"),
          col("n_events"), col("sum_value"))
    },

    // ORDERED funnel (view → click → purchase): a user reaches stage 2
    // only with a click AT OR AFTER their first view, stage 3 only with a
    // purchase at or after that earliest qualifying click. ONE scan and
    // ONE user_id shuffle: the aggregate keeps min(view ts) plus the
    // user's click/purchase timestamp arrays (conditional collect_list —
    // bounded by that user's own event count, the per-entity array
    // discipline of LineDedup/q116), and the stage chain is pure array
    // arithmetic on the aggregated row. The naive per-stage join form
    // re-scans events once per stage AND duplicates each prior stage's
    // subtree into the next join — 12 scans in the physical plan here.
    // Counts are exact "reached exactly stage k" users.
    QueryDef.checked(
      "q107_funnel",
      """WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS c_ts
        |      FROM events e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts >= v.v_ts GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS p_ts
        |      FROM events e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts GROUP BY 1)
        |SELECT CASE WHEN p.user_id IS NOT NULL THEN 3
        |            WHEN c.user_id IS NOT NULL THEN 2 ELSE 1 END AS funnel_stage,
        |  count(*) AS n_users
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |       LEFT JOIN p ON v.user_id = p.user_id
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val staged = t(s, dir, "events")
        .filter(col("event_type").isin("view", "click", "purchase"))
        .groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "view", col("ts"))).as("v_ts"),
          // collect_list drops the nulls the `when` leaves on other types
          collect_list(when(col("event_type") === "click", col("ts"))).as("clicks"),
          collect_list(when(col("event_type") === "purchase", col("ts"))).as("buys"))
        .filter(col("v_ts").isNotNull)
        // earliest click at/after the first view; `t >= null` is null, so
        // a missing prior stage yields an empty filter and a null min —
        // stage k is structurally impossible without stage k-1
        .withColumn("c_ts", array_min(filter(col("clicks"), _ >= col("v_ts"))))
        .withColumn("p_ts", array_min(filter(col("buys"), _ >= col("c_ts"))))
      staged
        .select(when(col("p_ts").isNotNull, 3)
          .when(col("c_ts").isNotNull, 2).otherwise(1).as("funnel_stage"))
        .groupBy(col("funnel_stage")).agg(count(lit(1)).as("n_users"))
    },

    // cohort retention: cohort = the day of a user's FIRST event; cell
    // (cohort_day, week_offset) counts distinct users active that many
    // whole weeks later. First-touch table joins back on user_id — the
    // same one-key-shuffle discipline as the funnel; the distinct rides
    // the group-by (partial map-side dedup), no second pass.
    QueryDef.checked(
      "q108_cohort_retention",
      """WITH f AS (SELECT user_id, CAST(date_trunc('day', min(ts)) AS TIMESTAMP)
        |             AS cohort_day
        |           FROM events GROUP BY 1)
        |SELECT f.cohort_day,
        |  CAST(floor(date_diff('day', CAST(f.cohort_day AS DATE), CAST(e.ts AS DATE))
        |             / 7) AS BIGINT) AS week_offset,
        |  count(DISTINCT e.user_id) AS n_users
        |FROM events e JOIN f ON e.user_id = f.user_id
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events").select(col("user_id"), col("ts"))
      val first = ev.groupBy(col("user_id"))
        .agg(date_trunc("day", min(col("ts"))).as("cohort_day"))
      ev.join(first, "user_id")
        .groupBy(col("cohort_day"),
          floor(datediff(col("ts").cast("date"), col("cohort_day").cast("date")) / 7)
            .cast("long").as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
    },

    // event-SEQUENCE pattern matching (the MATCH_RECOGNIZE shape): each
    // user's history collapses to an ordered initial string (v/c/p/s/e),
    // and patterns become regexes over it — here adjacent view→click→
    // purchase runs and the "error then eventually recovers with a
    // purchase" shape. One shuffle per user; the in-array sort bounds
    // work by the user's own history length (per-entity, never global),
    // the same discipline as LineDedup's reassembly. Both engines count
    // non-overlapping matches left-to-right, so n_* agree exactly.
    QueryDef.checked(
      "q116_sequence_pattern",
      """WITH s AS (SELECT user_id,
        |    string_agg(substring(event_type, 1, 1), '' ORDER BY ts, event_id)
        |      AS seq
        |  FROM events GROUP BY 1)
        |SELECT user_id, seq,
        |  CAST(len(regexp_extract_all(seq, 'vcp')) AS BIGINT) AS n_vcp,
        |  CAST(len(regexp_extract_all(seq, 'e[^e]*p')) AS BIGINT) AS n_recover
        |FROM s""".stripMargin) { (s, dir) =>
      val seqCol = concat_ws("",
        transform(
          array_sort(collect_list(struct(col("ts"), col("event_id"), col("c")))),
          x => x("c")))
      t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          substring(col("event_type"), 1, 1).as("c"))
        .groupBy(col("user_id")).agg(seqCol.as("seq"))
        .select(col("user_id"), col("seq"),
          regexp_count(col("seq"), lit("vcp")).cast("long").as("n_vcp"),
          regexp_count(col("seq"), lit("e[^e]*p")).cast("long").as("n_recover"))
    },

    // forward-fill (last-observation-carried-forward): every event carries
    // the value of the user's most recent PURCHASE at or before it — the
    // sparse-to-dense propagation behind point-in-time features and
    // gap-filled dimension columns. One window pass; `last(..., ignoreNulls)`
    // over an unbounded-preceding frame is the canonical LOCF form in both
    // engines, so the oracle pins the IGNORE NULLS semantics exactly
    // (events before any purchase stay NULL).
    QueryDef.checked(
      "q118_forward_fill",
      """SELECT event_id, user_id,
        |  last_value(CASE WHEN event_type = 'purchase' THEN value END
        |             IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS last_purchase_value
        |FROM events""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          last(when(col("event_type") === "purchase", col("value")), ignoreNulls = true)
            .over(w).as("last_purchase_value"))
    }
  )
}
