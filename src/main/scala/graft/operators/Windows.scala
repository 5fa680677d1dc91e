package graft.operators

import graft.Rnd.rnd
import graft.{QDef, Tables => T}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.5 Window functions + §2.6 sorts / limits.
  *
  * Determinism rules (SURVEY §2.5/§5.3): every window ORDER BY is
  * total-ordered with `event_id` as tiebreaker; frames that sum doubles sum
  * integer cents instead (DuckDB computes sliding frames with a segment tree,
  * so FP addition order differs — integer sums are order-exempt).
  */
object Windows {

  /** value → integer cents: exact, order-independent frame sums. */
  private def cents = rnd(col("value") * 100.0, 0).cast("long")

  val defs: Seq[QDef] = Seq(

    QDef(
      "win_rank",
      (s, dir) => {
        val byTime = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val byType = Window.partitionBy("user_id").orderBy(col("event_type"))
        T.events(s, dir)
          .select(col("event_id"), col("user_id"),
            row_number().over(byTime).cast("long").as("rn"),
            rank().over(byType).cast("long").as("rnk"),
            dense_rank().over(byType).cast("long").as("drnk"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
             |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             |  rank() OVER (PARTITION BY user_id ORDER BY event_type) AS rnk,
             |  dense_rank() OVER (PARTITION BY user_id ORDER BY event_type) AS drnk
             |FROM events ORDER BY event_id""".stripMargin)),

    // Epoch-to-epoch delta [PK: Δmag between consecutive observations].
    QDef(
      "win_lag_lead",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        T.events(s, dir)
          .select(col("event_id"), col("user_id"),
            rnd(col("value") - lag(col("value"), 1).over(w), 4).as("delta"),
            lead(col("event_id"), 1).over(w).as("next_event"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
             |  floor((value - lag(value, 1) OVER w) * 1e4 + 0.5) / 1e4 AS delta,
             |  lead(event_id, 1) OVER w AS next_event
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |ORDER BY event_id""".stripMargin)),

    // ROWS frame: moving sum/avg over the last 4 observations (in cents).
    QDef(
      "win_frame_rows",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(-3, 0)
        T.events(s, dir)
          .withColumn("cents", cents)
          .select(col("event_id"), col("user_id"),
            sum(col("cents")).over(w).as("mov_sum_cents"),
            count(lit(1)).over(w).as("mov_n"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
             |  CAST(sum(cents) OVER w AS BIGINT) AS mov_sum_cents,
             |  count(*) OVER w AS mov_n
             |FROM (SELECT *, CAST(floor((value * 100.0) * 1e0 + 0.5) / 1e0 AS BIGINT) AS cents FROM events)
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             |  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
             |ORDER BY event_id""".stripMargin)),

    // RANGE frame on epoch seconds [PK: time-windowed running stats] —
    // running 1-hour sum per user.
    QDef(
      "win_frame_range",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("sec"))
          .rangeBetween(-3600, 0)
        T.events(s, dir)
          .withColumn("sec", unix_timestamp(col("ts")))
          .withColumn("cents", cents)
          .select(col("event_id"), col("user_id"), col("sec"),
            sum(col("cents")).over(w).as("hour_sum_cents"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, sec, CAST(sum(cents) OVER w AS BIGINT) AS hour_sum_cents
             |FROM (SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             |        CAST(floor((value * 100.0) * 1e0 + 0.5) / 1e0 AS BIGINT) AS cents FROM events)
             |WINDOW w AS (PARTITION BY user_id ORDER BY sec
             |  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
             |ORDER BY event_id""".stripMargin)),

    // Top-K per group: top-3 orders per customer by price.
    QDef(
      "win_topk_group",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        T.orders(s, dir)
          .select(col("o_custkey"), col("o_orderkey"),
            rnd(col("o_totalprice"), 2).as("price"),
            row_number().over(w).cast("long").as("rn"))
          .where(col("rn") <= 3)
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey, price, rn FROM (
             |  SELECT o_custkey, o_orderkey, floor((o_totalprice) * 1e2 + 0.5) / 1e2 AS price,
             |    row_number() OVER (PARTITION BY o_custkey
             |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
             |  FROM orders)
             |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin)),

    // Distribution functions over a total order.
    QDef(
      "win_ntile_cume",
      (s, dir) => {
        val w = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
        T.events(s, dir)
          .select(col("event_id"), col("event_type"),
            ntile(4).over(w).cast("long").as("quartile"),
            rnd(cume_dist().over(w), 6).as("cd"),
            rnd(percent_rank().over(w), 6).as("pr"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, event_type,
             |  ntile(4) OVER w AS quartile,
             |  floor((cume_dist() OVER w) * 1e6 + 0.5) / 1e6 AS cd,
             |  floor((percent_rank() OVER w) * 1e6 + 0.5) / 1e6 AS pr
             |FROM events
             |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
             |ORDER BY event_id""".stripMargin)),

    // Frame-wide value picking: first/last/nth over the full partition frame
    // (total order → deterministic; 1-row groups yield NULL nth).
    QDef(
      "win_first_last",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        T.events(s, dir)
          .select(col("event_id"), col("user_id"),
            rnd(first(col("value")).over(w), 4).as("first_v"),
            rnd(last(col("value")).over(w), 4).as("last_v"),
            rnd(nth_value(col("value"), 2).over(w), 4).as("second_v"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
             |  floor((first_value(value) OVER w) * 1e4 + 0.5) / 1e4 AS first_v,
             |  floor((last_value(value) OVER w) * 1e4 + 0.5) / 1e4 AS last_v,
             |  floor((nth_value(value, 2) OVER w) * 1e4 + 0.5) / 1e4 AS second_v
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |ORDER BY event_id""".stripMargin)),

    // §2.6 — multi-key sort with explicit null ordering (Spark and DuckDB
    // disagree on ASC default null placement; pinned on both sides).
    QDef(
      "sort_multi",
      (s, dir) =>
        T.events(s, dir)
          .withColumn("et", nullif(col("event_type"), lit("click")))
          .select("event_id", "et", "value")
          .orderBy(col("et").asc_nulls_first, col("value").desc, col("event_id").asc),
      Some("""SELECT event_id, nullif(event_type, 'click') AS et, value
             |FROM events
             |ORDER BY et ASC NULLS FIRST, value DESC, event_id ASC""".stripMargin)),

    // Global top-k: ORDER BY + LIMIT → TakeOrderedAndProject (no full sort
    // materialization; each partition keeps k rows, driver merges).
    QDef(
      "topk_limit",
      (s, dir) =>
        T.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_linenumber"),
            rnd(col("l_extendedprice"), 2).as("price"))
          .orderBy(col("price").desc, col("l_orderkey").asc, col("l_linenumber").asc)
          .limit(100),
      Some("""SELECT l_orderkey, l_linenumber, floor((l_extendedprice) * 1e2 + 0.5) / 1e2 AS price
             |FROM lineitem
             |ORDER BY price DESC, l_orderkey ASC, l_linenumber ASC
             |LIMIT 100""".stripMargin)),

    // Batch sessionization: gap > 30 min starts a new session; session id is
    // the running count of gap flags (classic lag + cumulative-sum idiom —
    // the batch mirror of stream_session's sessionWindow). Both window
    // passes share the user_id partitioning: one shuffle, one sort. Time
    // arithmetic is exact integer epoch seconds.
    QDef(
      "win_sessionize",
      (s, dir) => {
        val wl = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("t"), col("event_id"))
        T.events(s, dir)
          .select(col("user_id"), col("event_id"),
            unix_timestamp(col("ts")).as("t"))
          .withColumn("new_sess",
            when(col("t") - lag(col("t"), 1).over(wl) > 1800L, 1L)
              .when(lag(col("t"), 1).over(wl).isNull, 1L).otherwise(0L))
          .withColumn("session_id",
            sum(col("new_sess")).over(
              wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .select("user_id", "event_id", "t", "session_id")
          .orderBy("user_id", "event_id")
      },
      Some("""WITH obs AS (
             |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS t
             |  FROM events),
             |flagged AS (
             |  SELECT user_id, event_id, t,
             |    CASE WHEN lag(t) OVER w IS NULL THEN 1
             |         WHEN t - lag(t) OVER w > 1800 THEN 1 ELSE 0 END AS new_sess
             |  FROM obs
             |  WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id))
             |SELECT user_id, event_id, t,
             |  CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY t, event_id
             |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
             |FROM flagged ORDER BY user_id, event_id""".stripMargin)),

    // Running distinct count — how many event types each user has seen so
    // far: first-occurrence flag (row_number=1 over (user, type)) + running
    // sum over (user). Two window partitionings → the (user, type) pass
    // shuffles once, the (user) pass reuses a prefix-compatible... no — it
    // re-shuffles on the coarser key; that second exchange moves only
    // (user_id, event_id, flag) rows, never the payload. The streaming
    // equivalent is approx_count_distinct state per key.
    QDef(
      "win_running_distinct",
      (s, dir) => {
        val wft = Window.partitionBy("user_id", "event_type")
          .orderBy(col("ts"), col("event_id"))
        val wu = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        T.events(s, dir)
          .withColumn("first_seen",
            when(row_number().over(wft) === 1, 1L).otherwise(0L))
          .withColumn("n_types_seen", sum(col("first_seen")).over(wu))
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("n_types_seen"))
          .orderBy("user_id", "event_id")
      },
      Some("""WITH flagged AS (
             |  SELECT user_id, event_id, event_type, ts,
             |    CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
             |      ORDER BY ts, event_id) = 1 THEN 1 ELSE 0 END AS first_seen
             |  FROM events)
             |SELECT user_id, event_id, event_type,
             |  CAST(sum(first_seen) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_types_seen
             |FROM flagged ORDER BY user_id, event_id""".stripMargin)),

    // Ordered funnel: per user, the furthest stage reached in strict
    // view → click → purchase time order (a click only counts AFTER the
    // first view, a purchase only after that click). Three per-user min
    // aggregates chained by equi-joins on user_id — every stage shuffles on
    // the same key, so AQE coalesces them onto one exchange lineage and the
    // per-stage frames shrink monotonically (clickers ⊆ viewers). All
    // comparisons are integer epoch-micros, never engine-local timestamp
    // ordering. The window-function alternative (min over conditional
    // frames) needs one pass per stage anyway; the join form keeps each
    // stage broadcastable when the funnel narrows.
    QDef(
      "win_funnel",
      (s, dir) => {
        val base = T.events(s, dir)
          .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("t"))
        val v = base.where(col("event_type") === "view")
          .groupBy("user_id").agg(min("t").as("t_view"))
        val c = base.where(col("event_type") === "click")
          .join(v, "user_id").where(col("t") > col("t_view"))
          .groupBy("user_id").agg(min("t").as("t_click"))
        val p = base.where(col("event_type") === "purchase")
          .join(c, "user_id").where(col("t") > col("t_click"))
          .groupBy("user_id").agg(min("t").as("t_purchase"))
        base.select("user_id").distinct()
          .join(v, Seq("user_id"), "left")
          .join(c, Seq("user_id"), "left")
          .join(p, Seq("user_id"), "left")
          .select(col("user_id"),
            when(col("t_purchase").isNotNull, 3L)
              .when(col("t_click").isNotNull, 2L)
              .when(col("t_view").isNotNull, 1L)
              .otherwise(0L).as("stage"),
            col("t_view"), col("t_click"), col("t_purchase"))
          .orderBy("user_id")
      },
      Some("""WITH base AS (
             |  SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
             |v AS (SELECT user_id, min(t) AS t_view FROM base
             |      WHERE event_type = 'view' GROUP BY user_id),
             |c AS (SELECT b.user_id, min(t) AS t_click FROM base b
             |      JOIN v USING (user_id)
             |      WHERE event_type = 'click' AND t > t_view GROUP BY b.user_id),
             |p AS (SELECT b.user_id, min(t) AS t_purchase FROM base b
             |      JOIN c USING (user_id)
             |      WHERE event_type = 'purchase' AND t > t_click GROUP BY b.user_id)
             |SELECT u.user_id,
             |  CAST(CASE WHEN t_purchase IS NOT NULL THEN 3
             |       WHEN t_click IS NOT NULL THEN 2
             |       WHEN t_view IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS stage,
             |  t_view, t_click, t_purchase
             |FROM (SELECT DISTINCT user_id FROM base) u
             |LEFT JOIN v USING (user_id)
             |LEFT JOIN c USING (user_id)
             |LEFT JOIN p USING (user_id)
             |ORDER BY user_id""".stripMargin)),

    // Type-2 slowly-changing-dimension history build — the lakehouse
    // dimension-maintenance op next to table_merge's fact upsert: collapse a
    // change log to attribute-change points, then derive each version's
    // validity interval [valid_from, valid_to) with lead(), open interval =
    // current version. Both window passes (change detection, interval
    // derivation) share ONE user_id shuffle — the win_sessionize
    // single-exchange idiom; at 100 TB this is one co-partitioned pass over
    // the log, no join, no skew beyond the per-key history length. Time is
    // exact integer epoch seconds; event_id breaks ts ties.
    QDef(
      "table_scd2",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("t"), col("event_id"))
        T.events(s, dir)
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_timestamp(col("ts")).as("t"))
          .withColumn("prev", lag(col("event_type"), 1).over(w))
          .where(col("prev").isNull || col("prev") =!= col("event_type"))
          .withColumn("valid_to", lead(col("t"), 1).over(w))
          .withColumn("is_current", col("valid_to").isNull)
          .select(col("user_id"), col("event_type"), col("t").as("valid_from"),
            col("valid_to"), col("is_current"))
          .orderBy("user_id", "valid_from")
      },
      Some("""WITH obs AS (
             |  SELECT user_id, event_id, event_type,
             |    CAST(floor(epoch(ts)) AS BIGINT) AS t
             |  FROM events),
             |ch AS (
             |  SELECT user_id, event_id, event_type, t,
             |    lag(event_type) OVER w AS prev
             |  FROM obs WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
             |cp AS (SELECT * FROM ch WHERE prev IS NULL OR prev <> event_type)
             |SELECT user_id, event_type, t AS valid_from,
             |  lead(t) OVER w AS valid_to,
             |  (lead(t) OVER w IS NULL) AS is_current
             |FROM cp WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
             |ORDER BY user_id, valid_from""".stripMargin)),

    // SEASONAL PROFILE — the hour-of-day decomposition step a monitoring
    // or cadence-analysis pass runs before anomaly detection: per event
    // type, each hour's mean value relative to the type's overall mean
    // (idx > 1 = the hot hours). The ratio of two FP means is the only
    // FP, computed from integer-exact (sum, count) pairs carried
    // side-by-side and rounded once on the 1e-6 grid — the agg_stats
    // parity discipline. Scale shape: the (type, hour) pre-aggregate
    // collapses the corpus map-side into ≤ types×24 rows; the per-type
    // totals re-aggregate from THAT table (never a second corpus pass)
    // and attach back by broadcast.
    QDef(
      "ts_seasonal",
      (s, dir) => {
        val obs = T.events(s, dir)
          .where(col("value").isNotNull && !isnan(col("value")))
          .select(col("event_type"), hour(col("ts")).cast("long").as("hr"),
            col("value"))
        val byHour = obs.groupBy("event_type", "hr")
          .agg(count(lit(1)).as("n"), sum("value").as("sv"))
          .localCheckpoint() // totals fold from this table, not the corpus
        val tot = byHour.groupBy("event_type")
          .agg(sum("n").cast("long").as("n_all"), sum("sv").as("sv_all"))
        byHour.join(broadcast(tot), "event_type")
          .select(col("event_type"), col("hr"), col("n"),
            rnd((col("sv") / col("n").cast("double")) /
              (col("sv_all") / col("n_all").cast("double")), 6).as("idx"))
          .orderBy("event_type", "hr")
      },
      Some("""WITH obs AS (
             |  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr, value
             |  FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
             |byhour AS (
             |  SELECT event_type, hr, CAST(count(*) AS BIGINT) AS n,
             |    sum(value) AS sv
             |  FROM obs GROUP BY 1, 2),
             |tot AS (
             |  SELECT event_type, CAST(sum(n) AS BIGINT) AS n_all,
             |    sum(sv) AS sv_all
             |  FROM byhour GROUP BY 1)
             |SELECT b.event_type, hr, n,
             |  floor(((sv / CAST(n AS DOUBLE)) /
             |    (sv_all / CAST(n_all AS DOUBLE))) * 1e6 + 0.5) / 1e6 AS idx
             |FROM byhour b JOIN tot USING (event_type)
             |ORDER BY event_type, hr""".stripMargin)),

    // Time-series gap fill + forward fill (last observation carried
    // forward): densify each key's daily series over its own [min_day,
    // max_day] span, then LOCF via last(ignoreNulls) over the day order —
    // the standard regularization pass before resampling/joining
    // irregular series (lightcurve cadences included). Per-day value is
    // max() — exact, merge-order-free; the fill copies doubles without
    // arithmetic, so the output is bit-deterministic. Scale shape: every
    // stage keys on user_id (daily agg, span agg, grid join, fill window);
    // the grid explode is bounded by each key's own day span, never a
    // global calendar cross join.
    QDef(
      "ts_fillgaps",
      (s, dir) => {
        val obs = T.events(s, dir)
          .select(col("user_id"),
            expr("unix_timestamp(ts) div 86400").as("day"), col("value"))
        val daily = obs.groupBy("user_id", "day").agg(max("value").as("obs_v"))
        val grid = daily.groupBy("user_id")
          .agg(min("day").as("d0"), max("day").as("d1"))
          .select(col("user_id"),
            explode(sequence(col("d0"), col("d1"))).as("day"))
        val w = Window.partitionBy("user_id").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.join(daily, Seq("user_id", "day"), "left")
          .withColumn("filled", last(col("obs_v"), ignoreNulls = true).over(w))
          .select("user_id", "day", "obs_v", "filled")
          .orderBy("user_id", "day")
      },
      Some("""WITH obs AS (
             |  SELECT user_id,
             |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day, value
             |  FROM events),
             |d AS (SELECT user_id, day, max(value) AS obs_v
             |      FROM obs GROUP BY user_id, day),
             |b AS (SELECT user_id, min(day) AS d0, max(day) AS d1
             |      FROM d GROUP BY user_id),
             |grid AS (SELECT user_id, unnest(generate_series(d0, d1)) AS day FROM b),
             |j AS (SELECT g.user_id, g.day, d.obs_v
             |      FROM grid g LEFT JOIN d ON d.user_id = g.user_id AND d.day = g.day)
             |SELECT user_id, day, obs_v,
             |  last_value(obs_v IGNORE NULLS) OVER (PARTITION BY user_id
             |    ORDER BY day ROWS UNBOUNDED PRECEDING) AS filled
             |FROM j ORDER BY user_id, day""".stripMargin)),

    // Time-series gap fill by LINEAR INTERPOLATION — the resampling sibling
    // of ts_fillgaps' LOCF: each missing day gets
    // v_prev + (v_next − v_prev)·(day − d_prev)/(d_next − d_prev), edges
    // clamp to the nearest observation. The bracketing observation and its
    // day ride in ONE struct per direction (last/first ignoreNulls over
    // the same user_id/day order), so all four carriers plus the fill share
    // a single Exchange + sort — the table_scd2 single-shuffle idiom. The
    // interpolation itself is fixed-operand-order IEEE arithmetic on
    // deterministic inputs (per-day value is max() — merge-order-free), so
    // the unrounded doubles are bit-identical cross-engine; rnd() guards
    // the division anyway. Scale: identical to ts_fillgaps — per-key grid,
    // no global calendar, window state O(1) per direction.
    QDef(
      "ts_interp",
      (s, dir) => {
        val obs = T.events(s, dir)
          .select(col("user_id"),
            expr("unix_timestamp(ts) div 86400").as("day"), col("value"))
        val daily = obs.groupBy("user_id", "day").agg(max("value").as("obs_v"))
        val grid = daily.groupBy("user_id")
          .agg(min("day").as("d0"), max("day").as("d1"))
          .select(col("user_id"),
            explode(sequence(col("d0"), col("d1"))).as("day"))
        val wp = Window.partitionBy("user_id").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // Forward carrier via the RUNNING frame of the reversed ordering:
        // first() over (CURRENT ROW, UNBOUNDED FOLLOWING) runs on Spark's
        // O(partition²) UnboundedFollowing frame (the join_asof_nearest
        // lesson); last() over the descending running frame is the same
        // value maintained incrementally — grid days are unique per user,
        // so the descending sort is an exact reverse.
        val wn = Window.partitionBy("user_id").orderBy(col("day").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val carrier = when(col("obs_v").isNotNull,
          struct(col("day").as("d"), col("obs_v").as("v")))
        grid.join(daily, Seq("user_id", "day"), "left")
          .withColumn("p", last(carrier, ignoreNulls = true).over(wp))
          .withColumn("nx", last(carrier, ignoreNulls = true).over(wn))
          .select(col("user_id"), col("day"), col("obs_v"),
            rnd(
              when(col("obs_v").isNotNull, col("obs_v"))
                .when(col("p").isNull, col("nx.v"))
                .when(col("nx").isNull, col("p.v"))
                .otherwise(col("p.v") + (col("nx.v") - col("p.v")) *
                  ((col("day") - col("p.d")).cast("double") /
                    (col("nx.d") - col("p.d")).cast("double"))),
              6).as("interp"))
          .orderBy("user_id", "day")
      },
      Some("""WITH obs AS (
             |  SELECT user_id,
             |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day, value
             |  FROM events),
             |d AS (SELECT user_id, day, max(value) AS obs_v
             |      FROM obs GROUP BY user_id, day),
             |b AS (SELECT user_id, min(day) AS d0, max(day) AS d1
             |      FROM d GROUP BY user_id),
             |grid AS (SELECT user_id, unnest(generate_series(d0, d1)) AS day FROM b),
             |j AS (SELECT g.user_id, g.day, d.obs_v
             |      FROM grid g LEFT JOIN d ON d.user_id = g.user_id AND d.day = g.day),
             |f AS (SELECT user_id, day, obs_v,
             |  last_value(CASE WHEN obs_v IS NOT NULL THEN day END IGNORE NULLS)
             |    OVER wp AS pd,
             |  last_value(obs_v IGNORE NULLS) OVER wp AS pv,
             |  first_value(CASE WHEN obs_v IS NOT NULL THEN day END IGNORE NULLS)
             |    OVER wn AS nd,
             |  first_value(obs_v IGNORE NULLS) OVER wn AS nv
             |  FROM j WINDOW
             |    wp AS (PARTITION BY user_id ORDER BY day ROWS UNBOUNDED PRECEDING),
             |    wn AS (PARTITION BY user_id ORDER BY day
             |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
             |SELECT user_id, day, obs_v,
             |  floor((CASE WHEN obs_v IS NOT NULL THEN obs_v
             |    WHEN pd IS NULL THEN nv
             |    WHEN nd IS NULL THEN pv
             |    ELSE pv + (nv - pv) * (CAST(day - pd AS DOUBLE) /
             |                           CAST(nd - pd AS DOUBLE))
             |  END) * 1e6 + 0.5) / 1e6 AS interp
             |FROM f ORDER BY user_id, day""".stripMargin)),

    // Event-type transition matrix — win_funnel's Markov sibling: the
    // funnel checks ONE prescribed stage order, this measures ALL observed
    // next-event transitions P(to | from) per user journey. The successor
    // comes from lead() over each user's (ts, event_id) order — event_id
    // breaks timestamp ties deterministically, the same discipline as
    // win_sessionize — then the matrix is a (from, to) count rollup with
    // row-normalized probabilities. Scale shape: ONE corpus shuffle (the
    // per-user window partitioning), then partial-agg counts on the
    // (from, to) key; the row totals come from a window over the
    // #types²-row aggregate (bounded at any corpus size), never the
    // corpus; one rnd-guarded division per matrix cell.
    QDef(
      "win_transitions",
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
        val wt = Window.partitionBy("from_type")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        T.events(s, dir)
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .where(col("next_type").isNotNull)
          .groupBy(col("event_type").as("from_type"),
            col("next_type").as("to_type"))
          .agg(count(lit(1)).as("n"))
          .withColumn("row_total", sum("n").over(wt))
          .select(col("from_type"), col("to_type"), col("n"), col("row_total"),
            rnd(col("n").cast("double") / col("row_total"), 6).as("p"))
          .orderBy("from_type", "to_type")
      },
      Some("""WITH t AS (
             |  SELECT user_id, event_type,
             |    lead(event_type, 1) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS next_type
             |  FROM events),
             |m AS (
             |  SELECT event_type AS from_type, next_type AS to_type,
             |    count(*) AS n
             |  FROM t WHERE next_type IS NOT NULL
             |  GROUP BY 1, 2),
             |r AS (
             |  SELECT from_type, to_type, n,
             |    CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS row_total
             |  FROM m)
             |SELECT from_type, to_type, n, row_total,
             |  floor((CAST(n AS DOUBLE) / row_total) * 1e6 + 0.5) / 1e6 AS p
             |FROM r ORDER BY from_type, to_type""".stripMargin)),

    // SEQUENCE PATTERN MATCHING (MATCH_RECOGNIZE compiled to windows):
    // find every CONTIGUOUS `view (click)* purchase` run in each user's
    // ordered event sequence, WITHIN 7200s — one output row per match
    // (start, end, quantifier count, duration). The compilation trick:
    // a per-row "last non-click predecessor" (last_value IGNORE NULLS
    // over the preceding frame) collapses the Kleene star — a purchase
    // whose last non-click predecessor is a view has ONLY clicks between
    // them, so (nc_rn, rn) IS the match and rn − nc_rn − 1 counts the
    // stars. Matches are naturally non-overlapping (a second purchase's
    // last non-click is the first purchase, never the consumed view) —
    // the SQL:2016 AFTER MATCH SKIP PAST LAST ROW default for free. The
    // 7200s bound (the WITHIN clause) is load-bearing on the fixture:
    // it rejects 41/425/4206 over-bound matches at the three scales.
    // At 100 TB: the pattern runs as two stacked windows over ONE
    // user-key shuffle (the second orders by rn ≡ the first's order, so
    // no extra sort) — no joins, no per-pattern passes; this is how
    // Flink CEP / MATCH_RECOGNIZE semantics land on a batch engine.
    QDef(
      "win_pattern",
      (s, dir) => {
        val byUser = Window.partitionBy("user_id")
          .orderBy(col("sec"), col("event_id"))
        val prev = Window.partitionBy("user_id").orderBy(col("rn"))
          .rowsBetween(Window.unboundedPreceding, -1)
        def nc(c: Column) =
          last(when(col("event_type") =!= "click", c), ignoreNulls = true)
            .over(prev)
        T.events(s, dir)
          .select(col("user_id"), col("event_type"),
            unix_timestamp(col("ts")).as("sec"), col("event_id"))
          .withColumn("rn", row_number().over(byUser))
          // One projection for all three predecessor captures → one
          // Window operator (CollapseWindow can't see through a
          // withColumn chain; three passes over every partition buffer
          // would be pure waste).
          .select(col("*"), nc(col("rn")).as("nc_rn"),
            nc(col("event_type")).as("nc_type"), nc(col("sec")).as("nc_sec"))
          .where(col("event_type") === "purchase"
            && col("nc_type") === "view"
            && col("sec") - col("nc_sec") <= 7200L)
          .select(col("user_id"), col("nc_sec").as("t_view"),
            col("sec").as("t_purchase"),
            (col("rn") - col("nc_rn") - 1).cast("long").as("n_clicks"),
            (col("sec") - col("nc_sec")).as("dur_sec"))
          .orderBy("user_id", "t_view")
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_type,
             |    CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_id
             |  FROM events),
             |o AS (
             |  SELECT user_id, event_type, sec, event_id,
             |    row_number() OVER (PARTITION BY user_id ORDER BY sec, event_id) AS rn
             |  FROM e),
             |m AS (
             |  SELECT user_id, event_type, sec, rn,
             |    last_value(CASE WHEN event_type <> 'click' THEN rn END IGNORE NULLS)
             |      OVER wp AS nc_rn,
             |    last_value(CASE WHEN event_type <> 'click' THEN event_type END IGNORE NULLS)
             |      OVER wp AS nc_type,
             |    last_value(CASE WHEN event_type <> 'click' THEN sec END IGNORE NULLS)
             |      OVER wp AS nc_sec
             |  FROM o WINDOW wp AS (PARTITION BY user_id ORDER BY rn
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
             |SELECT user_id, nc_sec AS t_view, sec AS t_purchase,
             |  CAST(rn - nc_rn - 1 AS BIGINT) AS n_clicks,
             |  sec - nc_sec AS dur_sec
             |FROM m
             |WHERE event_type = 'purchase' AND nc_type = 'view'
             |  AND sec - nc_sec <= 7200
             |ORDER BY user_id, t_view""".stripMargin)),

    // EWMA with EXACT arithmetic — the recency-weighted smoother every
    // monitoring/feature pipeline wants, built so no floating point ever
    // enters: α = 1/2 makes the weights powers of two (1 << k — exact
    // BIGINT in both engines, where pow() would drift in low bits), flux
    // rides as integer cents, and the weighted mean is one BIGINT
    // floor-division of two exact sums. Per user: rank events by (time,
    // id), keep the FINAL event, attach its trailing 16-event window with
    // one bounded self-join (fan-out ≤ 16 per user — a prefiltered join,
    // not a per-row window over the stream), fold Σ(cents·2^k) and
    // Σ(2^k), divide once. Short histories normalize by the weights
    // actually present (the truncated-series correction). values > 0
    // keeps every sum positive — Spark `div` truncates while DuckDB `//`
    // floors, and positivity makes them identical. At 100 TB: the
    // expensive part is one rank per user (partitioned window) and a
    // 16-row join per OUTPUT row, not per event.
    QDef(
      "ts_ewma",
      (s, dir) => {
        val r = T.events(s, dir)
          .where(col("value") > 0.0)
          .select(col("user_id"),
            unix_timestamp(col("ts")).as("t"), col("event_id"),
            expr("cast(floor(value * 1e2 + 0.5) as bigint)").as("cents"))
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("user_id").orderBy(col("t"), col("event_id")))
            .cast("long"))
        val last = r.groupBy("user_id").agg(max("rn").as("rn"))
        r.select(col("user_id"), col("rn").as("rn2"), col("cents"))
          .join(last, Seq("user_id"))
          .where(col("rn2") > col("rn") - 16L && col("rn2") <= col("rn"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_win"),
            expr("""cast(
                (1000 * sum(cents * shiftleft(cast(1 as bigint), cast(15 - (rn - rn2) as int))))
                div sum(shiftleft(cast(1 as bigint), cast(15 - (rn - rn2) as int)))
              as bigint)""").as("ewma_mc"))
          .orderBy("user_id")
      },
      Some("""WITH r AS (
             |  SELECT user_id,
             |    CAST(floor(value * 1e2 + 0.5) AS BIGINT) AS cents,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS rn
             |  FROM events WHERE value > 0),
             |last AS (SELECT user_id, max(rn) AS rn FROM r GROUP BY 1),
             |win AS (
             |  SELECT r.user_id, r.cents, last.rn - r.rn AS back
             |  FROM r JOIN last ON last.user_id = r.user_id
             |  WHERE r.rn > last.rn - 16 AND r.rn <= last.rn)
             |SELECT user_id, count(*) AS n_win,
             |  CAST((1000 * sum(cents * (CAST(1 AS BIGINT) << CAST(15 - back AS INT))))
             |    // sum(CAST(1 AS BIGINT) << CAST(15 - back AS INT)) AS BIGINT) AS ewma_mc
             |FROM win GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // GAPS-AND-ISLANDS — the ID-continuity twin of win_sessionize's
    // time-gap sessions (the classic "consecutive active days" query):
    // per user, the distinct active MINUTES form islands of consecutive
    // values, found by the canonical trick minute − row_number() — a
    // quantity CONSTANT within a consecutive run and distinct across runs
    // (any gap shifts it). Rollup per user: active minutes, number of
    // streaks, longest streak. All-integer (epoch minutes), so island
    // boundaries are exact. Scale: ONE user-key shuffle carries the
    // distinct, the window, and both rollups — the (user, island) and
    // user groupings are satisfied by the window's hash partitioning
    // (grouping keys ⊇ partition key, the mm_scenecut observation).
    QDef(
      "win_gaps_islands",
      (s, dir) => {
        val byU = Window.partitionBy("user_id").orderBy("minute")
        // Dedup WITHIN the user partition via lag (a distinct() would add
        // a second (user, minute)-keyed exchange before the window's
        // user-keyed one) — duplicates are adjacent under the sort, so
        // keeping first occurrences is a frame-local decision.
        T.events(s, dir)
          .select(col("user_id"),
            expr("unix_timestamp(ts) div 60").as("minute"))
          .withColumn("dup",
            lag("minute", 1).over(byU) === col("minute"))
          .where(col("dup").isNull || !col("dup"))
          .withColumn("island",
            col("minute") - row_number().over(byU).cast("long"))
          .groupBy("user_id", "island")
          .agg(count(lit(1)).as("len"))
          .groupBy("user_id")
          .agg(sum("len").cast("long").as("n_active_minutes"),
            count(lit(1)).as("n_streaks"),
            max("len").as("max_streak"))
          .orderBy("user_id")
      },
      Some("""WITH m AS (
             |  SELECT DISTINCT user_id,
             |    CAST(floor(epoch(ts)) AS BIGINT) // 60 AS minute
             |  FROM events),
             |i AS (
             |  SELECT user_id, minute,
             |    minute - CAST(row_number() OVER (PARTITION BY user_id
             |      ORDER BY minute) AS BIGINT) AS island
             |  FROM m),
             |g AS (SELECT user_id, island, count(*) AS len FROM i GROUP BY 1, 2)
             |SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_minutes,
             |  count(*) AS n_streaks, CAST(max(len) AS BIGINT) AS max_streak
             |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin))
  )
}
