package graft.operators

import graft.Rnd.rnd
import graft.{QDef, Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.10 Structured-Streaming operators, declared in their batch-equivalent
  * form (streaming results cannot hash-match a DuckDB oracle; the *semantics*
  * are oracle-checked here in batch, the *streaming execution* of the same
  * expressions is exercised by `graft.streaming.StreamRunner` and its
  * ScalaTest suite — SURVEY §2.10 strategy).
  *
  * The `window(ts, ...)` / sessionization expressions below are the exact
  * expressions the streaming variants run; batch and stream share the plan
  * fragments, so the two cannot drift.
  */
object StreamingOps {

  private def cents = rnd(col("value") * 100.0, 0).cast("long")

  val defs: Seq[QDef] = Seq(

    // Tumbling 1-hour window × event_type (same expr batch & stream).
    QDef(
      "stream_tumbling",
      (s, dir) =>
        T.events(s, dir)
          .withColumn("cents", cents)
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
          .select(col("w.start").as("win_start"), col("event_type"), col("n"),
            col("sum_cents"))
          .orderBy("win_start", "event_type"),
      Some("""SELECT date_trunc('hour', ts) AS win_start, event_type,
             |  count(*) AS n,
             |  CAST(sum(CAST(floor((value * 100.0) * 1e0 + 0.5) / 1e0 AS BIGINT)) AS BIGINT) AS sum_cents
             |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin)),

    // Sliding 1-hour window every 15 minutes: each event lands in 4 windows.
    QDef(
      "stream_sliding",
      (s, dir) =>
        T.events(s, dir)
          .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
          .agg(count(lit(1)).as("n"))
          .select(col("w.start").as("win_start"), col("n"))
          .orderBy("win_start"),
      Some("""SELECT win_start, count(*) AS n FROM (
             |  SELECT TIMESTAMP '1970-01-01 00:00:00' +
             |    (CAST(floor(epoch(ts) / 900) AS BIGINT) * 900 - k * 900) * INTERVAL '1 second'
             |      AS win_start, ts
             |  FROM events, (SELECT unnest([0, 1, 2, 3]) AS k))
             |WHERE ts >= win_start AND ts < win_start + INTERVAL '1 hour'
             |GROUP BY win_start ORDER BY win_start""".stripMargin)),

    // Session windows: 30-minute-gap sessionization per user. Batch form =
    // lag-gap flag + running sum (ANSI in both engines); the streaming form
    // is session_window(ts, '30 minutes') over the same column —
    // StreamingSpec runs that NATIVE form (built-in session state, append
    // mode, watermark-flushed) against these exact expressions and pins
    // row parity on a boundary-exercising fixture.
    QDef(
      "stream_session",
      (s, dir) => {
        val byUser = Window.partitionBy("user_id").orderBy(col("sec"), col("event_id"))
        val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        T.events(s, dir)
          .withColumn("sec", unix_timestamp(col("ts")))
          .withColumn("new_sess",
            when(col("sec") - lag(col("sec"), 1).over(byUser) > 1800L, 1L)
              .when(lag(col("sec"), 1).over(byUser).isNull, 1L)
              .otherwise(0L))
          .withColumn("sess_id", sum(col("new_sess")).over(run))
          .groupBy("user_id", "sess_id")
          .agg(min("sec").as("sess_start_sec"), max("sec").as("sess_end_sec"),
            count(lit(1)).as("n_events"))
          .select(col("user_id"), col("sess_id"),
            col("sess_start_sec"),
            (col("sess_end_sec") - col("sess_start_sec")).as("dur_sec"),
            col("n_events"))
          .orderBy("user_id", "sess_id")
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec
             |  FROM events),
             |flagged AS (
             |  SELECT user_id, event_id, sec,
             |    CASE WHEN lag(sec) OVER w IS NULL THEN 1
             |         WHEN sec - lag(sec) OVER w > 1800 THEN 1 ELSE 0 END AS new_sess
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
             |sess AS (
             |  SELECT user_id, sec,
             |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY sec, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
             |  FROM flagged)
             |SELECT user_id, sess_id,
             |  min(sec) AS sess_start_sec,
             |  max(sec) - min(sec) AS dur_sec,
             |  count(*) AS n_events
             |FROM sess GROUP BY user_id, sess_id
             |ORDER BY user_id, sess_id""".stripMargin)),

    // The SAME sessionization through Spark's NATIVE session_window
    // operator — a genuinely different engine path from stream_session's
    // hand-rolled lag-gap windows: the planner's SessionWindow node
    // assigns each event [t, t+gap) and MERGES overlapping-or-touching
    // spans per key (a next-start equal to the current end merges —
    // probed empirically — which is exactly the lag form's strict
    // `> 1800` split convention, so the two share one oracle at every
    // boundary). This is the form that promotes to streaming unchanged
    // (StreamingSpec runs it under append mode with built-in session
    // state and pins parity against the lag form). session_window carries
    // no ordinal, so the output keys sessions by their start second.
    // At 100 TB both forms cost one user-key shuffle; the native operator
    // additionally ports to the incremental-state streaming runtime for
    // free, which the lag form never can (running sums don't checkpoint).
    QDef(
      "stream_session_native",
      (s, dir) =>
        T.events(s, dir)
          .withColumn("sec", unix_timestamp(col("ts")))
          // session_window compares RAW timestamps; the oracle's lag form
          // compares floored seconds. A 1800.0004s raw gap would split
          // natively but merge at second granularity — sessionize on the
          // same second grid both engines see (the fixture carries micros).
          .groupBy(col("user_id"),
            session_window(timestamp_seconds(col("sec")), "30 minutes"))
          .agg(min("sec").as("sess_start_sec"),
            (max("sec") - min("sec")).as("dur_sec"),
            count(lit(1)).as("n_events"))
          .select(col("user_id"), col("sess_start_sec"), col("dur_sec"),
            col("n_events"))
          .orderBy("user_id", "sess_start_sec"),
      Some("""WITH e AS (
             |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec
             |  FROM events),
             |flagged AS (
             |  SELECT user_id, event_id, sec,
             |    CASE WHEN lag(sec) OVER w IS NULL THEN 1
             |         WHEN sec - lag(sec) OVER w > 1800 THEN 1 ELSE 0 END AS new_sess
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
             |sess AS (
             |  SELECT user_id, sec,
             |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY sec, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
             |  FROM flagged)
             |SELECT user_id,
             |  min(sec) AS sess_start_sec,
             |  max(sec) - min(sec) AS dur_sec,
             |  count(*) AS n_events
             |FROM sess GROUP BY user_id, sess_id
             |ORDER BY user_id, sess_start_sec""".stripMargin)),

    // Stateful dedup, batch form: first event per (user_id, event_type) —
    // the semantics dropDuplicatesWithinWatermark enforces incrementally.
    QDef(
      "stream_stateful_dedup",
      (s, dir) => {
        val w = Window.partitionBy("user_id", "event_type")
          .orderBy(col("ts"), col("event_id"))
        T.events(s, dir)
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select("user_id", "event_type", "event_id", "ts")
          .orderBy("user_id", "event_type")
      },
      Some("""SELECT user_id, event_type, event_id, ts FROM (
             |  SELECT user_id, event_type, event_id, ts,
             |    row_number() OVER (PARTITION BY user_id, event_type
             |      ORDER BY ts, event_id) AS rn
             |  FROM events)
             |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin)),

    // Custom keyed state (flatMapGroupsWithState): a REAL streaming
    // execution whose event-time fold provably equals the batch form, so it
    // carries a full DuckDB oracle — see StreamRunner.customStateAgg.
    QDef(
      "stream_custom_state",
      (s, dir) => graft.streaming.StreamRunner.customStateAgg(s, dir),
      Some("""WITH e AS (
             |  SELECT CAST(user_id AS BIGINT) AS user_id, event_id,
             |    CAST(floor(epoch(ts)) AS BIGINT) AS sec
             |  FROM events),
             |g AS (
             |  SELECT user_id, sec,
             |    sec - lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS gap
             |  FROM e)
             |SELECT user_id, count(*) AS n_events,
             |  CAST(max(gap) AS BIGINT) AS max_gap_sec,
             |  max(sec) AS last_sec
             |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // The SAME custom keyed state on Spark 4's transformWithState — the
    // replacement API (named typed state slots, per-state TTL, timers,
    // composite state, RocksDB-backed): identical fold, identical oracle,
    // and StreamingSpec asserts the two APIs agree row-identically — the
    // migration guarantee a job porting off flatMapGroupsWithState needs.
    QDef(
      "stream_custom_state_tws",
      (s, dir) => graft.streaming.StreamRunner.customStateAggTws(s, dir),
      Some("""WITH e AS (
             |  SELECT CAST(user_id AS BIGINT) AS user_id, event_id,
             |    CAST(floor(epoch(ts)) AS BIGINT) AS sec
             |  FROM events),
             |g AS (
             |  SELECT user_id, sec,
             |    sec - lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS gap
             |  FROM e)
             |SELECT user_id, count(*) AS n_events,
             |  CAST(max(gap) AS BIGINT) AS max_gap_sec,
             |  max(sec) AS last_sec
             |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Event-time TIMERS + composite state on transformWithState — the API
    // surface stream_custom_state_tws's value-state port leaves
    // unexercised: sessions fold into a ListState (event seconds) + a
    // MapState (per-type counts); a successor event past the gap
    // closes a session inline ('gap'), the registered event-time timer at
    // lastSec + gap fires in the post-drain no-data batch once the
    // watermark passes it ('timer'), and a trailing session the final
    // watermark never reaches is NEVER emitted — the streaming truth,
    // which the batch oracle reproduces from max(sec). Deterministic
    // because gap closures are watermark-independent and the fixture
    // drains in one data batch. State TTL is processing-time-only and
    // ILLEGAL in EventTime mode (the handle rejects it), so TTL'd state
    // runs in its legal mode in StreamRunner.ttlStateProbe + spec. The
    // REAL streaming run must hash-match the oracle.
    QDef(
      "stream_tws_timers",
      (s, dir) => graft.streaming.StreamRunner.sessionTimersTws(s, dir),
      Some("""WITH e AS (
             |  SELECT CAST(user_id AS BIGINT) AS user_id, event_type,
             |    CAST(floor(epoch(ts)) AS BIGINT) AS sec
             |  FROM events),
             |mx AS (SELECT max(sec) AS m FROM e),
             |flagged AS (
             |  SELECT user_id, event_type, sec,
             |    CASE WHEN lag(sec) OVER w IS NULL THEN 1
             |         WHEN sec - lag(sec) OVER w > 1800 THEN 1 ELSE 0 END AS new_sess
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_type)),
             |sess0 AS (
             |  SELECT user_id, event_type, sec,
             |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY sec, event_type
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
             |  FROM flagged),
             |sess AS (
             |  SELECT user_id, sid, min(sec) AS s_start, max(sec) AS s_end,
             |    count(*) AS n_events,
             |    CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
             |  FROM sess0 GROUP BY 1, 2),
             |lastsid AS (SELECT user_id, max(sid) AS msid FROM sess GROUP BY 1)
             |SELECT s.user_id, s.s_start, s.s_end, s.n_events, s.n_types,
             |  CASE WHEN s.sid < l.msid THEN 'gap' ELSE 'timer' END AS closed_by
             |FROM sess s JOIN lastsid l ON l.user_id = s.user_id
             |WHERE s.sid < l.msid OR s.s_end + 1800 <= (SELECT m FROM mx)
             |ORDER BY s.user_id, s.s_start""".stripMargin)),

    // Streaming top-k leaderboard: per-(type, user) running counts in keyed
    // state (flatMapGroupsWithState), final rank after the stream drains.
    // Counts are order-independent folds, so this REAL streaming execution
    // hash-matches the batch oracle — the strongest check any streaming op
    // here gets. State is O(1) per pair and partitions on the pair key; a
    // per-type "top list" state would hot-spot one key and grow unbounded.
    QDef(
      "stream_topk",
      (s, dir) => graft.streaming.StreamRunner.topkLeaderboard(s, dir, 3),
      Some("""SELECT event_type, user_id, n, rank FROM (
             |  SELECT event_type, user_id, count(*) AS n,
             |    row_number() OVER (PARTITION BY event_type
             |      ORDER BY count(*) DESC, user_id ASC) AS rank
             |  FROM events GROUP BY event_type, user_id)
             |WHERE rank <= 3 ORDER BY event_type, rank""".stripMargin)),

    // Stream-stream join, batch-declared form: views joined to purchases of
    // the same user within the preceding hour (the interval-bounded
    // equi-join Structured Streaming runs with watermarks on both sides —
    // state retention is exactly the join's time bound). LEFT join keeps
    // zero-view purchases; integer epoch-seconds bound the interval so the
    // predicate is exact cross-engine. StreamingSpec runs the REAL
    // stream-stream join on MemoryStreams and asserts parity with this
    // batch form.
    //
    // Scale: both sides shuffle once on user_id; per-key state in the
    // streaming form is bounded by the 1-hour watermark horizon — the
    // property that makes the join runnable forever on an unbounded stream.
    QDef(
      "stream_join",
      (s, dir) => {
        val e = T.events(s, dir)
          .withColumn("sec", unix_timestamp(col("ts")))
        val p = e.where(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("p_id"), col("sec").as("p_sec"))
        val v = e.where(col("event_type") === "view")
          .select(col("user_id"), col("event_id").as("v_id"), col("sec").as("v_sec"))
        p.join(v,
            p("user_id") === v("user_id") &&
              col("v_sec") >= col("p_sec") - 3600L && col("v_sec") <= col("p_sec"),
            "left")
          .groupBy("p_id")
          .agg(count(col("v_id")).as("n_prior_views"))
          .orderBy("p_id")
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_id, event_type,
             |    CAST(floor(epoch(ts)) AS BIGINT) AS sec
             |  FROM events),
             |p AS (SELECT user_id, event_id AS p_id, sec AS p_sec FROM e
             |      WHERE event_type = 'purchase'),
             |v AS (SELECT user_id, event_id AS v_id, sec AS v_sec FROM e
             |      WHERE event_type = 'view')
             |SELECT p_id, count(v_id) AS n_prior_views
             |FROM p LEFT JOIN v
             |  ON p.user_id = v.user_id
             |  AND v.v_sec >= p.p_sec - 3600 AND v.v_sec <= p.p_sec
             |GROUP BY p_id ORDER BY p_id""".stripMargin)),

    // Stream-static enrichment join — the OTHER streaming join (stream_join
    // covers stream-stream): every arriving event picks up its dimension
    // attributes from a STATIC table, the enrichment shape of virtually
    // every production ingest (events ⋈ user/account/catalog dim). In
    // Structured Streaming a stream-static inner join is stateless — the
    // static side broadcasts into each micro-batch, no watermark, no join
    // state — which is why it scales to any stream volume; the dimension
    // refreshes by swapping the static frame between restarts. Batch form
    // joins + aggregates identically (same expressions), full DuckDB
    // oracle; StreamingSpec runs the REAL stream-static join and asserts
    // parity.
    QDef(
      "stream_enrich",
      (s, dir) => {
        val dim = T.customer(s, dir)
          .select(col("c_custkey"), col("c_mktsegment"))
        T.events(s, dir)
          .withColumn("cents", cents)
          .join(broadcast(dim), col("user_id") === col("c_custkey"))
          .groupBy("c_mktsegment", "event_type")
          .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
          .orderBy("c_mktsegment", "event_type")
      },
      Some("""SELECT c_mktsegment, event_type, count(*) AS n,
             |  CAST(sum(CAST(floor((value * 100.0) * 1e0 + 0.5) / 1e0 AS BIGINT)) AS BIGINT) AS sum_cents
             |FROM events e JOIN customer c ON e.user_id = c.c_custkey
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Streaming quantile monitor — the sketch story end-to-end: per
    // (1-hour window, type) DDSketch bucket counts are EXACTLY the state a
    // Structured Streaming aggregation maintains (bounded: ≤~540 occupied
    // buckets per group at α = 0.01, regardless of event volume — the
    // property that makes a percentile monitor runnable forever on an
    // unbounded stream, where per-window percentile_approx state would
    // work too but not re-aggregate and a sorted-values state would grow
    // with the data); the p50/p90 estimate is the shared relational
    // rank-scan tail (Aggregates.ddEstimate) over the emitted sketch
    // table. Declared without an oracle like its batch sibling
    // agg_pctile_reagg (ln-boundary buckets are engine-specific);
    // StreamingSpec runs the REAL streaming aggregation and asserts the
    // streamed sketch + estimate ≡ this batch form exactly, and ApproxSpec
    // tolerance law covers the estimator itself.
    QDef(
      "stream_pctile",
      (s, dir) => {
        val sk = T.events(s, dir)
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"),
            Aggregates.ddBucket.as("b"))
          .agg(count(lit(1)).as("cnt"))
          .select(col("w.start").as("win_start"), col("event_type"),
            col("b"), col("cnt"))
        Aggregates.ddEstimate(sk, Seq("win_start", "event_type"))
      },
      None),

    // Streaming-only semantics: real Structured Streaming runs (file replay
    // source → watermark/foreachBatch → sink), no DuckDB oracle (driver
    // rows-only check). See graft.streaming.StreamRunner.
    QDef(
      "stream_watermark",
      (s, dir) => graft.streaming.StreamRunner.tumblingWithWatermark(s, dir),
      None),

    // foreachBatch idempotent-sink pattern — ORACLED (round 12): the sink
    // overwrites the target per batch id and the declared read re-aggregates
    // the read-back, so with complete-mode semantics the final target holds
    // exactly the full per-type counts no matter how many micro-batches the
    // replay split into — deterministic, hence the batch-equivalent SQL
    // (the same strongest-check upgrade stream_exactly_once already has).
    QDef(
      "stream_foreachbatch",
      (s, dir) => graft.streaming.StreamRunner.foreachBatchUpsert(s, dir),
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Streaming exactly-once into the transaction log: foreachBatch stages
    // each micro-batch as a generation and commits it under
    // version = batchId + 1 with an idempotence guard; a simulated
    // failure-recovery replay re-delivers batch 0, the guard makes its
    // commit a no-op (require'd in-query), and VACUUM reclaims the
    // replay's staged files. Unlike the other streaming ops this one IS
    // oracle-checkable: the committed snapshot must equal the batch
    // per-type counts exactly — a duplicated commit would double them.
    // See StreamRunner.exactlyOnceCommitLog + sources/CommitLog.scala.
    QDef(
      "stream_exactly_once",
      (s, dir) => graft.streaming.StreamRunner.exactlyOnceCommitLog(s, dir),
      Some("""SELECT event_type, count(*) AS n
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Streaming change-feed consumer: a real Structured Streaming query
    // tails a CommitLog table's `_log` (file-stream source — each commit
    // is one new immutable file) and maintains table_incr_refresh's
    // per-bucket view by folding each commit's signed file deltas —
    // across a stream RESTART, with the rewrite committed while the
    // stream is down and the resumed tail require'd to consume exactly
    // the one new commit. Same history as table_incr_refresh, so the
    // final view shares its oracle (and StreamingSpec asserts streamed ≡
    // batch-folded row-identically). See StreamRunner.changefeedView.
    // Streaming CDC APPLY — table_apply_cdf's replica maintenance as a
    // RUNNING Structured Streaming query: the replica tails the source
    // table's `_log`, folds each batch's file actions into NET row deltas
    // (in-batch churn cancels at the file level first — AvailableNow can
    // group several source commits into one batch, and a replica must
    // converge at any lag), and applies them to its OWN commit-log table
    // with the stats-pruned copy-on-write merge — across a stream
    // RESTART, with the retention purge committed while the stream is
    // down and replica ≡ source require'd after every pass. See
    // StreamRunner.cdcApplyReplica.
    QDef(
      "stream_cdc_apply",
      (s, dir) => graft.streaming.StreamRunner.cdcApplyReplica(s, dir),
      Some("""WITH k AS (
             |  SELECT (SELECT max(o_orderkey) FROM orders) // 4 + 1 AS k1),
             |v3 AS (
             |  SELECT o_orderkey AS key, o_totalprice AS val FROM orders
             |  WHERE (o_orderkey % 2 = 1 OR o_orderkey % 6 = 2)
             |    AND o_orderkey >= (SELECT k1 FROM k))
             |SELECT key % 8 AS bucket, count(*) AS n,
             |  CAST(sum(CAST(floor(val * 1e2 + 0.5) AS BIGINT)) AS BIGINT) AS cents
             |FROM v3 GROUP BY 1 ORDER BY 1""".stripMargin)),

    // STREAMING NIGHTLY REFRESH — pipeline_nightly's incremental-feature
    // leg as a RUNNING stream: per-object (n, Σmag) moment states
    // maintained by a foreachBatch job tailing the light-curve table's
    // log, folding only each batch's added files (history stays unread),
    // with the IVM law (streamed state ≡ batch recompute at the batch's
    // high-water version) require'd INSIDE every micro-batch and night 2
    // landing across a stream restart. batchId-txn-stamped state commits
    // make replays no-ops. See StreamRunner.nightlyRefreshStream.
    QDef(
      "stream_nightly",
      (s, dir) => graft.streaming.StreamRunner.nightlyRefreshStream(s, dir),
      Some("""WITH det AS (
             |  SELECT user_id AS u, -2.5 * log10(value) + 25.0 AS mag
             |  FROM events WHERE value > 0.0)
             |SELECT u AS object_id, count(*) AS n_total,
             |  floor((sum(mag) / count(*)) * 1e6 + 0.5) / 1e6 AS mean_mag,
             |  CAST(2 AS BIGINT) AS n_state_versions
             |FROM det GROUP BY u ORDER BY object_id""".stripMargin)),

    // STREAMING TRANSIENT ASSOCIATION [PK — the alert-broker stage
    // downstream of pipeline_transient's image subtraction: ZTF/LSST
    // brokers consume a DETECTION stream, not pixels, and associate
    // same-position detections into evolving transient light curves].
    // Detections arrive one epoch per micro-batch (file source,
    // maxFilesPerTrigger = 1); a flatMapGroupsWithState fold keyed on
    // POSITION accumulates the (epoch, flux) list and re-derives the
    // census + rising/fading/single classification on every update. The
    // state is ORDER-INDEPENDENT (sorted at emit), so out-of-order epoch
    // replay cannot corrupt the curve, and its size is bounded by
    // epochs-per-candidate. The streamed-≡-batch law is require'd inside
    // the run; the declared output re-derives the same census the DuckDB
    // oracle computes from the literal detection schedule. See
    // StreamRunner.transientAssocStream.
    QDef(
      "stream_transient",
      (s, dir) => graft.streaming.StreamRunner.transientAssocStream(s, dir),
      Some("""WITH det AS (
             |  SELECT * FROM (VALUES
             |    (1, 10, 10, 2000), (3, 10, 10, 2500), (5, 10, 10, 3000),
             |    (3, 24, 20, 3000), (5, 24, 20, 2600), (5, 5, 25, 2100),
             |    (2, 7, 30, 1500), (4, 28, 3, 1800))
             |    t(frame_id, x, y, flux)),
             |curve AS (
             |  SELECT frame_id, x, y, flux,
             |    flux - lag(flux, 1) OVER (PARTITION BY x, y
             |      ORDER BY frame_id) AS dflux
             |  FROM det),
             |census AS (
             |  SELECT CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y,
             |    count(*) AS n_epochs,
             |    CAST(min(frame_id) AS BIGINT) AS first_frame,
             |    CAST(max(frame_id) AS BIGINT) AS last_frame,
             |    CAST(max(flux) AS BIGINT) AS peak_flux,
             |    CAST(sum(flux) AS BIGINT) AS total_flux,
             |    min(dflux) AS min_d, max(dflux) AS max_d
             |  FROM curve GROUP BY x, y)
             |SELECT x, y, n_epochs, first_frame, last_frame, peak_flux,
             |  total_flux,
             |  CASE WHEN n_epochs = 1 THEN 'single'
             |       WHEN min_d > 0 THEN 'rising'
             |       WHEN max_d < 0 THEN 'fading'
             |       ELSE 'mixed' END AS class
             |FROM census ORDER BY x""".stripMargin)),

    // STATE EVICTION + LATE-DETECTION RESURRECTION [PK — the broker
    // reality at survey scale: candidates are unbounded, live state is
    // not]. stream_transient's association plus the watermark leg:
    // candidates idle past an event-time timeout EVICT to the curve
    // table (one mid-stream, one in the post-drain no-data batch), and a
    // LATE detection restarts the association with initialState re-read
    // FROM the table — the evicted candidate resurrects with its
    // pre-eviction history intact. Three laws require'd in-run: the
    // evict set equals the watermark arithmetic's verdict (the same
    // integer inequality the oracle evaluates: last on-time epoch ≤
    // horizon), the combined census ≡ the batch association over ALL
    // detections (on-time + late), and every resurrected candidate
    // counts more epochs than its late rows alone. See
    // StreamRunner.transientWatermarkStream.
    QDef(
      "stream_transient_watermark",
      (s, dir) => graft.streaming.StreamRunner.transientWatermarkStream(s, dir),
      Some("""WITH ontime AS (
             |  SELECT * FROM (VALUES
             |    (1, 10, 10, 2000), (3, 10, 10, 2500), (5, 10, 10, 3000),
             |    (3, 24, 20, 3000), (5, 24, 20, 2600), (5, 5, 25, 2100),
             |    (2, 7, 30, 1500), (4, 28, 3, 1800))
             |    t(frame_id, x, y, flux)),
             |late AS (
             |  SELECT * FROM (VALUES (3, 7, 30, 1700), (6, 10, 10, 3500))
             |    t(frame_id, x, y, flux)),
             |alldet AS (
             |  SELECT * FROM ontime UNION ALL SELECT * FROM late),
             |ev AS (
             |  SELECT x, y, max(frame_id) <= 4 AS evicted
             |  FROM ontime GROUP BY 1, 2),
             |curve AS (
             |  SELECT frame_id, x, y, flux,
             |    flux - lag(flux, 1) OVER (PARTITION BY x, y
             |      ORDER BY frame_id) AS dflux
             |  FROM alldet),
             |census AS (
             |  SELECT x, y, count(*) AS n_epochs,
             |    CAST(min(frame_id) AS BIGINT) AS first_frame,
             |    CAST(max(frame_id) AS BIGINT) AS last_frame,
             |    CAST(max(flux) AS BIGINT) AS peak_flux,
             |    CAST(sum(flux) AS BIGINT) AS total_flux,
             |    min(dflux) AS min_d, max(dflux) AS max_d
             |  FROM curve GROUP BY x, y)
             |SELECT CAST(c.x AS BIGINT) AS x, CAST(c.y AS BIGINT) AS y,
             |  c.n_epochs, c.first_frame, c.last_frame, c.peak_flux,
             |  c.total_flux,
             |  CASE WHEN c.n_epochs = 1 THEN 'single'
             |       WHEN c.min_d > 0 THEN 'rising'
             |       WHEN c.max_d < 0 THEN 'fading'
             |       ELSE 'mixed' END AS class,
             |  e.evicted,
             |  e.evicted AND EXISTS (SELECT 1 FROM late l
             |    WHERE l.x = c.x AND l.y = c.y) AS resurrected
             |FROM census c JOIN ev e USING (x, y)
             |ORDER BY c.x""".stripMargin)),

    // STREAMING ANN INDEX MAINTENANCE — the retrieval freshness path: a
    // real Structured Streaming query tails the corpus table's `_log`
    // (stream_changefeed's source shape) and appends each micro-batch's
    // arrivals to the standing ANN index through sim_index_maintain's
    // frozen-centroid path, exactly-once via the batchId txn stamp.
    // Adds at versions ≤ the index's day-0 base are filtered (the
    // backlog batch replays the whole log); the IVM law (streamed index
    // ≡ frozen-centroid recompute at the batch's high-water corpus
    // version) and the non-consuming read discipline (day-0 geometry
    // still live — a landed refit aborts the appender) are require'd
    // INSIDE every indexing batch; night 2 lands across a stream
    // restart. Declared output = sim_index_maintain's two probe lanes
    // over the final streamed index — the streamed and batch forms
    // share one oracle, and StreamingSpec pins them row-identical.
    // See StreamRunner.indexMaintainStream.
    QDef(
      "stream_index_maintain",
      (s, dir) => graft.streaming.StreamRunner.indexMaintainStream(s, dir),
      Some(graft.operators.Similarity.ivfProbeOracleSql(
        Some(graft.GraftConfig.AnnDeltaRem)))),

    // STREAMING DEDUP INDEX MAINTENANCE — stream_index_maintain's twin on
    // the standing LSH band index: the same log-tailing stream appends
    // each micro-batch's arrivals through the FROZEN-VOCABULARY signature
    // path (the token dictionary is the dedup family's frozen geometry —
    // fitted once on the day-0 snapshot, persisted beside the index;
    // arrivals' unseen tokens drop their shingles, and only a refit
    // re-ranks the vocab). Exactly-once via the batchId txn stamp; the
    // IVM law (streamed band index ≡ frozen-dict recompute at the batch's
    // high-water corpus version) and the non-consuming read discipline
    // are require'd inside every indexing batch; night 2 lands across a
    // stream restart. Declared output = today's crawl probing the final
    // streamed index in dedup_index_maintain's join shape; the oracle
    // mirrors the frozen dictionary (Dedup.frozenDeltaProbeSql), and
    // StreamingSpec pins streamed ≡ batch row-identically.
    // See StreamRunner.dedupMaintainStream.
    QDef(
      "stream_dedup_maintain",
      (s, dir) => graft.streaming.StreamRunner.dedupMaintainStream(s, dir),
      Some(graft.operators.Dedup.frozenDeltaProbeSql)),

    QDef(
      "stream_changefeed",
      (s, dir) => graft.streaming.StreamRunner.changefeedView(s, dir),
      Some("""WITH snap AS (
             |  SELECT o_orderkey AS key, o_totalprice AS val
             |  FROM orders WHERE o_orderkey % 2 = 1
             |  UNION ALL
             |  SELECT o_orderkey,
             |    floor((o_totalprice * 1.05) * 1e2 + 0.5) / 1e2
             |  FROM orders WHERE o_orderkey % 6 = 2)
             |SELECT key % 8 AS bucket, count(*) AS n,
             |  CAST(sum(CAST(floor(val * 1e2 + 0.5) AS BIGINT)) AS BIGINT) AS cents
             |FROM snap GROUP BY 1 ORDER BY 1""".stripMargin))
  )
}
