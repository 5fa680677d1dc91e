package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.sql.Timestamp

/** §2.10 streaming semantics under MemoryStream: watermark late-drop,
  * batch ≡ stream parity for tumbling windows (SURVEY §5.3 #5). */
class StreamingSpec extends SparkSpec {

  private val s0 = TestSession.spark
  import s0.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("watermark drops events later than 1h behind max seen ts") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val q = mem.toDF().toDF("ts", "et")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("et"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("et"), col("n"))
      .writeStream.format("memory").queryName("wm_test")
      .outputMode("append").start()
    // batch 1: advance event time to 03:30 → watermark (post-batch) 02:30
    mem.addData((ts("2024-01-01 00:10:00"), "a"), (ts("2024-01-01 03:30:00"), "a"))
    q.processAllAvailable()
    // batch 2: a 00:20 event is far behind the 02:30 watermark → dropped;
    // window [00:00,01:00) is already closed and emitted with n=1
    mem.addData((ts("2024-01-01 00:20:00"), "a"))
    q.processAllAvailable()
    val rows = spark.table("wm_test")
      .select(col("ws"), col("n")).as[(Timestamp, Long)].collect().toMap
    q.stop()
    assert(rows(ts("2024-01-01 00:00:00")) === 1L,
      "late event must NOT be counted into the closed window")
  }

  test("tumbling window: stream (complete mode) ≡ batch on same data") {
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      (ts("2024-01-01 00:10:00"), "a"), (ts("2024-01-01 00:50:00"), "b"),
      (ts("2024-01-01 01:10:00"), "a"), (ts("2024-01-01 02:59:59"), "a"))
    val mem = MemoryStream[(Timestamp, String)]
    val q = mem.toDF().toDF("ts", "et")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("et"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("et"), col("n"))
      .writeStream.format("memory").queryName("tumble_test")
      .outputMode("complete").start()
    mem.addData(data: _*)
    q.processAllAvailable()
    val streamed = spark.table("tumble_test")
      .as[(Timestamp, String, Long)].collect().toSet
    q.stop()
    val batch = data.toDF("ts", "et")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("et"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("et"), col("n"))
      .as[(Timestamp, String, Long)].collect().toSet
    assert(streamed === batch)
  }

  test("native session_window ≡ stream_session's declared lag-gap batch " +
      "form: the built-in session state produces the same sessions the " +
      "batch expressions define (completing the built-in-state matrix)") {
    implicit val sqlCtx = spark.sqlContext
    def sec(n: Long) = new Timestamp(n * 1000L)
    // Boundary-exercising gaps on ALL THREE sides of 1800s: 1799 merges,
    // 1801+ splits, and the EXACT-1800 point merges in BOTH forms —
    // session_window treats a next-start equal to the current end as
    // overlap (probed empirically), matching the lag form's strict
    // `> 1800` split. user 3 pins that boundary agreement.
    val data = Seq[(Long, Long, Timestamp)](
      (1L, 1L, sec(0L)), (1L, 2L, sec(600L)), (1L, 3L, sec(2399L)), // 1 session
      (1L, 4L, sec(6000L)),                                         // gap 3601
      (2L, 5L, sec(100L)),
      (3L, 6L, sec(0L)), (3L, 7L, sec(1800L)))                      // exact gap
    val mem = MemoryStream[(Long, Long, Timestamp)]
    val q = mem.toDF().toDF("user_id", "event_id", "ts")
      .withWatermark("ts", "0 seconds")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        min(unix_timestamp(col("ts"))).as("sess_start_sec"),
        (max(unix_timestamp(col("ts"))) - min(unix_timestamp(col("ts"))))
          .as("dur_sec"))
      .select(col("user_id"), col("sess_start_sec"), col("dur_sec"),
        col("n_events"))
      .writeStream.format("memory").queryName("sessw_test")
      .outputMode("append").start()
    mem.addData(data: _*)
    q.processAllAvailable()
    // Append mode emits a session once the watermark passes its close; a
    // far-future sentinel (second batch, so the watermark advances past
    // every real session) flushes them — the tws-timers drain discipline.
    mem.addData((999L, 99L, sec(1000000L)))
    q.processAllAvailable()
    val streamed = spark.table("sessw_test").where(col("user_id") < 999L)
      .as[(Long, Long, Long, Long)].collect().toSet
    q.stop()
    // The DECLARED batch form's expressions (stream_session) on the same
    // rows — lag-gap flag + running sum, sessions keyed by start second.
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("sec"), col("event_id"))
    val run = byUser.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    val batch = data.toDF("user_id", "event_id", "ts")
      .withColumn("sec", unix_timestamp(col("ts")))
      .withColumn("new_sess",
        when(col("sec") - lag(col("sec"), 1).over(byUser) > 1800L, 1L)
          .when(lag(col("sec"), 1).over(byUser).isNull, 1L)
          .otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess")).over(run))
      .groupBy("user_id", "sess_id")
      .agg(min("sec").as("sess_start_sec"),
        (max("sec") - min("sec")).as("dur_sec"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sess_start_sec"), col("dur_sec"),
        col("n_events"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed === batch,
      s"native session_window diverged from the declared lag-gap form:\n" +
        s"stream=$streamed\nbatch=$batch")
    assert(streamed === Set((1L, 0L, 2399L, 3L), (1L, 6000L, 0L, 1L),
      (2L, 100L, 0L, 1L), (3L, 0L, 1800L, 2L)))
  }

  test("stream_pctile: streamed DDSketch + estimate ≡ batch form on the fixture") {
    // Complete-mode streaming aggregation over the file-replay source must
    // drain to the SAME bucket counts the batch groupBy computes, so the
    // shared estimate tail yields row-identical monitors.
    val streamed = graft.streaming.StreamRunner.pctileMonitor(spark, sf)
      .collect().toSeq
    val batch = SparkEntry.queries("stream_pctile")(spark, sf)
      .collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch,
      "streaming sketch state diverges from the batch sketch")
  }

  test("stream_changefeed: the log-tailing streamed view ≡ the batch " +
      "change-feed fold, row-identically") {
    // Same base → append → rewrite history as table_incr_refresh, consumed
    // two different ways: table_incr_refresh folds changesAt(v) in a batch
    // loop, stream_changefeed folds the SAME signed deltas from a
    // Structured Streaming tail of `_log` across a restart. Both must land
    // on the identical per-bucket integers — a missed commit, a
    // double-counted checkpoint file, or a lost restart offset cannot
    // hash-match.
    val streamed = graft.streaming.StreamRunner.changefeedView(spark, sf)
      .collect().toSeq
    val batch = SparkEntry.queries("table_incr_refresh")(spark, sf)
      .collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch,
      "stream-maintained change-feed view diverges from the batch fold")
  }

  test("stream_index_maintain: the log-tailing streamed index ≡ the batch " +
      "frozen-centroid maintenance, row-identically") {
    // The same day-0 fit + delta-cohort insertion consumed two ways:
    // sim_index_maintain assigns and appends in one batch job,
    // stream_index_maintain tails the corpus table's _log across two
    // micro-batch passes and a restart. Both probe lanes must land on
    // identical rows — a missed arrival file, a double-indexed replay, or
    // a lost restart offset cannot match.
    val streamed = graft.streaming.StreamRunner.indexMaintainStream(spark, sf)
      .collect().toSeq
    val batch = SparkEntry.queries("sim_index_maintain")(spark, sf)
      .collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch,
      "stream-maintained ANN index diverges from the batch maintenance")
  }

  test("stream_dedup_maintain: the log-tailing streamed band index ≡ the " +
      "batch frozen-vocabulary construction, row-identically") {
    // The dedup twin of the stream_index_maintain pin. There is no batch
    // QDef with the frozen dictionary (dedup_index_maintain ranks the
    // FULL corpus vocab), so the batch side is built inline from the same
    // frozen-geometry primitives: dict fitted on the day-0 snapshot,
    // band rows for base + the whole day-1 cohort, probed by day 2 in
    // the same join shape. A missed arrival file, a double-signed
    // replay, a lost restart offset, or a dictionary drift between the
    // persisted and in-memory vocab cannot match row-for-row.
    import org.apache.spark.sql.functions._
    val m = graft.GraftConfig.DedupDeltaMod
    val r1 = graft.GraftConfig.DedupDeltaRem
    val r2 = graft.GraftConfig.DedupDelta2Rem
    val streamed = graft.streaming.StreamRunner.dedupMaintainStream(spark, sf)
      .collect().toSeq
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val day1 = col("doc_id") % m === r1
    val day2 = col("doc_id") % m === r2
    val fdict = graft.operators.Dedup.dictFreqOf(docs.where(!day1 && !day2))
      .localCheckpoint()
    val index = graft.operators.Dedup.bandRowsFrozen(docs.where(!day2), fdict)
    val delta = graft.operators.Dedup.bandRowsFrozen(docs.where(day2), fdict)
      .select(col("doc_id").as("delta_id"),
        col("band"), col("sig_a"), col("sig_b"))
    val hits = index.join(delta.hint("merge"), Seq("band", "sig_a", "sig_b"))
      .groupBy("delta_id").agg(min(col("doc_id")).as("dup_of"))
    val batch = docs.where(day2)
      .select(col("doc_id"))
      .join(broadcast(hits.select(col("delta_id").as("doc_id"),
        col("dup_of"))), Seq("doc_id"), "left")
      .select(col("doc_id"), col("dup_of"),
        when(col("dup_of").isNull, lit("novel"))
          .otherwise(lit("dup_of_base")).as("status"))
      .orderBy("doc_id")
      .collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch,
      "stream-maintained band index diverges from the batch construction")
  }

  test("stream_enrich: stream-static join ≡ batch join on the fixture") {
    val streamed = graft.streaming.StreamRunner.enrichedCounts(spark, sf)
      .collect().toSeq
    val batch = SparkEntry.queries("stream_enrich")(spark, sf)
      .collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch,
      "stream-static enrichment diverges from the batch join")
  }

  test("file-source checkpoint: a restarted query ingests ONLY new files (exactly-once)") {
    // The incremental-ingest contract a 100 TB lake relies on: the file
    // source's checkpoint records processed files, so a restart resumes
    // from the delta instead of re-reading history.
    def tmp(prefix: String): String = {
      val d = java.nio.file.Files.createTempDirectory(prefix)
      d.toFile.deleteOnExit(); d.toString
    }
    // Raw-schema read (no ts normalization needed — only event_id is
    // selected); the legacy conf keeps a NANOS-generation fixture readable.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = tmp("graft_ckpt_src"); val ckpt = tmp("graft_ckpt_state")
    val out = tmp("graft_ckpt_out")
    val fixture = java.nio.file.Paths.get(s"$sf/events.parquet")
    java.nio.file.Files.copy(fixture,
      java.nio.file.Paths.get(s"$src/a.parquet"))
    val schema = spark.read.parquet(src).schema
    val n = spark.read.parquet(src).count()
    // Sink must be fault-tolerant for recovery (memory sink refuses a
    // reused checkpoint); the parquet sink is, and accumulates appends.
    def drain(): Long = {
      val q = spark.readStream.schema(schema).parquet(src)
        .select(col("event_id"))
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.read.parquet(out).count()
    }
    assert(drain() === n, "first run must ingest the seed file")
    // New file arrives; a restarted query on the SAME checkpoint must
    // process only it — re-ingesting history would land 3n in the sink.
    java.nio.file.Files.copy(fixture,
      java.nio.file.Paths.get(s"$src/b.parquet"))
    assert(drain() === 2 * n,
      "restarted query must ingest exactly the new file, not re-read history")
  }

  test("flatMapGroupsWithState: gap state carries across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import graft.streaming.StreamRunner.UserState
    val mem = MemoryStream[(Long, Long, Long)] // (user_id, sec, event_id)
    val fold = (uid: Long, rows: Iterator[(Long, Long, Long)],
        state: GroupState[UserState]) => {
      var st = state.getOption.getOrElse(UserState(0L, Long.MinValue, -1L))
      rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, sec, _) =>
        if (st.n > 0L && sec - st.lastSec > st.maxGap)
          st = st.copy(maxGap = sec - st.lastSec)
        st = st.copy(n = st.n + 1L, lastSec = sec)
      }
      state.update(st)
      Iterator.single(
        (uid, st.n, if (st.maxGap >= 0L) Some(st.maxGap) else None, st.lastSec))
    }
    val q = mem.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(fold)
      .toDF("user_id", "n_events", "max_gap_sec", "last_sec")
      .writeStream.format("memory").queryName("cs_test")
      .outputMode("update").start()
    mem.addData((1L, 100L, 1L), (1L, 160L, 2L)) // batch 1: gap 60
    q.processAllAvailable()
    mem.addData((1L, 460L, 3L)) // batch 2: gap 300 spans the batch boundary
    q.processAllAvailable()
    val last = spark.table("cs_test").where(col("n_events") === 3L)
      .select("user_id", "max_gap_sec", "last_sec")
      .as[(Long, Option[Long], Long)].collect()
    q.stop()
    assert(last.toSeq === Seq((1L, Some(300L), 460L)),
      "state (lastSec) must persist across batches to see the 300s gap")
  }

  test("transformWithState ≡ flatMapGroupsWithState: the two custom-state " +
      "APIs produce row-identical final states on the fixture") {
    // The migration guarantee: the declared tws port must reproduce the
    // old API's output exactly — both fold the same event-time sort into
    // the same per-user state, differing only in the state plumbing
    // (named ValueState on RocksDB vs a single GroupState blob).
    val oldApi = SparkEntry.queries("stream_custom_state")(spark, sf)
      .as[(Long, Long, Option[Long], Long)].collect().toSet
    val newApi = SparkEntry.queries("stream_custom_state_tws")(spark, sf)
      .as[(Long, Long, Option[Long], Long)].collect().toSet
    assert(newApi === oldApi,
      "transformWithState port diverged from the flatMapGroupsWithState original")
  }

  test("stream_tws_timers: event-time timers close exactly the sessions the " +
      "final watermark reaches, and both closure paths fire") {
    val rows = SparkEntry.queries("stream_tws_timers")(spark, sf)
      .select("closed_by").as[String].collect()
    val byKind = rows.groupBy(identity).view.mapValues(_.length).toMap
    // Gap closures (a successor event ended the session) must dominate,
    // and at least one trailing session must have been closed by its
    // registered event-time timer in the post-drain no-data batch — if
    // that count is zero, timers never fired and the operator silently
    // degenerated to plain gap sessionization.
    assert(byKind.getOrElse("gap", 0) > 0, "no gap-closed sessions")
    assert(byKind.getOrElse("timer", 0) > 0, "no timer-closed sessions — timers never fired")
    assert(byKind.keySet === Set("gap", "timer"))
  }

  test("TTL'd keyed state wires end-to-end in its legal mode " +
      "(ProcessingTime): inert-TTL counts equal the batch fold") {
    // TTL is processing-time-only (the handle REJECTS TTLConfig under
    // TimeMode.EventTime), so the declared inventory keeps wall-clock
    // expiry out of oracle-checked outputs; this run proves the TTL'd
    // state path works where it is legal. 1h cannot elapse inside the
    // drain, so the streamed counts must equal the plain batch counts.
    val streamed = graft.streaming.StreamRunner.ttlStateProbe(spark, sf)
      .as[(Long, Long)].collect().toSet
    val batch = graft.Tables.events(spark, sf)
      .groupBy(col("user_id").cast("long").as("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .as[(Long, Long)].collect().toSet
    assert(streamed === batch,
      "TTL'd (inert) streamed counts diverged from the batch fold")
  }

  test("scan_v2_stream: the connector's micro-batch tail ≡ its batch scan " +
      "over the same id window, row-identically") {
    // Raw-row parity (stronger than the declared rollup): stream the
    // catalog through the MicroBatchStream with a small arrive so the
    // drain spans multiple batches, and compare the full row set against
    // the batch read — same window, same slice geometry.
    val qn = "v2s_parity"
    val q = spark.readStream.format("graft.sources.FrameCatalogSource")
      .option("frames", "10000").option("slice", "1024").option("arrive", "3000")
      .load()
      .writeStream.format("memory").queryName(qn).outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.recentProgress.count(_.numInputRows > 0L) === 4,
      "10000 ids at arrive=3000 must drain in 4 micro-batches")
    val streamed = spark.table(qn).collect().map(_.toString).sorted.toSeq
    val batch = spark.read.format("graft.sources.FrameCatalogSource")
      .option("frames", "10000").option("slice", "1024").load()
      .collect().map(_.toString).sorted.toSeq
    assert(streamed === batch, "micro-batch tail diverged from the batch scan")
  }

  test("scan_v2_stream: a restarted tail resumes from the checkpointed id " +
      "offset — already-delivered frames are never replayed") {
    // The memory sink cannot recover from a checkpoint; foreachBatch →
    // parquet is the fault-tolerant sink shape, with a fresh target per
    // pass so each pass's deliveries are observable in isolation.
    val ckpt = java.nio.file.Files.createTempDirectory("graft_v2s_restart_").toString
    def tail(frames: Long, target: String) = {
      val q = spark.readStream.format("graft.sources.FrameCatalogSource")
        .option("frames", frames.toString).option("slice", "1024")
        .option("arrive", "2048")
        .load()
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.write.mode("append").parquet(target)
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val out1 = java.nio.file.Files.createTempDirectory("graft_v2s_out1_").toString
    tail(4096L, out1) // pass 1 drains ids [0, 4096)
    assert(spark.read.parquet(out1).count() === 4096L)
    // The catalog GROWS (frames 4096 → 6144); the restarted query must
    // deliver exactly the new ids, resuming from the checkpointed offset.
    val out2 = java.nio.file.Files.createTempDirectory("graft_v2s_out2_").toString
    tail(6144L, out2)
    val delivered = spark.read.parquet(out2).select("frame_id")
      .as[Long].collect().sorted.toSeq
    assert(delivered === (4096L until 6144L).toSeq,
      s"restart must resume at id 4096 and deliver exactly the 2048 new ids, " +
        s"got ${delivered.size} rows [${delivered.headOption}..${delivered.lastOption}]")
  }

  test("RocksDB changelog checkpointing: a restarted transformWithState " +
      "query RESUMES its state from changelog files — O(changes) per " +
      "commit, the production checkpoint-cost lever at stream scale") {
    import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TTLConfig}
    def tmp(p: String): String = {
      val d = java.nio.file.Files.createTempDirectory(p)
      d.toFile.deleteOnExit(); d.toString
    }
    val src = tmp("graft_clog_src"); val ckpt = tmp("graft_clog_ckpt")
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val clogKey =
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    val partsKey = "spark.sql.shuffle.partitions"
    val prevProv = spark.conf.get(provKey)
    val prevParts = spark.conf.get(partsKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(clogKey, "true")
    spark.conf.set(partsKey, "4")
    try {
      // Running per-user event count in a named ValueState; Update mode
      // emits the refreshed count for the users each batch touches.
      class CountProcessor extends StatefulProcessor[Long, (Long, Long), (Long, Long)] {
        @transient private var n: org.apache.spark.sql.streaming.ValueState[Long] = _
        override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
          n = getHandle.getValueState[Long]("n",
            org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
        override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
            timers: org.apache.spark.sql.streaming.TimerValues): Iterator[(Long, Long)] = {
          val total = (if (n.exists()) n.get() else 0L) + rows.size
          n.update(total)
          Iterator.single((key, total))
        }
      }
      def stage(name: String, rows: Seq[(Long, Long)]): Unit = {
        val d = tmp("graft_clog_stage")
        rows.toDF("user_id", "event_id").repartition(1).write
          .mode("overwrite").parquet(d)
        val part = java.nio.file.Files.list(java.nio.file.Paths.get(d))
          .toArray.map(_.toString)
          .filter(p => p.endsWith(".parquet")
            && !java.nio.file.Paths.get(p).getFileName.toString.startsWith("."))
          .head
        java.nio.file.Files.copy(java.nio.file.Paths.get(part),
          java.nio.file.Paths.get(s"$src/$name.parquet")): Unit
      }
      def drain(out: String): Unit = {
        val schema = spark.read.parquet(src).schema
        val q = spark.readStream.schema(schema).parquet(src)
          .as[(Long, Long)]
          .groupByKey(_._1)
          .transformWithState(new CountProcessor, TimeMode.None(), OutputMode.Update())
          .toDF("user_id", "n_events")
          .writeStream
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            b.write.mode("append").parquet(out)
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      stage("a", Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L), (2L, 21L)))
      val out1 = tmp("graft_clog_out1"); drain(out1)
      val pass1 = spark.read.parquet(out1).as[(Long, Long)].collect().toMap
      assert(pass1 === Map(1L -> 3L, 2L -> 2L))
      // The lever must actually be ENGAGED, not silently ignored: with
      // changelog checkpointing on, RocksDB commits write .changelog
      // files under the state dir (full .zip snapshots only at the
      // maintenance cadence) — a conf typo would leave zero of them.
      def stateFiles(suffix: String): Int = {
        val d = java.nio.file.Paths.get(ckpt, "state")
        if (!java.nio.file.Files.isDirectory(d)) 0
        else {
          import scala.jdk.CollectionConverters._
          val s = java.nio.file.Files.walk(d)
          try s.iterator().asScala.count(_.getFileName.toString.endsWith(suffix))
          finally s.close()
        }
      }
      assert(stateFiles(".changelog") > 0,
        "no .changelog files under the checkpoint — changelog checkpointing never engaged")
      // New data lands; the restarted query on the SAME checkpoint must
      // RESUME user 1's count from the changelog-recovered state (5, not
      // 2) and start user 3 fresh. User 2 sees no update in pass 2.
      stage("b", Seq((1L, 13L), (1L, 14L), (3L, 30L)))
      val out2 = tmp("graft_clog_out2"); drain(out2)
      val pass2 = spark.read.parquet(out2).as[(Long, Long)].collect().toMap
      assert(pass2 === Map(1L -> 5L, 3L -> 1L),
        s"restarted state did not resume from the changelog checkpoint: $pass2")
    } finally {
      spark.conf.set(provKey, prevProv)
      spark.conf.unset(clogKey)
      spark.conf.set(partsKey, prevParts)
    }
  }

  test("stream_foreachbatch: upserted parquet ≡ batch aggregate on same fixture") {
    // The declared query runs a REAL streaming job (foreachBatch → parquet
    // upsert → read-back); its result must equal the plain batch aggregate
    // over the same events fixture — the exactly-once idempotent-sink claim.
    val streamed = SparkEntry.queries("stream_foreachbatch")(spark, sf)
      .as[(String, Long)].collect().toSet
    val batch = Tables.events(spark, sf)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toSet
    assert(streamed === batch, "foreachBatch upsert must reproduce the batch aggregate")
  }

  test("stream-stream interval join ≡ batch join on same data") {
    implicit val sqlCtx = spark.sqlContext
    // (user, sec-as-ts, id): purchases and views; views count when within
    // [p-1h, p] for the same user — the stream_join condition.
    val purchases = Seq((1L, "2024-01-01 02:00:00", 10L), (2L, "2024-01-01 05:00:00", 11L))
    val views = Seq(
      (1L, "2024-01-01 01:10:00", 20L), // within the hour → pairs with 10
      (1L, "2024-01-01 00:30:00", 21L), // too early → no pair
      (2L, "2024-01-01 05:00:00", 22L), // same instant → pairs with 11
      (2L, "2024-01-01 06:00:00", 23L)) // after purchase → no pair
    def df(rows: Seq[(Long, String, Long)], pfx: String) =
      rows.toDF("user_id", "s", pfx + "_id")
        .select(col("user_id"), col("s").cast("timestamp").as(pfx + "_ts"), col(pfx + "_id"))
    val pMem = MemoryStream[(Long, String, Long)]
    val vMem = MemoryStream[(Long, String, Long)]
    val pS = pMem.toDF().toDF("user_id", "s", "p_id")
      .select(col("user_id"), col("s").cast("timestamp").as("p_ts"), col("p_id"))
      .withWatermark("p_ts", "2 hours")
    val vS = vMem.toDF().toDF("user_id", "s", "v_id")
      .select(col("user_id").as("v_user"), col("s").cast("timestamp").as("v_ts"), col("v_id"))
      .withWatermark("v_ts", "2 hours")
    val q = pS.join(vS,
        col("user_id") === col("v_user") &&
          col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("v_ts") <= col("p_ts"))
      .select("p_id", "v_id")
      .writeStream.format("memory").queryName("ssj_test")
      .outputMode("append").start()
    pMem.addData(purchases: _*)
    vMem.addData(views: _*)
    q.processAllAvailable()
    val streamed = spark.table("ssj_test").as[(Long, Long)].collect().toSet
    q.stop()
    val batch = df(purchases, "p").join(df(views, "v").withColumnRenamed("user_id", "v_user"),
        col("user_id") === col("v_user") &&
          col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("v_ts") <= col("p_ts"))
      .select("p_id", "v_id").as[(Long, Long)].collect().toSet
    assert(streamed === batch)
    assert(streamed === Set((10L, 20L), (11L, 22L)))
  }

  test("stream_transient_watermark: an evicted candidate resurrects from the " +
      "curve table with its pre-eviction history intact") {
    // The streamed-≡-batch and evict-set laws are require'd inside the
    // run; this pins the eviction + resurrection cycle's observable
    // outcome: the mid-stream-evicted candidate (7,30) ends with BOTH its
    // pre-eviction epoch and its late epoch, classified from the full
    // curve, while the drain-evicted candidate (28,3) stays a single.
    val out = SparkEntry.queries("stream_transient_watermark")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    val d = out((7L, 30L))
    assert(d.getLong(2) === 2L, "resurrected candidate must count 2 epochs")
    assert(d.getLong(3) === 2L, "first_frame must be the PRE-eviction epoch")
    assert(d.getString(7) === "rising")
    assert(d.getBoolean(8) && d.getBoolean(9), "evicted + resurrected flags")
    val e = out((28L, 3L))
    assert(e.getLong(2) === 1L && e.getBoolean(8) && !e.getBoolean(9),
      "the drain-evicted candidate stays an evicted, un-resurrected single")
  }

  test("dropDuplicatesWithinWatermark dedups within the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val q = mem.toDF().toDF("ts", "event_id")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    mem.addData((ts("2024-01-01 00:00:00"), 1L), (ts("2024-01-01 00:05:00"), 1L),
      (ts("2024-01-01 00:10:00"), 2L))
    q.processAllAvailable()
    val n = spark.table("dedup_test").count()
    q.stop()
    assert(n === 2L, "duplicate event_id within watermark must collapse")
  }
}
