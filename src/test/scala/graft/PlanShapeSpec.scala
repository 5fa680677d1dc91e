package graft

/** Physical-plan regression checks: the scale-design claims in PLANS.md as
  * executable assertions. A refactor that silently degrades a plan (nested
  * loop where an equi-join was designed, lost pushdown, lost partial
  * aggregation, lost broadcast) fails here, not at 100 TB. */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("join_sky: shuffled/broadcast equi-join, never a nested loop") {
    val p = plan("join_sky")
    assert(!p.contains("BroadcastNestedLoopJoin"), "sky cross-match degraded to NLJ")
    assert(!p.contains("CartesianProduct"), "sky cross-match degraded to cartesian")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")
      || p.contains("ShuffledHashJoin"), "no equi-join operator in the plan")
  }

  test("join_range: bucket-key idiom stays an equi-join") {
    val p = plan("join_range")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("scan_prune: predicate and projection reach the parquet scan") {
    val p = plan("scan_prune")
    assert(p.contains("PushedFilters") && p.contains("LessThan(l_quantity"),
      "quantity predicate not pushed to the scan")
    assert(!p.contains("l_extendedprice"), "column pruning lost (unneeded column read)")
  }

  test("dedup_minhash: dictionary attaches via BroadcastHashJoin (no map-column scan)") {
    val p = plan("dedup_minhash")
    assert(p.contains("BroadcastHashJoin"), "dict join not broadcast")
    assert(!p.contains("map_from_arrays"), "map-column dictionary resurfaced")
  }

  test("agg_hash / lc_periods: map-side partial aggregation before the shuffle") {
    assert(plan("agg_hash").contains("partial_sum"), "Q1 lost partial aggregation")
    assert(plan("lc_periods").contains("partial_"),
      "period grid fan-out no longer collapses map-side")
  }

  test("join_broadcast: dimensions ship as broadcasts, fact side never exchanges") {
    val p = plan("join_broadcast")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("join_dpp: fact scan carries a dynamic-pruning subquery from the dim filter") {
    val p = plan("join_dpp")
    assert(p.contains("dynamicpruning"),
      "dynamic partition pruning not planned — fact scans all partitions")
  }

  test("sink_partitioned: read-back scan carries PartitionFilters") {
    val p = plan("sink_partitioned")
    assert(p.contains("PartitionFilters") &&
      "o_orderstatus#\\d+ = F".r.findFirstIn(p).isDefined,
      "partition pruning lost on the partitioned read-back")
  }

  test("join_interval: bucketized overlap join stays an equi-join") {
    val p = plan("join_interval")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "interval-overlap join degraded to a non-equi plan")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")
      || p.contains("ShuffledHashJoin"), "no equi-join operator in the plan")
  }

  test("lc_lombscargle: grid fan-out collapses map-side; argmax filter becomes a group limit") {
    val p = plan("lc_lombscargle")
    assert(p.contains("partial_"), "periodogram grid lost partial aggregation")
    assert(p.contains("WindowGroupLimit"),
      "rn=1 argmax no longer plans as a window group limit")
  }

  test("lc_gls: weighted moment sums collapse map-side; argmax filter " +
      "becomes a group limit; no self-join anywhere") {
    val p = plan("lc_gls")
    assert(p.contains("partial_"), "GLS moment sums lost partial aggregation")
    assert(p.contains("WindowGroupLimit"),
      "rn=1 argmax no longer plans as a window group limit")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "the one-pass weighted-moment chain grew a join")
  }

  test("lc_harmonics: trig moments collapse map-side; the best-period " +
      "table broadcasts; the one-pass chain never grows a shuffled join") {
    val p = plan("lc_harmonics")
    assert(p.contains("partial_"),
      "harmonic moment sums lost partial aggregation")
    assert(p.contains("BroadcastHashJoin"),
      "the best-period table no longer broadcasts onto the series")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "the one-pass trig-moment chain grew a shuffled join")
  }

  test("lc_transit_vet: the five vet lanes ride ONE object-key " +
      "aggregation with the detection broadcast back; never a cartesian") {
    val p = plan("lc_transit_vet")
    assert(p.contains("partial_"), "vet lanes lost partial aggregation")
    assert(p.contains("BroadcastHashJoin"),
      "the detection no longer broadcasts onto the series")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "the vet chain degraded to a non-equi plan")
  }

  test("frame_astrometry: triangles meet only within their invariant " +
      "class — equi-joins end to end, never all-pairs across catalogs") {
    plan("frame_astrometry") // runs the QDef, which records the pre-
    // checkpoint voting plan (the declared output is an ExistingRDD scan)
    val p = graft.operators.FrameOps.lastAstrometryPlan
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")
      || p.contains("ShuffledHashJoin"),
      "no equi-join operator in the triangle-matching plan")
    assert(!p.contains("CartesianProduct"),
      "triangle matching degraded to a cartesian product")
    assert(p.contains("partial_"), "transform votes lost map-side partials")
  }

  test("sim_graph_ann: beam rounds stay equi-joins; frontier expansion " +
      "never goes cartesian against the corpus") {
    plan("sim_graph_ann") // runs the QDef, which records the pre-
    // checkpoint beam plan (the declared output is an ExistingRDD scan)
    val p = graft.operators.Similarity.lastGraphAnnPlan
    assert(!p.contains("CartesianProduct"),
      "a beam stage degraded to a cartesian product")
    assert(p.contains("WindowGroupLimit"),
      "top-B rank filters no longer plan as window group limits")
    assert(p.contains("BroadcastHashJoin"),
      "probe attachment lost its broadcast")
  }

  test("frame_forced_photometry: candidate probe stays a bounded equi-join " +
      "with map-side aperture partials — never pixels × candidates") {
    plan("frame_forced_photometry") // runs the QDef, which records the
    // pre-checkpoint forced-probe plan (declared output is an ExistingRDD)
    val p = graft.operators.FrameOps.lastForcedPhotPlan
    // The scene GENERATOR legitimately contains a range×range cartesian
    // (pixels explode from frame metadata — fixture-only; at archive
    // scale pixels stream from files), so a blanket no-cartesian assert
    // would pin the fixture, not the operator. Pin the probe itself: the
    // candidate fan-out must meet the residual tile via EQUI keys on the
    // cell arithmetic, and the aperture sums must collapse map-side.
    assert(
      """(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \[\(cx#\d+L? \+ dcx"""
        .r.findFirstIn(p).isDefined,
      "candidate→residual probe is no longer an equi-join on the cell keys")
    assert(
      """(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \[cx#\d+L?, cy#\d+L?, frame_id#\d+L?\]"""
        .r.findFirstIn(p).isDefined,
      "forced↔detected association is no longer an equi-join on (pos, epoch)")
    assert(p.contains("partial_sum"), "aperture sums lost map-side partials")
  }

  test("win_sessionize: both window passes share one user_id shuffle") {
    val p = plan("win_sessionize")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1,
      s"sessionization should shuffle once on user_id, saw $exchanges hash exchanges")
  }

  test("dedup_decontam: eval grams attach via BroadcastHashJoin, never all-pairs") {
    val p = plan("dedup_decontam")
    assert(p.contains("BroadcastHashJoin"), "eval-gram side not broadcast")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "decontamination degraded to an all-pairs plan")
  }

  test("table_merge: one co-partitioned shuffle per side, full-outer stays SMJ") {
    val p = plan("table_merge")
    assert(p.contains("SortMergeJoin") && p.contains("FullOuter"),
      "merge no longer plans as a full-outer sort-merge join")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 2,
      s"merge should shuffle each side once on the key, saw $exchanges hash exchanges")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("sample_temperature: corpus attaches thresholds via broadcast, never shuffles") {
    val p = plan("sample_temperature")
    assert(p.contains("BroadcastHashJoin"),
      "per-lang threshold table not broadcast back to the corpus")
    // the only hash exchanges allowed are the #languages-row count aggs
    // (the counts subtree appears under both the threshold and the n_ref
    // branches); the corpus side itself must never hash-partition
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 2,
      s"corpus-side shuffle crept into temperature sampling: $exchanges hash exchanges")
  }

  test("table_scd2: change-detect and interval windows share one user_id shuffle") {
    val p = plan("table_scd2")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1,
      s"SCD2 should shuffle once on user_id for both window passes, saw $exchanges")
  }

  test("agg_incremental: state merge reuses the two state shuffles, no extra exchange") {
    val p = plan("agg_incremental")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "incremental states lost map-side partial aggregation")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "state merge degraded to a non-equi join")
    // base-state agg + delta-state agg = 2; the full-outer merge must ride
    // their user_id partitioning rather than re-shuffle either side
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 2,
      s"full-outer state merge stopped reusing the state partitioning: $exchanges hash exchanges")
  }

  test("ts_fillgaps: grid join stays an equi-join, never a calendar cross join") {
    val p = plan("ts_fillgaps")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "gap-fill grid degraded to an all-pairs plan")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), "no equi-join operator in the plan")
  }

  test("ts_interp: both direction windows share one sort, no window exchange") {
    val p = plan("ts_interp")
    assert(!p.contains("CartesianProduct"), "interp grid degraded to all-pairs")
    // the grid's user_id aggregation already partitions for the window
    // stack: the preceding- and following-frame Window nodes must ride it
    // (2 hash exchanges = grid agg + daily agg; windows add none)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 3,
      s"window stack stopped reusing the grid partitioning: $exchanges hash exchanges")
    assert("Window".r.findAllIn(p).length >= 2, "carrier windows missing")
  }

  test("sample_split: assignment is a projection — no join, two tiny exchanges") {
    val p = plan("sample_split")
    assert(!p.contains("Join"), "hash split assignment should not join")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 2,
      s"split contingency table should shuffle at most twice (agg + share window), saw $exchanges")
  }

  test("agg_drift: corpus counted once (checkpointed), totals broadcast back") {
    val p = plan("agg_drift")
    assert(p.contains("BroadcastHashJoin"),
      "per-type totals not broadcast back onto the bucket counts")
    // the (type, bucket) count table is localCheckpoint'ed: the corpus
    // scan+count subtree must appear once, not once per branch
    assert("Scan ExistingRDD".r.findAllIn(p).length >= 1,
      "bucket-count checkpoint missing — corpus would be re-scanned per branch")
    assert(!p.contains("parquet"), "corpus scan leaked past the checkpoint")
  }

  test("table_compact: metadata-only plan — no join, window rides the file agg") {
    val p = plan("table_compact")
    assert(!p.contains("Join"), "compaction planner should never join")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 3,
      s"file-listing planner grew unexpected shuffles: $exchanges hash exchanges")
  }

  test("graph_triangles: wedge and closing passes stay equi-joins") {
    val p = plan("graph_triangles")
    assert(!p.contains("CartesianProduct"),
      "triangle enumeration degraded to an all-pairs plan")
  }

  test("graph_kcore: core degrees scan the checkpoint with partial aggregation") {
    val p = plan("graph_kcore")
    assert(p.contains("Scan ExistingRDD"),
      "core degrees should scan the final localCheckpoint, not replay the peel rounds")
    assert(p.contains("partial_count"),
      "within-core degree count lost map-side partial aggregation")
  }

  test("dedup_incremental: delta bands broadcast; base signature stream never re-shuffles") {
    val p = plan("dedup_incremental")
    assert(p.contains("BroadcastHashJoin"),
      "delta band probe not broadcast — base side would shuffle on the band key")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "base signature stream shuffled into a sort-merge/all-pairs join")
  }

  test("dedup_index_probe: standing index streams from disk bucket-aligned — zero base-side Exchange") {
    val p = plan("dedup_index_probe")
    assert(p.contains("SortMergeJoin"),
      "probe should be the at-scale merge join against the saved index")
    assert(p.contains("Bucketed: true"),
      "index scan not bucket-aligned — the base side would re-shuffle on the band key")
    // The index table is the SMJ's streamed (left) side: every line between
    // the join and its scan belongs to the base branch, and none of them may
    // be an Exchange (re-shuffle) or a Window (signature recompute) — the
    // whole point of the standing index is that the base side's cost is a
    // bucket-aligned parquet scan.
    val lines = p.linesIterator.toSeq
    val smj = lines.indexWhere(_.contains("SortMergeJoin"))
    val idx = lines.indexWhere(_.contains("graft_band_index"))
    assert(smj >= 0 && idx > smj, "index scan should sit under the probe SMJ")
    assert(!lines.slice(smj + 1, idx).exists(l =>
      l.contains("Exchange") || l.contains("Window")),
      "base side of the probe gained an Exchange/recompute")
  }

  test("dedup_index_maintain: appended index still streams bucket-aligned — zero index-side Exchange") {
    val p = plan("dedup_index_maintain")
    assert(p.contains("SortMergeJoin"),
      "probe should be the at-scale merge join against the maintained index")
    assert(p.contains("Bucketed: true"),
      "index scan not bucket-aligned after the append — the index side would re-shuffle")
    val lines = p.linesIterator.toSeq
    val smj = lines.indexWhere(_.contains("SortMergeJoin"))
    val idx = lines.indexWhere(_.contains("graft_band_index_m"))
    assert(smj >= 0 && idx > smj, "index scan should sit under the probe SMJ")
    assert(!lines.slice(smj + 1, idx).exists(l =>
      l.contains("Exchange") || l.contains("Window")),
      "index side of the probe gained an Exchange/recompute after the append")
  }

  test("sim_index_probe: standing ANN index streams from disk bucket-aligned — zero index-side Exchange") {
    val p = plan("sim_index_probe")
    assert(p.contains("SortMergeJoin"),
      "probe should be the at-scale merge join against the saved IVF index")
    assert(p.contains("Bucketed: true"),
      "index scan not bucket-aligned — the corpus side would re-shuffle on cell")
    // The index table is the SMJ's streamed (left) side, so every line
    // between the join and its scan belongs to the index branch — none may
    // be an Exchange (re-shuffle) or a HashAggregate (the Lloyd fit / cell
    // assignment recomputed at query time): the whole point of the
    // persisted index is that the corpus side's cost is a bucket-aligned
    // parquet scan of pre-assigned rows.
    val lines = p.linesIterator.toSeq
    val smj = lines.indexWhere(_.contains("SortMergeJoin"))
    val idx = lines.indexWhere(_.contains("graft_ivf_index"))
    assert(smj >= 0 && idx > smj, "index scan should sit under the probe SMJ")
    assert(!lines.slice(smj + 1, idx).exists(l =>
      l.contains("Exchange") || l.contains("HashAggregate")),
      "index side of the probe gained an Exchange/recompute")
  }

  test("sim_index_maintain: both result lanes keep the bucket-aligned index read") {
    val p = plan("sim_index_maintain")
    assert(p.contains("Bucketed: true"),
      "index scan not bucket-aligned after the append")
    // Two lanes (top-3 'all' + best 'fresh' arrival) union two merge joins;
    // each join's left child is the index scan, so for EVERY index scan the
    // stretch back to its own SMJ must be Exchange/recompute-free. A Filter
    // in that stretch is expected for the fresh lane (the % predicate is
    // pushed below the join onto the index side — pruning before the join
    // is the right plan).
    val lines = p.linesIterator.toSeq
    val scans = lines.zipWithIndex
      .filter(_._1.contains("graft_ivf_index_m")).map(_._2)
    assert(scans.nonEmpty, "no maintained-index scan in the plan")
    scans.foreach { i =>
      val smj = lines.lastIndexWhere(_.contains("SortMergeJoin"), i)
      assert(smj >= 0, "index scan not under a merge join")
      assert(!lines.slice(smj + 1, i).exists(l =>
        l.contains("Exchange") || l.contains("HashAggregate")),
        "index side of a lane's probe gained an Exchange/recompute")
    }
  }

  test("sim_refine: shortlist broadcasts into the corpus fetch — raw vectors never shuffle") {
    val p = plan("sim_refine")
    // The refine fetch must attach the (probes × shortlist)-row candidate
    // set to the corpus scan as a broadcast: a sort-merge join here would
    // shuffle the full raw-vector corpus to retrieve ~50 rows.
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 4,
      "shortlist/probe attach lost its broadcast — corpus raw vectors would shuffle")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "refine fetch degraded to a shuffled/all-pairs join")
  }

  test("table_stats: one corpus pass — single scan, partial aggs, no join") {
    val p = plan("table_stats")
    assert(!p.contains("Join"), "stats computation should never join")
    assert("Scan parquet".r.findAllIn(p).length == 1,
      "stats should make exactly ONE pass over the table")
    assert(p.contains("Expand"),
      "multi-column exact NDV should plan as Expand (one stream per distinct column)")
    assert(p.contains("partial_count") || p.contains("partial_min"),
      "stats aggregation lost map-side partials")
  }

  test("win_funnel: stage chain stays equi-joins with no nested loop") {
    val p = plan("win_funnel")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "funnel stage join degraded to an all-pairs plan")
  }

  test("dedup_editdist: prefix blocking stays an equi-join") {
    val p = plan("dedup_editdist")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "edit-distance dedup degraded to an all-pairs plan")
  }

  test("graph_pagerank: iteration output is lineage-truncated, not an inlined 3-round plan") {
    val p = plan("graph_pagerank")
    assert(p.contains("Scan ExistingRDD"),
      "final rank vector should scan the localCheckpoint, not replay the iterations")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "iteration joins leaked into the final plan — checkpoint lost")
  }

  test("join_bloom: bitmap lookups broadcast; no nested loop anywhere") {
    val p = plan("join_bloom")
    assert(p.contains("BroadcastHashJoin"), "bloom word-lookup joins not broadcast")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "bloom probe degraded to a non-equi plan")
  }

  test("text_heavyhitters: sketch cells attach via broadcast; occurrence stream aggregates partially") {
    val p = plan("text_heavyhitters")
    assert(p.contains("BroadcastHashJoin"), "cell join not broadcast")
    assert(p.contains("partial_count"), "sketch update lost partial aggregation")
  }

  test("text_chunk: chunking is narrow — no exchange before the output sort") {
    val p = plan("text_chunk")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 0,
      s"chunking should not hash-shuffle, saw $exchanges hash exchanges")
  }

  test("lc_ensemble: per-day zero-point table attaches via broadcast") {
    val p = plan("lc_ensemble")
    assert(p.contains("BroadcastHashJoin"), "zero-point join not broadcast")
  }

  test("sim_multiprobe: bucket join stays equi with broadcast probes; no nested loop") {
    val p = plan("sim_multiprobe")
    assert(p.contains("BroadcastHashJoin"), "exploded probe side not broadcast")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "multi-probe candidate generation degraded to an all-pairs plan")
  }

  test("sim_pq: ADC scoring joins broadcast tables; codes aggregate partially") {
    val p = plan("sim_pq")
    assert(p.contains("BroadcastHashJoin"), "distance-table join not broadcast")
    assert(p.contains("partial_min") || p.contains("partial_sum"),
      "code assignment / ADC sum lost partial aggregation")
    assert(!p.contains("CartesianProduct"), "PQ scoring degraded to a cartesian")
  }

  test("sim_ivfpq: ADC scores codes via broadcasts with partial aggregation; raw vectors never pair") {
    val p = plan("sim_ivfpq")
    // codebook attach + ADC-table attach + residual centroid attach must
    // all be broadcasts onto the streamed corpus side
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 3,
      "PQ codebook / ADC / centroid tables no longer broadcast")
    assert(p.contains("partial_min") || p.contains("partial_sum"),
      "code argmin / ADC sum lost partial aggregation")
    assert(!p.contains("CartesianProduct"),
      "IVFPQ scoring degraded to a cartesian — cell equi-join lost")
  }

  test("table_histogram: cumsum window runs over the value aggregate, not corpus rows") {
    val p = plan("table_histogram")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"histogram should make ONE corpus pass, saw $scans scans")
    assert(p.contains("partial_count"),
      "value-count collapse lost map-side partial aggregation")
    // Tree prints top-down, so the window's INPUT aggregate (the
    // (value,count) collapse) must appear on a LATER line than the window.
    val lines = p.linesIterator.toList
    val win = lines.indexWhere(_.contains("Window"))
    val aggBelow = lines.lastIndexWhere(_.contains("HashAggregate"))
    assert(win >= 0 && aggBelow > win,
      "window should consume the (value,count) aggregate — an aggregate must sit below it in the plan")
  }

  test("sample_reservoir: rank filter pushes below the shuffle (WindowGroupLimit)") {
    val p = plan("sample_reservoir")
    assert(p.contains("WindowGroupLimit"),
      "k-per-group filter must prune map-side before the exchange (reservoir bound)")
    assert(!p.contains("CartesianProduct"))
  }

  test("pipeline_shard: doc-level rank window is partitioned; offsets attach by broadcast") {
    val p = plan("pipeline_shard")
    assert("Window.*partitionBy|Window \\[row_number".r.findFirstIn(p).isDefined ||
      p.contains("row_number"), "doc-level rank window missing")
    // The doc-level window must carry a partition spec (n_tok) — the only
    // global window allowed is over the aggregate-sized class table.
    assert("windowspecdefinition\\(n_tok".r.findFirstIn(p.toLowerCase).isDefined,
      "doc-level row_number lost its n_tok partitioning (global single-reducer sort)")
    assert(p.contains("BroadcastHashJoin"), "class offsets must attach by broadcast")
    assert(p.contains("partial_"), "shard rollup lost map-side partial aggregation")
  }

  test("graph_bfs: level rollup partial-aggregates over checkpointed frontiers; no window") {
    val p = plan("graph_bfs")
    assert(p.contains("ExistingRDD"),
      "rollup should scan the checkpointed levels, not replay the expansion")
    assert(p.contains("partial_"), "level rollup lost map-side partial aggregation")
    assert(!p.contains("Window") && !p.contains("CartesianProduct"))
  }

  test("scan_v2_agg: rollup pushed completely into the V2 scan — no aggregate operator") {
    val p = plan("scan_v2_agg")
    assert(p.contains("AGGPUSHED"), "aggregation not pushed into the connector scan")
    assert(!p.contains("HashAggregate") && !p.contains("partial_"),
      "complete pushdown must leave no aggregation above the scan (metadata-read path)")
  }

  test("dedup_suffix: class-rank pass partial-aggregates; no class window exchange") {
    // The per-round frames checkpoint (lineage truncation), so the final
    // plan can't witness the class pass — pin the extracted helper on a
    // frame with the pass's exact column shape. The rank must come from a
    // map-side-combining groupBy (Zipf class keys: a window would ship
    // every member of the head-token class to one reducer at 100 TB).
    import org.apache.spark.sql.functions._
    val df = spark.range(1000).select(
      (col("id") % 7L).as("doc_id"), col("id").as("pos"),
      col("id").as("gid"), (col("id") % 13L).cast("string").as("tok"))
    val cls = operators.Dedup.suffixClasses(df, Seq("tok"))
    val p = operators.Dedup.suffixPrune(df, cls, Seq("tok"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"),
      "class rank degraded to a full-partition window (single reducer per Zipf class)")
    assert(p.contains("partial_min") || p.contains("partial_"),
      "class table lost map-side partial aggregation")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")
      || p.contains("ShuffledHashJoin"),
      "join-back is not an equi-join (AQE can no longer skew-split it)")
  }

  test("graph_label_prop: vote argmax is an aggregate, not a window; rollup scans the checkpoint") {
    val p = plan("graph_label_prop")
    assert(p.contains("ExistingRDD"),
      "final labels should scan the checkpointed round, not replay 3 rounds of voting")
    assert(!p.contains("Scan parquet"),
      "iteration plan leaked into the output rollup (parquet re-scan)")
    assert(p.contains("partial_"), "community rollup lost map-side partial aggregation")
    assert(!p.contains("Window"),
      "per-node argmax degraded to a window (rank) — the struct-max aggregate combines map-side")
  }

  test("mm_dedup: block candidates come from equi-joins, never all-pairs over payloads") {
    val p = plan("mm_dedup")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "pHash blocking degraded to an all-pairs join")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")
      || p.contains("ShuffledHashJoin"), "no equi-join operator in the plan")
    assert(p.contains("InMemoryTableScan"),
      "signature frame not cached — each block projection replays the decode")
  }

  test("graph_cc: final labels scan the checkpoint, not a replayed iteration plan") {
    val p = plan("graph_cc")
    assert(p.contains("Scan ExistingRDD"),
      "component labels should scan the localCheckpoint, not replay the rounds")
  }

  test("pipeline_curate: keep-first collapses map-side; at most three hash exchanges") {
    val p = plan("pipeline_curate")
    assert(p.contains("WindowGroupLimit"),
      "canonical keep-first no longer plans as a window group limit")
    // Upper bound, not exact equality: countDistinct/window planning details
    // shift across Spark versions and AQE settings; the property that
    // matters is that no EXTRA shuffle sneaks in beyond (canon, distinct
    // partial, lang).
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 3,
      s"curation pipeline should shuffle at most 3× (canon, distinct partial, lang), saw $exchanges")
  }

  test("pipeline_mix: water-fill runs on checkpointed totals; one corpus scan in the plan") {
    val p = plan("pipeline_mix")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "mixture attachment should be broadcast-only")
    assert(p.contains("BroadcastHashJoin"), "rate table not broadcast into the rollup pass")
    assert(p.contains("ExistingRDD"),
      "per-source totals not checkpointed — each water-fill reference re-scans the corpus")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 1,
      s"rollup should be the only corpus scan in the plan (totals are checkpointed), saw $scans")
    assert(p.contains("partial_"), "selection rollup lost map-side partial aggregation")
  }

  test("lc_structfunc: pair generation is an equi-join, never quadratic") {
    val p = plan("lc_structfunc")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "structure-function pairs degraded to a non-equi join")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")
      || p.contains("ShuffledHashJoin"), "no equi-join operator in the plan")
    assert(p.contains("partial_"), "pair bins lost map-side partial aggregation")
  }

  test("dedup_semantic: pairing meets on the cell id; rank window partitions by cell") {
    val p = plan("dedup_semantic")
    assert(!p.contains("CartesianProduct"), "pair join degraded to cartesian")
    // the only nested loop allowed is the 8-row centroid broadcast; the
    // assignment subplan is evaluated once per consumer (cell counts, both
    // pair sides, final keep/drop), so it appears up to 4×
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).length <= 4,
      "a data-sized join degraded to a nested loop")
    assert(p.contains("partial_"), "cell assignment lost map-side partial argmax")
  }

  test("quality_classifier: model tables broadcast; only scalar cross-attachments nest") {
    val p = plan("quality_classifier")
    assert(!p.contains("CartesianProduct"))
    // vocab + weights attach to the token stream as broadcasts
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2,
      "vocab/weight model tables no longer broadcast")
    // the only nested-loop joins allowed are the 1-row scalar attachments
    // (class totals, prior); anything more means a real join degraded
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).length <= 2,
      "a data-sized join degraded to a nested loop")
  }

  test("agg_pctile_reagg: rank scan runs over the bucket sketch, not corpus rows") {
    val p = plan("agg_pctile_reagg")
    assert(p.contains("partial_count"),
      "per-day sketch build lost map-side partial aggregation")
    // The window (cumulative rank scan) must consume the merged sketch
    // aggregate — an aggregate must sit BELOW it in the top-down tree.
    val lines = p.linesIterator.toList
    val win = lines.indexWhere(_.contains("Window"))
    val aggBelow = lines.lastIndexWhere(_.contains("HashAggregate"))
    assert(win >= 0 && aggBelow > win,
      "rank scan should run over the bounded sketch table, not corpus rows")
    assert(!p.contains("Join"), "sketch pipeline should be join-free")
  }

  test("table_timetravel: as-of reads resolve from the commit log; reconstruction is an aggregate, not a window") {
    val p = plan("table_timetravel")
    assert(!p.contains("Window"),
      "latest-generation-wins degraded to a window — the max-struct aggregate combines map-side")
    // Generation isolation is now a property of the LOG-resolved file list,
    // not a partition filter — CommitLogSpec pins that the version-1 scan
    // never lists a g=2 file (and that uncommitted files are invisible).
  }

  test("table_changefeed: feed rollups scan only the changed files — no join, no window, one scan per feed entry") {
    val p = plan("table_changefeed")
    assert(!p.contains("Join"), "change-feed rollups must not join")
    assert(!p.contains("Window"), "change-feed rollups must not window")
    // Three feed entries (v2 insert, v3 insert, v3 delete) ⇒ exactly three
    // parquet scans, each over its version's changed-file list — a scan of
    // the whole table (or of an unchanged generation) would add a fourth.
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans === 3, s"expected 3 changed-file scans, saw $scans:\n$p")
  }

  test("table_restore: three as-of reads, one scan each — restore itself added no data scan") {
    val p = plan("table_restore")
    assert(!p.contains("Join"), "as-of rollups must not join")
    assert(!p.contains("Window"), "as-of rollups must not window")
    // as-of 1, 2, 3 read one single-file snapshot each; the restore commit
    // is metadata-only (require()d in-query: no g=3 directory exists).
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans === 3, s"expected 3 snapshot scans, saw $scans:\n$p")
  }

  test("table_incr_refresh: the declared view reads the checkpointed fold — zero parquet scans") {
    val p = plan("table_incr_refresh")
    assert(p.contains("ExistingRDD"),
      "refreshed view should read the checkpointed delta fold")
    assert(!p.contains("Scan parquet"),
      "IVM output re-scanned the table — refresh must be O(changed files), not a rescan")
    assert(!p.contains("Join"), "view read must be join-free")
  }

  test("graph_jaccard: bounded top-k via rank pushdown; wedge counts aggregate map-side") {
    val p = plan("graph_jaccard")
    assert(p.contains("TakeOrderedAndProject"),
      "top-20 must push the limit into the sort (no full global sort)")
    assert(p.contains("partial_count"),
      "wedge/degree counts lost map-side partial aggregation")
  }

  test("table_optimize: two snapshot rollups, one scan each — pre- and post-compaction reads share the plan shape") {
    val p = plan("table_optimize")
    assert(!p.contains("Join"), "snapshot rollups must not join")
    assert(!p.contains("Window"), "snapshot rollups must not window")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans === 2, s"expected 2 snapshot scans (as-of 2 and 3), saw $scans:\n$p")
  }

  test("graph_cluster_coeff: histogram rolls up node scores with map-side partials; no window") {
    val p = plan("graph_cluster_coeff")
    assert(!p.contains("Window"), "the decile histogram must not window")
    assert(p.contains("partial_count"),
      "triangle credits / degree counts lost map-side partial aggregation")
    // Degree-ordered orientation: triangles must enumerate from the shared
    // checkpointed oriented edge frame (vs, vt, kt) — the wedge join pairs
    // on vs with a kt struct inequality, never id-only a/b orientation
    // (which would leave a small-id hub with all its wedges in one task).
    assert(p.contains("Scan ExistingRDD"),
      "triangle enumeration should scan the checkpointed oriented edge frame")
    assert("\\[vs#\\d+L?\\], \\[vs#\\d+L?\\]".r.findFirstIn(p).isDefined &&
      "kt#\\d+ < kt#\\d+".r.findFirstIn(p).isDefined,
      "wedge join no longer keys on the degree-ordered (vs, kt) orientation")
    assert(!p.contains("CartesianProduct"),
      "triangle enumeration degraded to an all-pairs plan")
  }

  test("ts_ewma: trailing window attaches via a bounded join, not a per-event sliding frame") {
    val p = plan("ts_ewma")
    // Exactly one Window (the per-user ranking); the 16-event frame itself
    // must NOT be a second window — it rides the prefiltered self-join.
    val windows = "Window".r.findAllIn(p).size
    assert(windows <= 2, s"expected only the ranking window (saw $windows Window operators):\n$p")
    assert(p.contains("Join"), "trailing frame should attach via the bounded join")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "EWMA sums lost map-side partial aggregation")
  }

  test("dedup_suffix: spectrum rollup scans the checkpointed rounds, not a replayed doubling chain") {
    val p = plan("dedup_suffix")
    assert(p.contains("ExistingRDD"),
      "level stats should scan the checkpointed class frames")
    assert(!p.contains("Scan parquet"),
      "doubling-round plan leaked into the spectrum rollup (corpus re-scan)")
    assert(!p.contains("Join"),
      "the final rollup should be pure aggregates over the checkpoints — no join")
  }

  test("stream_enrich: dimension attaches via broadcast; event stream never shuffles for the join") {
    val p = plan("stream_enrich")
    assert(p.contains("BroadcastHashJoin"),
      "static dimension no longer broadcasts into the event stream")
    assert(p.contains("partial_count"),
      "enrichment rollup lost map-side partial aggregation")
  }

  test("table_delete: two as-of rollups, one scan each — victim selection and " +
      "the commit are metadata, not data scans") {
    val p = plan("table_delete")
    assert(!p.contains("Join"), "as-of rollups must not join")
    assert(!p.contains("Window"), "as-of rollups must not window")
    // Pre-delete and post-delete each read their log-resolved file list in
    // ONE distributed scan; a third scan would mean victim selection or
    // the rewrite leaked into the declared read.
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans === 2, s"expected 2 snapshot scans, saw $scans:\n$p")
  }

  test("table_update: two as-of rollups, one scan each — the rewrite is " +
      "confined to the victim partition, not the declared read") {
    val p = plan("table_update")
    assert(!p.contains("Join"), "as-of rollups must not join")
    assert(!p.contains("Window"), "as-of rollups must not window")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans === 2, s"expected 2 snapshot scans, saw $scans:\n$p")
  }

  test("table_merge_cow: two as-of rollups, one scan each — the merge " +
      "rewrite and its discovery never reach the declared read") {
    val p = plan("table_merge_cow")
    assert(!p.contains("Join"), "as-of rollups must not join")
    assert(!p.contains("Window"), "as-of rollups must not window")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans === 2, s"expected 2 snapshot scans, saw $scans:\n$p")
  }

  test("table_delete_dv: the declared union reads ONE parquet scan (the " +
      "materialized snapshot); the MoR anti-join ran pre-checkpoint and " +
      "never reaches the declared read") {
    val p = plan("table_delete_dv")
    assert(!p.contains("Join"), "declared rollups must not join")
    assert(!p.contains("Window"), "declared rollups must not window")
    // r1/r2 are pinned as localCheckpoints (vacuum retires their files);
    // only the materialized v3 rollup scans parquet. The MoR read's own
    // broadcast-anti-join/no-shuffle shape is pinned in CommitLogSpec.
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans === 1, s"expected 1 snapshot scan, saw $scans:\n$p")
  }

  test("table_timetravel_ts: timestamp resolution adds zero scans — three " +
      "probes, three as-of reads, nothing else") {
    val p = plan("table_timetravel_ts")
    assert(!p.contains("Join"), "as-of rollups must not join")
    assert(!p.contains("Window"), "as-of rollups must not window")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans === 3, s"expected 3 snapshot scans (one per probe), saw $scans:\n$p")
  }

  test("fn_variant: one scan, row-wise variant projection — no join, no shuffle") {
    val p = plan("fn_variant")
    assert(!p.contains("Join"), "variant extraction must not join")
    assert(p.contains("variant_get") || p.contains("VariantGet"),
      "typed path access should appear as variant_get in the projection")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans === 1, s"expected a single events scan, saw $scans:\n$p")
    // One exchange allowed: the deterministic ORDER BY for the harness.
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 2, s"row-wise projection grew extra shuffles:\n$p")
  }

  test("dedup_autotune: the declared output reads the checkpointed tuning " +
      "table — recommendation and apply-verification add no scan to it") {
    val p = plan("dedup_autotune")
    assert(p.contains("ExistingRDD"),
      "output should read the localCheckpointed tuning table")
    assert(!p.contains("Scan parquet"),
      "the declared read re-scanned the corpus — the decision output is O(layouts) rows")
  }

  test("win_pattern: one user-key shuffle, two stacked Window operators, " +
      "no joins — the MATCH_RECOGNIZE compilation stays sessionization-shaped") {
    val p = plan("win_pattern")
    assert(!p.contains("Join"), "pattern matching must not join")
    val dataExchanges = "Exchange hashpartitioning\\(user_id".r.findAllIn(p).size
    assert(dataExchanges === 1, s"expected exactly 1 user-key shuffle:\n$p")
    // row_number + the three fused predecessor captures = 2 Window ops; a
    // third would mean the captures split into separate partition passes.
    val windows = "\\bWindow\\b".r.findAllIn(p).size
    assert(windows === 2, s"expected 2 Window operators, saw $windows:\n$p")
  }

  test("pipeline_dataloader: the declared output reads the checkpointed " +
      "manifest — the loader-law verification adds no scan to it") {
    val p = plan("pipeline_dataloader")
    assert(p.contains("ExistingRDD"),
      "output should read the localCheckpointed batch manifest")
    assert(!p.contains("Scan parquet"),
      "the declared read re-scanned the corpus — the manifest is O(corpus/budget) rows")
  }

  test("fn_variant_shred: the declared aggregate reads the shredded table " +
      "in one scan with map-side partials (the pushdown require runs in-query)") {
    val p = plan("fn_variant_shred")
    assert(!p.contains("Join"), "shredded rollup must not join")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans === 1, s"expected 1 shredded-table scan, saw $scans:\n$p")
    assert(p.contains("partial_count"), "rollup lost map-side partial aggregation")
  }

  test("sim_autotune: the declared output reads the checkpointed tuning " +
      "table — recommendation and apply-verification add no scan to it") {
    val p = plan("sim_autotune")
    assert(p.contains("ExistingRDD"),
      "output should read the localCheckpointed tuning table")
    assert(!p.contains("Scan parquet"),
      "the declared read re-scanned the corpus — the decision output is O(configs) rows")
  }

  test("lc_changepoint: the full CUSUM scan is ONE user-key shuffle — two " +
      "stacked Windows share it and the argmax collapses as a partial agg") {
    val p = plan("lc_changepoint")
    assert(!p.contains("Join"), "change-point must not join — the argmax is a max-struct agg")
    val windows = "\\bWindow\\b".r.findAllIn(p).size
    assert(windows === 2, s"expected 2 Window operators (ordered cumsum + per-key totals), saw $windows:\n$p")
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges === 2,
      s"expected 2 Exchanges (one user-key shuffle + the determinism sort), saw $exchanges:\n$p")
    // the argmax must collapse map-side before any further movement
    assert(p.contains("SortAggregate") || p.contains("partial_max"),
      "per-key argmax lost its partial aggregation")
  }

  test("table_constraint: the declared read scans only the committed live " +
      "files in one pass with map-side partials (validation ran in-query)") {
    val p = plan("table_constraint")
    assert(!p.contains("Join"), "constraint rollup must not join")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans === 1, s"expected 1 live-snapshot scan, saw $scans:\n$p")
    assert(p.contains("partial_count"), "rollup lost map-side partial aggregation")
  }

  test("table_skipping: the declared aggregate scans ONLY the files the " +
      "log stats admit — pruning happened before the plan, in metadata") {
    val p = plan("table_skipping")
    assert(!p.contains("Join"), "skipped rollup must not join")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans === 1, s"expected 1 pruned-file-set scan, saw $scans:\n$p")
    // 8 files staged; the range probe must admit a strict subset. The scan's
    // file index prints one path + "... N entries"; seeing a g= path from
    // outside buckets 2-3 means pruning silently stopped.
    assert(!p.contains("g=0/") && !p.contains("g=7/"),
      s"a range-disjoint file leaked into the scan:\n$p")
    assert(p.contains("partial_count"), "rollup lost map-side partial aggregation")
  }

  test("lc_color_epoch: both nearest-capture windows AND the per-object " +
      "rollup ride ONE object-key shuffle — never a band self-join, never " +
      "an UNBOUNDED FOLLOWING frame") {
    val p = plan("lc_color_epoch")
    assert(!p.contains("Join"), "epoch color pairing degraded to a band self-join")
    val windows = "\\bWindow\\b".r.findAllIn(p).size
    assert(windows === 2, s"expected 2 Windows (backward + reversed-forward capture), saw $windows:\n$p")
    assert(!p.toLowerCase.contains("unboundedfollowing"),
      s"forward capture regressed to the O(partition²) frame:\n$p")
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges === 2,
      s"expected 2 Exchanges (one object-key shuffle + the determinism sort), saw $exchanges:\n$p")
  }

  test("lc_color: both bands and the color index ride ONE object-key " +
      "shuffle — conditional aggregation, never a per-band self-join") {
    val p = plan("lc_color")
    assert(!p.contains("Join"), "multi-band photometry degraded to a self-join")
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges === 2,
      s"expected 2 Exchanges (one object-key shuffle + the determinism sort), saw $exchanges:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_avg"),
      "conditional aggregation lost map-side partials")
  }

  test("join_null_safe: EqualNullSafe stays a TRUE equi-join key — " +
      "hash/sort-merge, never the nested loop a theta clause would cost") {
    val p = plan("join_null_safe")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"null-safe join degraded to a non-equi strategy:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")
      || p.contains("ShuffledHashJoin"), s"no equi-join operator:\n$p")
  }

  test("stream_session_native: the planner's MergingSessions operator owns " +
      "the session merge — one key shuffle, no join, no hand-rolled window") {
    val p = plan("stream_session_native")
    assert(p.contains("MergingSessions"),
      s"native session windowing lost the MergingSessions operator:\n$p")
    assert(!p.contains("Join"), "session merge degraded to a join")
    assert("\\bWindow\\b".r.findFirstIn(p).isEmpty,
      "native form must not fall back to lag windows")
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges === 2,
      s"expected 2 Exchanges (one key shuffle + the determinism sort), saw $exchanges:\n$p")
  }

  test("join_skew_aqe: OptimizeSkewedJoin splits the hot partition in the " +
      "ADAPTIVE final plan — SMJ carries skew=true, the hot side reads skewed") {
    // The adaptive plan only materializes post-execution; the QDef runs
    // its own collect() and `require`s the markers, so a mistuned
    // threshold fails the query itself — this pin re-asserts the shape
    // from the outside so a silently weakened require cannot pass. The
    // QDef returns the computed aggregate as a LOCAL relation (so the
    // harness doesn't re-run the join), so the adaptive plan is read from
    // the execution hook, not the returned frame.
    val df = SparkEntry.queries("join_skew_aqe")(spark, sf)
    df.collect(): Unit
    val p = graft.operators.Joins.lastSkewAqePlan
    assert(p.nonEmpty, "join_skew_aqe did not record its adaptive plan")
    assert(p.contains("SortMergeJoin(skew=true)"),
      s"skew-split SMJ missing from the adaptive final plan:\n$p")
    assert(p.contains("skewed"),
      s"no skewed AQEShuffleRead in the adaptive final plan:\n$p")
    assert(!p.contains("BroadcastHashJoin"),
      "the skew demonstration degraded to a broadcast join")
  }

  test("table_bloom_index: the declared aggregate scans ONLY the files the " +
      "bloom words admit — fewer than min/max ranges keep on this layout") {
    val df = SparkEntry.queries("table_bloom_index")(spark, sf)
    val row = df.head()
    val nMinmax = row.getAs[Long]("n_files_minmax")
    val nBloom = row.getAs[Long]("n_files_bloom")
    assert(nBloom < nMinmax,
      s"bloom kept $nBloom of the $nMinmax range-admitted files — no pruning win")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), "pruned point lookup must not join")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans === 1, s"expected 1 pruned-file-set scan, saw $scans:\n$p")
    // The scan's file index must reference no more bucket dirs than the
    // bloom admitted (pruning happened in metadata, before the plan).
    val bucketsInScan = (0 to 7).count(g => p.contains(s"g=$g/"))
    assert(bucketsInScan <= nBloom,
      s"scan references $bucketsInScan bucket dirs but bloom admitted $nBloom:\n$p")
    assert(p.contains("partial_count"), "rollup lost map-side partial aggregation")
  }

  test("sql_recursive_cte: the recursion compiles to a UnionLoop whose step " +
      "joins only the previous frontier (linear recursion, not closure replay)") {
    val p = plan("sql_recursive_cte")
    assert(p.contains("UnionLoop"), s"recursive CTE did not plan as UnionLoop:\n$p")
    assert(p.contains("UnionLoopRef"),
      "the step must reference the previous iteration's frontier")
    val loops = "UnionLoopRef".r.findAllIn(p).size
    assert(loops === 1, s"expected exactly 1 frontier self-reference, saw $loops")
  }

  test("mm_scenecut: decode stays narrow and ONE video-key shuffle carries " +
      "the lag, the scene ids, and both rollups (grouping keys ⊇ partition key)") {
    val p = plan("mm_scenecut")
    assert(!p.contains("Join"), "scene segmentation must not join")
    assert(p.contains("MapPartitions"),
      "frame decode should be a narrow typed mapPartitions in the scan stage")
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges === 2,
      s"expected 2 Exchanges (one doc-key shuffle + the determinism sort), saw $exchanges:\n$p")
  }

  test("opt_sarg_rewrite: the injected optimizer rule turns the custom-" +
      "expression predicate into a pushed range filter on the scan") {
    val p = plan("opt_sarg_rewrite")
    assert(p.contains("PushedFilters") && p.contains("GreaterThan(value"),
      s"graft_mag(value) < m did not reach the scan as GreaterThan(value, t):\n$p")
    assert(!p.contains("graft_mag"),
      "the magnitude expression should be rewritten away from the filter entirely")
  }

  test("opt_stats_broadcast: the ANALYZE artifact drives a hint-free STATIC " +
      "BroadcastHashJoin on the initial plan — no shuffle join survives") {
    // The QDef's in-query control already proves the size-only session
    // plans a shuffle join at the same threshold; this re-asserts the
    // rule session's shape from the outside so a silently weakened
    // require cannot pass.
    val p = plan("opt_stats_broadcast")
    assert(p.contains("BroadcastHashJoin"),
      s"stats-driven flip lost the static broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"a shuffle join survived next to the stats-driven broadcast:\n$p")
  }

  test("join_asof_nearest: nearest is the SAME one shuffle as join_asof — " +
      "two stacked window captures, never a join operator") {
    val p = plan("join_asof_nearest")
    assert(!p.contains("Join"), "nearest as-of degraded to a join")
    val windows = "\\bWindow\\b".r.findAllIn(p).size
    assert(windows === 2, s"expected 2 Windows (backward + forward capture), saw $windows:\n$p")
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges === 2,
      s"expected 2 Exchanges (one key shuffle + the determinism sort), saw $exchanges:\n$p")
  }

  test("join_lateral: the per-row LIMIT decorrelates to rank-over-partition " +
      "+ one equi-join — never a per-outer-row nested loop") {
    val p = plan("join_lateral")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "lateral subquery executed as a nested loop")
    assert(p.contains("Window"), "the lateral LIMIT should become a rank window")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")
      || p.contains("ShuffledHashJoin"), "no equi-join operator in the plan")
    assert(p.contains("GreaterThan(c_acctbal,9000.0)"),
      "the outer filter should still push to the customer scan")
  }

  test("table_gencol: the declared aggregate scans ONLY the transform-" +
      "admitted partitions — fewer files than stats skipping can keep") {
    val p = plan("table_gencol")
    assert(!p.contains("Join"), "gencol rollup must not join")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans === 1, s"expected 1 pruned-file-set scan, saw $scans:\n$p")
    assert(!p.contains("g=0/") && !p.contains("g=7/"),
      s"a transform-disjoint partition leaked into the scan:\n$p")
  }

  test("table_partition_evolve: the declared aggregate scans only the " +
      "files each generation's OWN spec admits") {
    val p = plan("table_partition_evolve")
    assert(!p.contains("Join"), "evolved rollup must not join")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans === 1, s"expected 1 pruned-file-set scan, saw $scans:\n$p")
    // under w1 only g=1 survives from s1; under w2 only g=2..3 from s2
    assert(!p.contains("s1/g=0/") && !p.contains("s1/g=3/")
      && !p.contains("s2/g=0/") && !p.contains("s2/g=7/"),
      s"a spec-disjoint partition leaked into the scan:\n$p")
  }

  test("agg_moments_reagg: the shard cube partial-aggregates map-side and " +
      "the re-aggregation is one exchange — no second corpus pass") {
    val p = plan("agg_moments_reagg")
    assert(!p.contains("Join"), "moment re-aggregation must not join")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans === 1, s"expected 1 corpus scan, saw $scans:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "shard cube lost map-side partial aggregation")
  }

  test("win_gaps_islands: dedup, islands, and both rollups ride ONE " +
      "user-key shuffle (lag-dedup instead of a distinct exchange)") {
    val p = plan("win_gaps_islands")
    assert(!p.contains("Join"), "islands must not join")
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges === 2,
      s"expected 2 Exchanges (one user shuffle + the determinism sort), saw $exchanges:\n$p")
    val windows = "\\bWindow\\b".r.findAllIn(p).size
    assert(windows === 2, s"expected 2 Windows (lag-dedup + island rank), saw $windows:\n$p")
  }

  test("agg_weighted_median: the RANGE-frame cumulative + threshold pick is " +
      "ONE flag-key shuffle — no pre-grouping pass, no join") {
    val p = plan("agg_weighted_median")
    assert(!p.contains("Join"), "weighted median must not join")
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges === 2,
      s"expected 2 Exchanges (one flag shuffle + the determinism sort), saw $exchanges:\n$p")
  }

  test("fn_hash_crypto: content addressing runs in the scan stage — " +
      "row-wise codegen, no join, only the digests move") {
    val p = plan("fn_hash_crypto")
    assert(!p.contains("Join"), "hashing must not join")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans === 1, s"expected 1 corpus scan, saw $scans:\n$p")
    // The digest projection computes in the scan stage: the ONLY exchange
    // is the determinism sort (only 16/32-byte digests ever move).
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges === 1,
      s"expected 1 Exchange (the determinism sort), saw $exchanges:\n$p")
  }

  test("mm_crossmodal: encoded probes broadcast into the cell join; payloads never shuffle") {
    val p = plan("mm_crossmodal")
    // the cell equi-join against the standing assignment is a broadcast join
    assert("BroadcastHashJoin \\[cell".r.findFirstIn(p).isDefined,
      "probe→index cell join no longer broadcasts")
    // the only nested loop allowed is assignCell's broadcast-centroid
    // cross attach (tiny, bounded by IvfCells)
    assert(!p.contains("CartesianProduct"), "a real join degraded to a cartesian product")
    assert(p.contains("MapPartitions"),
      "media encode should be a narrow typed mapPartitions in the scan stage")
  }

  test("lc_ce: grid fan-out collapses map-side; phase marginal keeps its " +
      "partition spec; argmin plans as a window group limit") {
    val p = plan("lc_ce")
    assert(p.contains("partial_"), "CE occupancy grid lost partial aggregation")
    assert("windowspecdefinition\\(user_id.*pbin".r
        .findFirstIn(p.toLowerCase).isDefined,
      "phase-marginal window lost its (user, period, pbin) partitioning")
    assert(p.contains("WindowGroupLimit"),
      "rn=1 argmin no longer plans as a window group limit")
  }

  test("agg_ks_test: cumulative window partitioned per type; totals broadcast") {
    val p = plan("agg_ks_test")
    assert("windowspecdefinition\\(event_type".r
        .findFirstIn(p.toLowerCase).isDefined,
      "KS cumulative window lost its event_type partitioning (global sort)")
    assert(p.contains("BroadcastHashJoin"),
      "per-type totals must attach by broadcast")
    assert(p.contains("partial_"),
      "(type, value) pre-aggregate lost map-side partials")
  }

  test("sim_rrf_fusion: both top-20 cuts plan as window group limits; " +
      "corpus stats attach by broadcast; no cartesian") {
    val p = plan("sim_rrf_fusion")
    val limits = "WindowGroupLimit".r.findAllIn(p).size
    assert(limits >= 2,
      s"lexical + vector top-k cuts should both prune map-side, saw $limits group limits")
    assert(p.contains("BroadcastHashJoin"),
      "df/stats corpus aggregates must attach by broadcast")
    // the only nested loop allowed is the tiny probe broadcast (the
    // sim_cosine shape); a cartesian anywhere is a degraded plan
    assert(!p.contains("CartesianProduct"),
      "fusion degraded to a cartesian product")
  }

  test("pipeline_train_snapshot: release manifests keep the shard idiom — " +
      "partitioned rank windows, offsets by broadcast, no cartesian") {
    val p = plan("pipeline_train_snapshot")
    assert("windowspecdefinition\\(n_tok".r.findFirstIn(p.toLowerCase).isDefined,
      "doc-level row_number lost its n_tok partitioning (global single-reducer sort)")
    assert(p.contains("BroadcastHashJoin"), "class offsets must attach by broadcast")
    assert(p.contains("partial_"), "shard rollup lost map-side partial aggregation")
    assert(!p.contains("CartesianProduct"))
  }

  test("lc_alerts: latest-epoch cut prunes map-side and broadcasts onto " +
      "the baseline moments; filters reach the scan") {
    val p = plan("lc_alerts")
    assert(p.contains("WindowGroupLimit"),
      "the rn=1 latest cut must prune map-side before its exchange")
    assert(p.contains("BroadcastHashJoin"),
      "the tiny latest-epoch side must broadcast onto the baseline")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 2,
      s"each branch shuffles once on the object key, saw $exchanges")
    assert(p.contains("GreaterThan(value,0.0)"),
      "the positivity filter must reach the parquet scan")
  }

  test("stream_cdc_apply: the final replica rollup is join- and window-free " +
      "with partial aggregation") {
    val p = plan("stream_cdc_apply")
    assert(!p.contains("Join"), "the per-bucket rollup should never join")
    assert(p.contains("partial_"), "replica rollup lost map-side partials")
    assert(!p.contains("CartesianProduct"))
  }

  test("table_schema_enforce: the version rollup is join-free with partial " +
      "aggregation") {
    val p = plan("table_schema_enforce")
    assert(!p.contains("Join"), "the version rollup should never join")
    assert(p.contains("partial_"), "version rollup lost map-side partials")
    assert(!p.contains("CartesianProduct"))
  }

  test("frame_photometry: pixel-source neighborhood stays an equi-join " +
      "on the cell key — never pixels × sources") {
    val p = plan("frame_photometry")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "photometry degraded to an all-pairs plan")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")
      || p.contains("ShuffledHashJoin"), "no equi-join operator in the plan")
    assert(p.contains("partial_"),
      "aperture/annulus stats lost map-side partials")
  }

  test("pipeline_anneal: schedule windows are per-step partitioned; the " +
      "corpus is aggregated once") {
    val p = plan("pipeline_anneal")
    assert("windowspecdefinition\\(step".r.findFirstIn(p.toLowerCase).isDefined,
      "deficit/rank windows lost their per-step partitioning")
    assert(p.contains("partial_"),
      "per-source counts lost map-side partials")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans <= 1, s"expected at most 1 corpus scan, saw $scans")
  }

  test("frame_photometry_bytes: decoded pixels meet sources only on the " +
      "cell key — an equi-join, never pixels × sources") {
    val p = plan("frame_photometry_bytes")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "pixel-source neighborhood degraded to all-pairs")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")
      || p.contains("ShuffledHashJoin"),
      "no equi-join operator in the neighborhood plan")
    assert(p.contains("partial_"), "aperture stats lost map-side partials")
  }

  test("frame_registration: star pairs meet only within their magnitude " +
      "class — an equi-join, never all-pairs across catalogs") {
    val p = plan("frame_registration")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")
      || p.contains("ShuffledHashJoin"),
      "no equi-join operator in the voting plan")
    assert(p.contains("partial_"), "delta votes lost map-side partials")
  }

  test("agg_ttest: both halves fold in ONE conditional-aggregate corpus " +
      "pass — a single scan, map-side partials") {
    val p = plan("agg_ttest")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans <= 2, // corpus + the one-row midpoint aggregate
      s"expected at most 2 parquet scans (corpus + midpoint), saw $scans")
    assert(p.contains("partial_"), "moment sums lost map-side partials")
    assert(!p.contains("SortMergeJoin"),
      "the one-row midpoint must broadcast, never shuffle-join")
  }

  test("sample_importance: the accept bit decides in the scan stage — " +
      "one corpus scan, no join, partial aggregation") {
    val p = plan("sample_importance")
    assert(!p.contains("Join"), "importance acceptance must not join")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans === 1, s"expected 1 corpus scan, saw $scans")
    assert(p.contains("partial_"), "per-source rollup lost map-side partials")
  }

  test("ts_seasonal: totals fold from the checkpointed hour table and " +
      "attach by broadcast — one corpus scan") {
    val p = plan("ts_seasonal")
    assert(p.contains("BroadcastHashJoin"),
      "per-type totals must attach by broadcast")
    assert(p.contains("ExistingRDD"),
      "totals must fold from the checkpointed (type, hour) table")
    assert(!p.contains("parquet"),
      "corpus scan leaked past the checkpoint — a branch re-scans")
  }

  test("table_apply_cdf: the replica rollup is a pure union of snapshot " +
      "aggregates — no join, no window, partial aggregation intact") {
    val p = plan("table_apply_cdf")
    assert(!p.contains("Join"), "per-version rollups should never join")
    assert(!p.contains("Window"), "per-version rollups should never window")
    assert(p.contains("partial_"), "snapshot rollups lost map-side partials")
    assert(!p.contains("CartesianProduct"))
  }

  test("lc_dmdt: bucketed pair generation stays an equi-join, bins collapse map-side") {
    val p = plan("lc_dmdt")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "dm-dt pair generation degraded to a non-equi join")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")
      || p.contains("ShuffledHashJoin"), "no equi-join operator in the plan")
    assert(p.contains("partial_count"), "histogram bins lost map-side partials")
  }

  test("lc_flares: stats join + both windows + census share the object-key partitioning") {
    val p = plan("lc_flares")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 3,
      s"flare census should reuse the user_id shuffle, saw $exchanges hash exchanges")
    assert("Window".r.findAllIn(p).length >= 2, "island-key windows missing")
  }

  test("frame_difference: neighbor probe and injection checks stay equi-joins") {
    val p = plan("frame_difference")
    assert(!p.contains("CartesianProduct"),
      "a pixel-side join degraded to a cartesian product")
  }
}
