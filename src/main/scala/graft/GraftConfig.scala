package graft

/** Central tuning knobs for every approximate/iterative operator family.
  *
  * One place, because a tuning change must move the Spark plan AND its
  * DuckDB oracle together (both are generated from these values), and
  * because each knob's 100 TB story belongs next to its value — the plan
  * SHAPES are invariant to the values; only recall/cost trade-offs move.
  *
  * Fixture values are sized for the sf0.001–0.1 parquet fixtures the
  * driver grades (small vocab, 2.5k–25k vectors): big enough that buckets
  * are populated and the oracle's determinism checks bite, small enough
  * that unrolled oracle CTE chains stay readable.
  */
object GraftConfig {

  /** MinHash LSH banding (dedup_minhash / dedup_cluster / dedup_keep /
    * dedup_ngram): `LshBands` bands × `LshRowsPerBand` minhash rows.
    * Candidate probability at Jaccard j is 1−(1−j^r)^b. Production tunes
    * (b, r) to the similarity threshold — e.g. 20×5 for j≈0.8 web dedup;
    * r ≥ 2 always, because r = 1 buckets on the corpus-global minimum
    * shingle and a bucket goes quadratic. */
  val LshBands = 3
  val LshRowsPerBand = 2

  /** Auto-tune acceptance floor (dedup_autotune): the cheapest band
    * layout whose measured true-pair retention is at least this (in
    * millionths) is recommended and applied. Production sets this from
    * the dedup quality budget — how much near-dup leakage the corpus
    * tolerates vs how much candidate volume the cluster affords. */
  val TuneRetentionFloorMicro = 800000L

  /** Auto-tune acceptance floor (sim_autotune): the cheapest IVF cell
    * count whose measured recall@3 over the probe panel is at least this
    * (in millionths) is recommended and applied. Production sets this
    * from the retrieval quality budget — recall tolerated vs candidates
    * scanned per query (IVF's one knob trades exactly these two). */
  val SimTuneRecallFloorMicro = 760000L

  /** Random-hyperplane signature width (sim_ann_lsh / sim_multiprobe /
    * sim_range / dedup_embed): 2^planes buckets; per-bucket population —
    * and the quadratic term of in-bucket passes — shrinks by 2× per plane.
    * Single-table recall at angle θ is (1−θ/π)^planes; production raises
    * recall with L independent tables (or Hamming-1 multiprobe, which
    * sim_multiprobe implements), not by shrinking planes. */
  val HyperplanePlanes = 4

  /** IVF coarse-quantizer cells (sim_ivf): ~corpus/cells vectors scanned
    * per probe. Production uses √corpus cells and probes the top-nprobe
    * cells; the Lloyd-fit iteration count trades centroid quality for
    * fit passes (each is one corpus scan + tiny broadcast update). */
  val IvfCells = 8
  val KMeansIters = 2

  /** "Today's vectors" slice for the standing ANN index lifecycle
    * (sim_index_maintain): vec_id % AnnDeltaMod == AnnDeltaRem plays the
    * day's new embeddings, appended into the persisted IVF index against
    * FROZEN centroids — production refits the coarse quantizer on a
    * schedule (weekly/monthly), never per append, so the day's arrivals
    * must land in yesterday's cell geometry. Rem = 9 keeps both the seed
    * vectors (vec_id < IvfCells = 8) and the probe set (vec_id < 5) in
    * the base corpus, so the day-0 fit is well-defined. */
  val AnnDeltaMod = 10L
  val AnnDeltaRem = 9L

  /** Candidate-set depth for two-stage retrieval (sim_refine): the IVFPQ
    * ADC ranking generates this many candidates per probe on 8-byte codes;
    * only their raw vectors are fetched for the exact re-score. The knob is
    * the recall/fetch-cost dial: production IVFADC+refine runs shortlists
    * of 10–100× the final k — 10 here against k=3 sits in that band while
    * keeping the fixture's per-cell populations meaningful. */
  val AnnRefineShortlist = 10L

  /** Round budget for iterate-to-fixpoint connected components
    * (dedup_cluster / graph_cc) — a safety valve, not the semantics:
    * iteration stops when a round changes zero labels, and overrunning
    * raises rather than emitting unconverged components. With the
    * pointer-jump step convergence is O(log diameter), so 20 covers
    * diameters past a million. */
  val MaxCcRounds = 20

  /** Training-sequence window geometry (text_chunk / pipeline_curate):
    * production values are model context dependent (e.g. 2048/2040);
    * the 32/24 fixture pair keeps every doc multi-chunk. */
  val ChunkLen = 32
  val ChunkStride = 24

  /** Learned merge-table size for text_bpe — production BPE vocabularies
    * run 32k–100k merges; 20 keeps the oracle's unrolled replace chain
    * readable while exercising the same learn→broadcast→apply shape. */
  val BpeMerges = 20

  /** Feature-table size for quality_classifier's Naive-Bayes token model.
    * Production classifier gates (fastText-style) keep 64k–1M hashed or
    * ranked features — always broadcast-sized; the fixture corpus has a
    * ~31-token vocabulary so 50 keeps every token while exercising the
    * same rank-truncate→broadcast shape. */
  val NbVocab = 50

  /** Training-sequence capacity for pipeline_pack (concat-then-chunk
    * sequence packing): production = model context (2048/4096/8192);
    * 64 keeps fixture sequences multi-doc. Packing windows partition on
    * (lang, shard) — `shard = doc_id div PackShardDocs` — because a lang
    * alone is NOT a bounded unit (one language can be most of a 100 TB
    * corpus, and a per-lang window would pack it on one reducer);
    * production shards are input splits/files, and each packs
    * independently. 100 fixture docs/shard keeps shards multi-sequence. */
  val PackCapacity = 64L
  val PackShardDocs = 100L

  /** Rare-shingle blocking cap for dedup_containment's candidate pass: two
    * docs pair when they share a shingle with document frequency in
    * [2, cap]. Bounds per-shingle pair fan-out at cap² (candidate volume
    * linear in the rare-posting mass at any corpus size); raising it
    * trades candidate volume for containment recall — a pair ALL of whose
    * shared shingles are corpus-common is missed, the standard
    * posting-list prefix-filter bound. */
  val ContainDfCap = 10L

  /** Semantic-dedup drop budget (dedup_semantic): within each embedding
    * cluster, the top ceil(n/SemDedupDenom) most-similar pairs mark their
    * higher-id member dropped — the budget form of SemDeDup's threshold
    * sweep ("dedup ε of the corpus"), and integer arithmetic so the
    * boundary is engine-exact. Production sweeps ε against downstream
    * eval; the per-cell budget keeps the rank window partitioned (no
    * global ordering at scale). */
  val SemDedupDenom = 20L

  /** Structure-function lag grid (lc_structfunc): pair magnitudes within
    * `SfLagBins × SfLagBinSec` of each other, binned by integer lag. The
    * max lag is also the pair-join time-bucket width, so per-pair cost is
    * bounded by observations-per-window, never the full series length —
    * the knob that keeps the quadratic pair pass linear at survey scale.
    * Fixture events span 30 days; 7 × 1-day bins populates every bin. */
  val SfLagBinSec = 86400L
  val SfLagBins = 7L

  /** Co-occurrence support threshold for graph_triangles' edge set: a part
    * pair becomes an edge only if co-purchased in >= this many orders.
    * The sparsifier that keeps a co-occurrence graph from densifying as
    * the corpus grows — production tunes it so expected pair support under
    * independence stays well below the cut (pair instances are bounded
    * per order by items², so the counting pass itself is always linear
    * in orders). 2 keeps all three fixture scales non-empty (3810/96/6
    * triangles). */
  val TriangleSupport = 2L

  /** Temperature-mix exponent for sample_temperature is FIXED at α = 1/2,
    * not a knob: the keep-threshold floor(sqrt(n_ref/n)·1e6) is
    * bit-identical across engines only because sqrt and divide are IEEE
    * correctly-rounded everywhere — an arbitrary pow(n, α) is not. To
    * change the temperature, change the closed form (e.g. α = 1/4 is
    * sqrt(sqrt(x))), never to pow(). The keep-hash modulus below pairs
    * with the 1e6 threshold scale. */
  val TempSampleModulus = 1000000L

  /** pipeline_shard: number of output shards the curated corpus splits
    * into. 8 is fixture-sized; production sets it to target-file-size /
    * corpus-size. The balance property is independent of the count. */
  val ShardCount = 8L

  /** pipeline_dataloader: loader-worker count (each worker consumes its
    * own shard of every epoch's permutation) and per-batch token budget.
    * Production: workers = data-parallel ranks × loader threads, budget =
    * tokens per optimizer step per rank (4M-token global batches at 100 TB
    * training runs). 4 × 256 keeps every fixture shard multi-batch. */
  val LoaderWorkers = 4L
  val LoaderBatchTokens = 256L

  /** Mixture budget divisor for pipeline_mix: the training-run token
    * budget is tot/MixBudgetDen of the corpus. 1 (one full epoch,
    * rebalanced toward the uniform target) is the smallest divisor at
    * which every below-average fixture source trips the one-epoch cap —
    * measured: uniform per-source quota caps 0 sources at Den = 2 on all
    * three SFs, so the water-fill's redistribute branch would be dead
    * code there. The target-weight vector is uniform in the fixture;
    * production passes learned weights — the water-fill shape (cap at
    * one epoch, redistribute surplus) is weight-agnostic. */
  val MixBudgetDen = 1L

  /** DDSketch relative accuracy α for agg_pctile_reagg (Masson, Rim &
    * Lee, "DDSketch: a fast and fully-mergeable quantile sketch with
    * relative-error guarantees", VLDB 2019). Bucket i covers
    * (γ^(i−1), γ^i] with γ = (1+α)/(1−α); any quantile estimate is within
    * α relative error of the true value. α = 0.01 ⇒ γ ≈ 1.0202 ⇒ the
    * fixture's full [0.01, 500] value range spans ~540 buckets — the
    * per-(day, group) sketch state stays a few hundred rows no matter how
    * many raw rows fold into it, which is the entire point at 100 TB. */
  val DDSketchAlpha = 0.01

  /** dedup_suffix prefix-doubling depth: doubling rounds after the
    * single-token level, so the spectrum reports span lengths 1, 2, …,
    * 2^SuffixDoublings tokens. 6 ⇒ top level 64, just under the fixture's
    * 100-token max document (level 128 would be structurally empty).
    * Production raises this to cover its window of interest (levels past
    * every document's length are empty joins, cost ≈ 0). */
  val SuffixDoublings = 6

  /** dedup_suffix global position id stride: gid = doc_id·stride + pos.
    * 128 > the fixture's 100-token max doc. The gid only needs to be an
    * injective long per position (class representatives are min-gids, not
    * dense ranks); production packs doc_id<<24 | pos or widens to a
    * struct key. */
  val SuffixGidStride = 128L

  /** Incremental-maintenance split day (agg_incremental): the fixture's
    * stand-in for "the new partition" — events span 2024-01-01..30, so
    * day 19738 (2024-01-16) gives both sides real mass. Production passes
    * the delta's partition predicate here; the merge shape is invariant. */
  val IncrementalCutDay = 19738L

  /** PSI alert threshold for agg_drift's snapshot-over-snapshot
    * distribution monitor. Industry convention: < 0.1 stable, 0.1–0.25
    * moderate shift, > 0.25 action required. The fixture halves are drawn
    * from one generator, so 0.1 marks them stable — which is itself the
    * assertion: a drift monitor that alarms on same-distribution data is
    * miscalibrated. */
  val DriftPsiAlert = 0.1

  /** Delta slice for dedup_incremental: docs with
    * doc_id % DedupDeltaMod == DedupDeltaRem (~1/DedupDeltaMod of the
    * corpus) play "today's crawl" probing the remaining standing base.
    * Production replaces the modulus predicate with the delta partition's
    * ingest-date filter; the probe shape (broadcast delta bands vs the
    * standing signature table) is invariant. The remainder is chosen
    * non-zero so the slice is not also a power-of-two bit mask of any
    * fixture id pattern. */
  val DedupDeltaMod = 10L
  val DedupDeltaRem = 7L

  /** Second delta slice for `dedup_index_maintain` — "tomorrow's crawl"
    * (doc_id % DedupDeltaMod == DedupDelta2Rem), probed AFTER yesterday's
    * slice was appended into the standing index. Distinct from
    * [[DedupDeltaRem]] so the append demonstrably changes what the probe
    * can hit: day-2 docs may now dedup against day-1 arrivals, which a
    * base-only index could not report. */
  val DedupDelta2Rem = 3L

  /** k-core peeling (graph_kcore): nodes of degree < KCoreK are removed
    * in rounds until fixpoint — the standard dense-subgraph filter before
    * community/motif work (and the co-purchase sibling of the triangle
    * pass: every triangle lives in the 2-core). Rounds are bounded by the
    * graph's peeling depth, NOT its size: each round removes every
    * current sub-k node in one partial-agg degree count + two semi-joins,
    * so the budget is a safety valve exactly like MaxCcRounds — overrun
    * raises, and the oracle unrolls exactly KCoreMaxRounds rounds (extra
    * rounds past fixpoint are no-ops, so the two engines agree whenever
    * Spark converges within budget). */
  val KCoreK = 2L
  val KCoreMaxRounds = 10

  /** Round budget for graph_label_prop's synchronous label propagation.
    * Unlike cc/kcore this is the TERMINATION RULE, not a safety valve:
    * LPA has no fixpoint guarantee (bipartite-ish regions oscillate
    * under synchronous update), so both engines run exactly this many
    * rounds — the same fixed-iteration discipline as graph_pagerank.
    * Production tunes it to label-stability plateau (typically < 10);
    * 3 separates the fixture graph's communities without saturating to
    * one label per component. */
  val LpRounds = 3

  /** graph_bfs: seed set = graph nodes ≡ 0 (mod this), and the hop budget.
    * 50 seeds ~2% of the co-purchase node set — sparse enough that hops
    * 1..3 each add a nontrivial frontier; 3 rounds is the family's
    * established bounded-iteration budget (cc/kcore/label_prop). */
  val BfsSeedMod = 50L
  val BfsRounds = 3

  /** Bucket count for table_histogram's equi-height histogram — the
    * selectivity-structure resolution a CBO trades against catalog size
    * (engines default 100–254 buckets). 8 keeps every fixture bucket
    * multi-valued over l_quantity's 50 distinct values so the
    * whole-value assignment discipline is visibly exercised. */
  val HistBuckets = 8

  /** Compaction target size for table_compact's bin-packing planner, in
    * the planner's byte-proxy units. Production = the lake's target file
    * size (e.g. 512 MB); the fixture proxy (row-count·100) makes multi-
    * file bins at every scale. The planner is metadata-only — cost scales
    * with file COUNT, not data volume. */
  val CompactTargetBytes = 4000L

  /** mm_scenecut: a frame boundary is a scene CUT when the absolute
    * difference of adjacent frames' integer byte sums exceeds this.
    * Calibrated to the fixture's delta distribution (median 52, p90 123)
    * so cuts fire on ~10% of transitions — the sparse-boundary regime
    * real scene detection targets; production replaces the byte-sum
    * signature with a perceptual frame feature, not the machinery. */
  val SceneCutDelta = 120L
}
