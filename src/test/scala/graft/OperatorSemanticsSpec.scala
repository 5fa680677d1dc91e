package graft

import graft.Rnd.rnd
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Hand-computed expected results on tiny in-memory frames for the operators
  * with nontrivial semantics (SURVEY §5.3 #1). */
class OperatorSemanticsSpec extends SparkSpec {

  private val s0 = TestSession.spark
  import s0.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("rnd: engine-portable rounding matches half-up on representable cases") {
    val df = Seq(2.5, 3.5, 2.675, 33187.24395, -5.125).toDF("x")
      .select(rnd(col("x"), 2).as("r2"), rnd(col("x"), 0).as("r0"),
        rnd(col("x"), 4).as("r4"))
    val rows = df.collect()
    assert(rows.map(_.getDouble(1)).toSeq === Seq(3.0, 4.0, 3.0, 33187.0, -5.0))
    // binary-boundary case: floor(33187.24395*1e4+0.5) = 331872439 (the
    // value is actually ...94999 in binary) — NOT BigDecimal's 33187.244
    assert(rows(3).getDouble(2) === 33187.2439)
  }

  test("as-of join idiom: latest order at-or-before, orderkey tiebreak") {
    val orders = Seq(
      (1L, "2020-01-01", 100L), (1L, "2020-01-10", 101L),
      (1L, "2020-01-10", 102L), (2L, "2020-06-01", 200L))
      .toDF("k", "d", "o_orderkey")
      .select(col("k"), col("d").cast("date").as("d"), col("o_orderkey"))
    val events = Seq(
      (1L, "2020-01-10", 9001L), // same-day: picks max orderkey 102
      (1L, "2020-01-05", 9002L), // between: picks 100
      (2L, "2020-05-31", 9003L), // before any order of k=2: null → dropped
      (2L, "2020-07-01", 9004L)) // after: 200
      .toDF("k", "d", "event_id")
      .select(col("k"), col("d").cast("date").as("d"), col("event_id"))
    val o = orders.select(col("k"), col("d"), lit(null).cast("long").as("event_id"),
      col("o_orderkey"), lit(0).as("tag"))
    val e = events.select(col("k"), col("d"), col("event_id"),
      lit(null).cast("long").as("o_orderkey"), lit(1).as("tag"))
    val w = Window.partitionBy("k")
      .orderBy(col("d").asc, col("tag").asc, col("o_orderkey").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val res = o.unionByName(e)
      .withColumn("asof", last(col("o_orderkey"), ignoreNulls = true).over(w))
      .where(col("tag") === 1 && col("asof").isNotNull)
      .select("event_id", "asof").as[(Long, Long)].collect().toMap
    assert(res === Map(9001L -> 102L, 9002L -> 100L, 9004L -> 200L))
  }

  test("range-join bucket idiom ≡ direct range predicate") {
    val e = spark.range(0, 200).select((col("id") % 97).as("e_day"), col("id").as("eid"))
    val o = spark.range(0, 20).select((col("id") * 7).as("d0_day"), col("id").as("oid"))
    // direct (small-scale reference semantics)
    val direct = e.crossJoin(o)
      .where(col("e_day") >= col("d0_day") && col("e_day") < col("d0_day") + 30)
      .groupBy("oid").count()
    // bucketed (the scalable idiom used by join_range)
    val eb = e.withColumn("bucket", floor(col("e_day") / 30))
    val ob = o.withColumn("bucket",
      explode(array_distinct(array(floor(col("d0_day") / 30),
        floor((col("d0_day") + lit(29)) / 30)))))
    val bucketed = eb.join(ob, Seq("bucket"))
      .where(col("e_day") >= col("d0_day") && col("e_day") < col("d0_day") + 30)
      .groupBy("oid").count()
    val d = direct.as[(Long, Long)].collect().toMap
    val b = bucketed.as[(Long, Long)].collect().toMap
    assert(b === d)
  }

  test("sessionization: 30-min gap splits sessions") {
    val df = Seq(
      (1L, "2024-01-01 00:00:00"), (1L, "2024-01-01 00:20:00"),
      (1L, "2024-01-01 01:00:00"), // 40min gap → new session
      (2L, "2024-01-01 09:00:00"))
      .toDF("user_id", "t")
      .select(col("user_id"), unix_timestamp(col("t").cast("timestamp")).as("sec"),
        monotonically_increasing_id().as("event_id"))
    val byUser = Window.partitionBy("user_id").orderBy(col("sec"), col("event_id"))
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sess = df
      .withColumn("new_sess",
        when(col("sec") - lag(col("sec"), 1).over(byUser) > 1800L, 1L)
          .when(lag(col("sec"), 1).over(byUser).isNull, 1L).otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess")).over(run))
      .groupBy("user_id", "sess_id").count()
      .as[(Long, Long, Long)].collect().toSet
    assert(sess === Set((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }

  test("minhash signature: identical docs collide, disjoint docs don't") {
    val docs = Seq(
      (1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "x y z w v u"))
      .toDF("doc_id", "text")
    // same shingle→min-hash pipeline shape as Dedup (one hash for brevity)
    val tok = docs.select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
    val dict = tok.select("tok").distinct()
      .withColumn("tok_id", row_number().over(Window.orderBy("tok")).cast("long"))
    val ids = tok.join(dict, "tok")
    val sh = ids.alias("a")
      .join(ids.alias("b"), expr("a.doc_id = b.doc_id AND b.pos = a.pos + 1"))
      .join(ids.alias("c"), expr("a.doc_id = c.doc_id AND c.pos = a.pos + 2"))
      .select(col("a.doc_id").as("doc_id"),
        (col("a.tok_id") * 1024 * 1024 + col("b.tok_id") * 1024 + col("c.tok_id")).as("s"))
    val sig = sh.groupBy("doc_id")
      .agg(min((col("s") * 1103515245L + 12345L) % 2147483647L).as("h"))
      .as[(Long, Long)].collect().toMap
    assert(sig(1L) === sig(2L))
    assert(sig(1L) !== sig(3L))
  }

  test("cosine: known vectors") {
    val df = Seq((Array(1.0, 0.0), Array(0.0, 1.0), 0.0),
      (Array(1.0, 2.0), Array(2.0, 4.0), 1.0),
      (Array(1.0, 0.0), Array(-1.0, 0.0), -1.0)).toDF("a", "b", "expect")
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val got = df.select(
      rnd(dot(col("a"), col("b")) / (sqrt(dot(col("a"), col("a"))) * sqrt(dot(col("b"), col("b")))), 6)
        .as("cos"), col("expect")).as[(Double, Double)].collect()
    got.foreach { case (c, e) => assert(c === e) }
  }

  test("weighted-mean aggregator matches arithmetic form") {
    val wm = udaf(graft.functions.WeightedMean,
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaDouble,
        org.apache.spark.sql.Encoders.scalaDouble))
    val df = Seq((1.0, 1.0), (3.0, 3.0), (10.0, 0.0)).toDF("v", "w")
    val got = df.agg(wm(col("v"), col("w")).as("m")).as[Double].head()
    assert(math.abs(got - 2.5) < 1e-12) // (1*1 + 3*3 + 0) / 4
  }

  test("magnitude expression: eval and codegen paths agree with formula") {
    graft.functions.Magnitude.register(spark)
    val df = Seq(100.0, 1.0, 0.01).toDF("flux")
      .select(col("flux"), expr("graft_mag(flux)").as("mag"),
        (lit(-2.5) * log10(col("flux")) + 25.0).as("expect"))
    df.as[(Double, Double, Double)].collect().foreach { case (_, m, e) =>
      assert(m === e)
    }
  }

  test("graft_dot expression: codegen loop ≡ interpreted eval ≡ lambda form") {
    graft.functions.DotProduct.register(spark)
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),   // 32.0
      (Array(0.1, 0.2), Array(0.3, 0.7)),              // FP-order-sensitive
      (Array.empty[Double], Array.empty[Double]))      // 0.0
      .toDF("a", "b")
    def lambdaDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    // Codegen path (projection over rows).
    val cg = df.select(expr("graft_dot(a, b)").as("d"),
      lambdaDot(col("a"), col("b")).as("e")).as[(Double, Double)].collect()
    cg.foreach { case (d, e) => assert(d === e) } // bit-identical, same IEEE order
    assert(cg(0)._1 === 32.0)
    // Interpreted path (eval outside codegen: filter condition forces eval
    // on the driver in constant folding? use explicit InterpretedProjection).
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, InterpretedProjection}
    import org.apache.spark.sql.types._
    val at = ArrayType(DoubleType)
    val proj = new InterpretedProjection(Seq(graft.functions.DotProduct(
      BoundReference(0, at, nullable = true), BoundReference(1, at, nullable = true))))
    val row = org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(1.0, 2.0, 3.0)),
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(4.0, 5.0, 6.0)))
    assert(proj(row).getDouble(0) === 32.0)
  }

  test("simhash: identical docs get identical signatures") {
    val q = SparkEntry.queries("dedup_simhash")
    val out = q(spark, sf).limit(5).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getLong(1) >= 0L && r.getLong(1) <= 255L))
  }

  test("sessionize idiom: gap flags accumulate into the expected session ids") {
    val t0 = 1000000L
    val e = Seq(
      (1L, 10L, t0),          // session 1
      (1L, 11L, t0 + 600),    // same session (gap 600 ≤ 1800)
      (1L, 12L, t0 + 3000),   // gap 2400 > 1800 → session 2
      (1L, 13L, t0 + 3001),   // session 2
      (2L, 20L, t0)           // new user → session 1
    ).toDF("user_id", "event_id", "t")
    val wl = Window.partitionBy("user_id").orderBy(col("t"), col("event_id"))
    val ids = e
      .withColumn("new_sess",
        when(col("t") - lag(col("t"), 1).over(wl) > 1800L, 1L)
          .when(lag(col("t"), 1).over(wl).isNull, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_sess")).over(
        wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("event_id", "session_id").as[(Long, Long)].collect().toMap
    assert(ids === Map(10L -> 1L, 11L -> 1L, 12L -> 2L, 13L -> 2L, 20L -> 1L))
  }

  test("hamming multi-index blocking finds exactly the brute-force Hamming≤2 pairs") {
    // 40 pseudo-random 16-bit signatures + engineered near pairs, including
    // the pigeonhole worst case: 2 flips split across 2 different blocks.
    val base = (0 until 40).map(i => (i.toLong, (i * 2654435761L) % 65536L))
    val near = Seq(
      (100L, 0x1234L), (101L, 0x1235L),          // hamming 1, same low block
      (102L, 0x0041L), (103L, 0x0840L),          // hamming 2 split across block 0 and 1
      (104L, 0x8001L), (105L, 0x0801L)           // hamming 2 split across block 2 and 1
    )
    val sig = (base ++ near).toDF("doc_id", "sh")
    val brute = sig.as("a").crossJoin(sig.as("b"))
      .where(col("a.doc_id") < col("b.doc_id") &&
        expr("bit_count(a.sh ^ b.sh)") <= 2)
      .select(col("a.doc_id"), col("b.doc_id"))
      .as[(Long, Long)].collect().toSet
    val blk = Seq(
      sig.select(col("doc_id"), col("sh"), lit(0L).as("bi"), (col("sh") % 64L).as("bv")),
      sig.select(col("doc_id"), col("sh"), lit(1L).as("bi"), expr("(sh div 64) % 32").as("bv")),
      sig.select(col("doc_id"), col("sh"), lit(2L).as("bi"), expr("sh div 2048").as("bv"))
    ).reduce(_ unionByName _)
    val blocked = blk.as("a")
      .join(blk.as("b"), Seq("bi", "bv"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        col("a.sh").as("h1"), col("b.sh").as("h2")).distinct()
      .where(expr("bit_count(h1 ^ h2)") <= 2)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(blocked === brute, "blocking missed or fabricated a Hamming≤2 pair")
    assert(brute.contains((102L, 103L)) && brute.contains((104L, 105L)),
      "engineered split-block pairs absent from the reference set")
  }

  test("interval-overlap bucket idiom ≡ direct overlap predicate") {
    val a = spark.range(0, 60).select(col("id").as("aid"),
      (col("id") * 313 % 5000).as("a_s")).withColumn("a_e", col("a_s") + 900L)
    val b = spark.range(0, 60).select(col("id").as("bid"),
      (col("id") * 197 % 5000).as("b_s")).withColumn("b_e", col("b_s") + 450L)
    val direct = a.crossJoin(b)
      .where(col("a_s") < col("b_e") && col("b_s") < col("a_e"))
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    val ab = a.withColumn("bk", explode(sequence(expr("a_s div 900"), expr("a_e div 900"))))
    val bb = b.withColumn("bk", explode(sequence(expr("b_s div 900"), expr("b_e div 900"))))
    val bucketed = ab.join(bb, "bk")
      .where(col("a_s") < col("b_e") && col("b_s") < col("a_e"))
      .select("aid", "bid").distinct().as[(Long, Long)].collect().toSet
    assert(bucketed === direct)
  }

  test("pagerank: ranks sum to ~1 over a closed graph and favor the heavy sink") {
    // 3 nodes, all out-weight flows to node 2 except node 2 → node 0.
    val edges = Seq((0L, 2L, 1.0), (1L, 2L, 1.0), (2L, 0L, 1.0)).toDF("src", "dst", "frac")
    val nodes = Seq(0L, 1L, 2L).toDF("node")
    var pr = nodes.withColumn("p", lit(1.0 / 3))
    for (_ <- 1 to 3) {
      val contrib = edges.join(pr.withColumnRenamed("node", "src"), "src")
        .groupBy("dst").agg(sum(col("p") * col("frac")).as("c"))
      pr = nodes.join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"), (lit(0.05) + lit(0.85) * coalesce(col("c"), lit(0.0))).as("p"))
    }
    val ranks = pr.as[(Long, Double)].collect().toMap
    assert(math.abs(ranks.values.sum - 1.0) < 1e-9, "closed graph must conserve mass")
    assert(ranks(2L) > ranks(0L) && ranks(0L) > ranks(1L),
      "rank order must follow link structure (2 receives two in-links, 1 none)")
  }

  test("lc_structfunc: time-bucketed pair join ≡ naive range self-join") {
    // The bucketing trick (later side explodes into own+previous max-lag
    // bucket) must produce EXACTLY the pairs of the quadratic self-join it
    // replaces — every qualifying pair in exactly one bucket pairing, no
    // duplicates, no misses.
    val winS = GraftConfig.SfLagBinSec * GraftConfig.SfLagBins
    val obs = Tables.events(spark, sf)
      .where(col("value") > 0.0)
      .select(col("user_id"), unix_timestamp(col("ts")).as("t"),
        (lit(-2.5) * log10(col("value")) + 25.0).as("mag"))
    val naive = obs.toDF("user_id", "t1", "m1")
      .join(obs.toDF("user_id", "t2", "m2"), "user_id")
      .where(col("t2") > col("t1") && col("t2") - col("t1") < winS)
      .withColumn("lag_days", expr(s"(t2 - t1) div ${GraftConfig.SfLagBinSec}"))
      .withColumn("dm", col("m2") - col("m1"))
      .groupBy("user_id", "lag_days")
      .agg(count(lit(1)).as("n_pairs"),
        rnd(avg(abs(col("dm"))), 6).as("sf_abs"),
        rnd(avg(col("dm") * col("dm")), 6).as("sf_sq"))
    val got = SparkEntry.queries("lc_structfunc")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val want = naive.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(got.keySet === want.keySet, "pair-bin coverage differs from the naive join")
    got.foreach { case (k, (n, a, q)) =>
      val (nw, aw, qw) = want(k)
      assert(n === nw, s"$k: pair count differs (bucketing dropped/duplicated pairs)")
      assert(math.abs(a - aw) < 1e-9 && math.abs(q - qw) < 1e-9, s"$k: SF value differs")
    }
  }

  test("lc_smooth: HOF fold reproduces the scalar EWMA recurrence exactly") {
    // Recompute the per-step-rounded recurrence in plain Scala from the
    // same fixture series — bit-identical IEEE ops, so the comparison is
    // exact equality, no tolerance.
    def grid(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val series = Tables.events(spark, sf)
      .where(col("value") > 0.0)
      .select(col("user_id"), col("ts"), col("event_id"),
        rnd(lit(-2.5) * log10(col("value")) + 25.0, 6).as("mag"))
      .collect()
      .map(r => (r.getLong(0), (r.getTimestamp(1), r.getLong(2), r.getDouble(3))))
      .groupBy(_._1)
      .view.mapValues(_.map(_._2)
        .sortBy(t => (t._1.toInstant.getEpochSecond, t._1.toInstant.getNano, t._2))
        .map(_._3).toSeq)
      .toMap
    val got = SparkEntry.queries("lc_smooth")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    series.foreach { case (u, ms) =>
      val want = ms.tail.foldLeft(ms.head)((acc, m) => grid((acc + m) / 2))
      assert(got(u) === want, s"user $u: fold diverged from the scalar recurrence")
    }
  }

  test("dedup_semantic: per-cell drop budget respected; every vector classified once") {
    val rows = SparkEntry.queries("dedup_semantic")(spark, sf).collect()
    val n = Tables.embeddings(spark, sf).count()
    assert(rows.length.toLong === n, "exactly one keep/drop decision per vector")
    rows.groupBy(_.getLong(1)).foreach { case (cell, rs) =>
      // top ceil(n_c/denom) pairs can mark at most that many distinct members
      val budget = (rs.length + GraftConfig.SemDedupDenom - 1) / GraftConfig.SemDedupDenom
      val dropped = rs.count(_.getBoolean(2))
      assert(dropped <= budget, s"cell $cell dropped $dropped > budget $budget")
    }
    assert(rows.exists(_.getBoolean(2)), "budget must actually fire on the fixture")
  }

  test("pipeline_pack law: sequences tile each (lang, shard) token stream exactly") {
    val out = SparkEntry.queries("pipeline_pack")(spark, sf).collect()
    val shardTot = Tables.documents(spark, sf)
      .select(col("lang"), expr(s"doc_id div ${GraftConfig.PackShardDocs}").as("shard"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .groupBy("lang", "shard").agg(sum("n").as("tot")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    out.groupBy(r => (r.getString(0), r.getLong(1))).foreach { case (key, rs) =>
      assert(rs.map(_.getLong(4)).sum === shardTot(key),
        s"$key: packed tokens != shard tokens (lost or double-counted spans)")
      val seqs = rs.sortBy(_.getLong(2))
      seqs.init.foreach(r => assert(r.getLong(4) === GraftConfig.PackCapacity,
        s"$key seq ${r.getLong(2)}: interior sequence not full — packing leaked padding"))
      assert(seqs.last.getLong(4) <= GraftConfig.PackCapacity)
    }
  }

  test("dedup_suffix: prefix-doubling spectrum ≡ brute-force substring grouping") {
    // The strongest law the construction admits: for every reported level
    // L, the sparse-doubling spectrum must equal direct grouping of ALL
    // exact L-token substrings (no ranks, no doubling, no pruning —
    // semantics only). Brute force is O(positions × levels), fine at the
    // spec fixture scale.
    val declared = SparkEntry.queries("dedup_suffix")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    (0 to GraftConfig.SuffixDoublings).foreach { k =>
      val L = 1L << k
      val row = docs
        .select(col("doc_id"), col("toks"),
          posexplode(col("toks")).as(Seq("p0", "t")))
        .where(col("p0") + L <= size(col("toks")))
        .select(col("doc_id"),
          array_join(slice(col("toks"), col("p0") + 1, lit(L)), " ").as("gram"))
        .groupBy("gram")
        .agg(count(lit(1)).as("n"),
          min("doc_id").as("d0"), max("doc_id").as("d1"))
        .where(col("d0") =!= col("d1"))
        .agg(coalesce(sum("n"), lit(0L)).cast("long"),
          count(lit(1)),
          coalesce(max("n"), lit(0L)).cast("long"))
        .collect()(0)
      val brute = (row.getLong(0), row.getLong(1), row.getLong(2))
      assert(declared(L) === brute,
        s"level $L: doubling ${declared(L)} ≠ brute-force $brute")
    }
  }

  test("quality_classifier: one calibrated score per doc, grid-exact decision") {
    val res = SparkEntry.queries("quality_classifier")(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(res.length.toLong === nDocs, "exactly one score per document")
    assert(res.map(_.getLong(0)).distinct.length === res.length, "doc_id unique")
    res.foreach { r =>
      assert(r.getBoolean(3) === (r.getDouble(2) > 0.0),
        "pred must be the sign of the ROUNDED score (grid-exact boundary)")
    }
    // The distilled model must separate the classes on the fixture: both
    // decisions present, and scores span both signs.
    val preds = res.map(_.getBoolean(3)).toSet
    assert(preds === Set(true, false), "classifier is degenerate on the fixture")
  }

  test("pipeline_recipe: a source whose every doc fails the gate still reports, zeroed") {
    // Round-7 ADVICE regression lock: the rollup must run over ALL flagged
    // rows with selection gated in the conditional sums — a pre-filter on
    // `kept` would drop a zero-kept source from the groupBy entirely while
    // the oracle's LEFT JOIN emits it with n_sel = 0. The driver fixtures
    // cannot exercise this (every source has kept docs), so build a mini
    // corpus: source "good" passes the gate, source "allbad" never does
    // (every doc under the 20-token floor).
    val dir = java.nio.file.Files.createTempDirectory("recipe_edge").toString
    val goodText = (1 to 30).map(i => if (i % 10 == 0) "the" else f"tk$i%03d").mkString(" ")
    val rows = Seq(
      (0L, goodText + " alpha", "en", "good"),
      (1L, goodText + " beta", "en", "good"),
      (2L, goodText + " gamma", "en", "good"),
      (3L, "too short", "en", "allbad"),
      (4L, "also tiny", "en", "allbad"))
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("pipeline_recipe")(spark, dir).collect()
    assert(out.length === 2, s"both sources must report; got ${out.length} rows")
    val bad = out.find(_.getString(0) == "allbad")
      .getOrElse(fail("zero-kept source vanished from the funnel"))
    assert(bad.getLong(1) === 2L, "n_raw counts every raw doc")
    assert(Seq(2, 3, 4, 6).map(bad.getLong) === Seq(0L, 0L, 0L, 0L),
      "gated/kept/avail/sel must all be zero for the all-failing source")
    assert(bad.getLong(5) === 0L, "rate_micro must be 0 when avail_tok is 0 (no div-by-zero)")
    val good = out.find(_.getString(0) == "good").get
    assert(good.getLong(1) === 3L && good.getLong(2) === 3L,
      "control source gates all docs")
  }
}
