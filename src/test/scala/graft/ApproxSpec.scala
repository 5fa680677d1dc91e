package graft

import org.apache.spark.sql.functions._

/** Tolerance checks for the two approximate aggregates that (by design,
  * SURVEY §2.4) carry no DuckDB oracle: sketch output is engine-specific, so
  * the correctness contract is |approx − exact| ≤ ε against the exact
  * aggregate computed in the SAME engine. */
class ApproxSpec extends SparkSpec {

  test("agg_approx_pctile: approx percentiles sit inside a quantile bracket of the exact CDF") {
    val approx = SparkEntry.queries("agg_approx_pctile")(spark, sf)
      .select("event_type", "approx_median", "approx_p90")
    // Exact quantile brackets per group: percentile_approx at accuracy 1000
    // has rank error ≤ n/1000 (< 1 rank at the fixture sizes), so the approx
    // value must land within a generous ±0.05 quantile window.
    val brackets = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(
        expr("percentile(value, 0.45)").as("q45"),
        expr("percentile(value, 0.55)").as("q55"),
        expr("percentile(value, 0.85)").as("q85"),
        expr("percentile(value, 0.95)").as("q95"))
    val rows = approx.join(brackets, "event_type").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (m, p90) = (r.getAs[Double]("approx_median"), r.getAs[Double]("approx_p90"))
      assert(m >= r.getAs[Double]("q45") && m <= r.getAs[Double]("q55"),
        s"${r.getString(0)}: approx_median $m outside [q45, q55]")
      assert(p90 >= r.getAs[Double]("q85") && p90 <= r.getAs[Double]("q95"),
        s"${r.getString(0)}: approx_p90 $p90 outside [q85, q95]")
    }
  }

  test("agg_sketch_reagg: daily-sketch merge ≡ direct sketch, both ≈ exact") {
    val merged = SparkEntry.queries("agg_sketch_reagg")(spark, sf)
      .select("event_type", "approx_users")
    // Same sketch config ⇒ merging per-day sketches must give EXACTLY the
    // state (and estimate) of one pass over all rows — the mergeability
    // contract that makes the daily pre-aggregate lossless.
    val direct = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("direct_users"))
    val exact = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_users"))
    val rows = merged.join(direct, "event_type").join(exact, "event_type").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (m, d, e) = (r.getAs[Long]("approx_users"),
        r.getAs[Long]("direct_users"), r.getAs[Long]("exact_users"))
      assert(m === d, s"${r.getString(0)}: merged $m ≠ direct $d (mergeability broken)")
      assert(math.abs(m - e).toDouble / e <= 0.10,
        s"${r.getString(0)}: sketch $m vs exact $e (>10% off)")
    }
  }

  test("agg_theta_sketch: shard-merge ≡ direct sketch EXACTLY, and the " +
      "declared query's estimates sit within tolerance of the exact counts " +
      "it carries") {
    val k = 512
    val aud = operators.Aggregates.thetaAudiences(spark, sf)
    val direct = operators.Aggregates.thetaSamples(aud, k)
      .select("aud", "hv").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    // Mergeability law: a global bottom-k element is inside its shard's
    // bottom-k, so sharded build + union + re-rank must reproduce the
    // direct sketch STATE exactly — same (aud, hv) rows, hence the same θ
    // and the same every-downstream-estimate.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("aud").orderBy("hv")
    val merged = (0L to 1L)
      .map(p => operators.Aggregates.thetaSamples(
        aud.where(pmod(col("id"), lit(2L)) === p), k))
      .reduce(_ unionAll _)
      .select("aud", "hv").distinct()
      .withColumn("rk", row_number().over(w)).where(col("rk") <= k)
      .select("aud", "hv").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(merged === direct,
      "sharded theta sketches did not merge to the direct sketch state")
    // The declared query require's the exact set-algebra identities and
    // the 25% bound in-query; execute it and sanity-check the carried
    // exact counts against an independent reconstruction.
    val rows = SparkEntry.queries("agg_theta_sketch")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toMap
    assert(rows.keySet === Set("a", "b", "union", "intersect", "a_minus_b"))
    val eA = rows("a")._3; val eB = rows("b")._3
    val eU = rows("union")._3; val eI = rows("intersect")._3
    assert(eU === eA + eB - eI, "exact counts violate inclusion-exclusion")
    assert(rows("a_minus_b")._3 === eA - eI, "exact counts violate partition")
    rows.foreach { case (m, (_, est, exact)) =>
      assert(math.abs(est / exact - 1.0) <= 0.25,
        s"$m: theta estimate $est vs exact $exact (>25% off)")
    }
  }

  test("agg_pctile_reagg: daily DDSketch merge ≡ direct sketch, both within α of exact") {
    val merged = SparkEntry.queries("agg_pctile_reagg")(spark, sf)
    // Mergeability law: bucket-wise sum is associative/commutative, so the
    // per-day-then-union sketch must equal the one-pass sketch EXACTLY —
    // same buckets, same counts, same estimates. Compare full rows.
    val direct = operators.Aggregates.ddSketchPctiles(spark, sf, perDay = false)
    assert(merged.collect().toSeq === direct.collect().toSeq,
      "merged per-day sketch ≠ direct one-pass sketch (mergeability broken)")
    // Accuracy law: DDSketch guarantees relative error ≤ α against the
    // value at the queried rank; allow 3α for the rank-convention gap vs
    // Spark's interpolating exact percentile().
    val tol = 3.0 * GraftConfig.DDSketchAlpha
    val exact = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("x50"),
        expr("percentile(value, 0.9)").as("x90"))
    val rows = merged.join(exact, "event_type").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p50, p90) = (r.getAs[Double]("approx_p50"), r.getAs[Double]("approx_p90"))
      val (x50, x90) = (r.getAs[Double]("x50"), r.getAs[Double]("x90"))
      assert(math.abs(p50 - x50) / x50 <= tol,
        s"${r.getString(0)}: p50 $p50 vs exact $x50 (> ${tol * 100}% off)")
      assert(math.abs(p90 - x90) / x90 <= tol,
        s"${r.getString(0)}: p90 $p90 vs exact $x90 (> ${tol * 100}% off)")
    }
  }

  test("agg_approx_distinct: HLL estimate within 10% of exact count distinct") {
    val approx = SparkEntry.queries("agg_approx_distinct")(spark, sf)
    val exact = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact_parts"))
    val rows = approx.join(exact, "l_returnflag").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val a = r.getAs[Long]("approx_parts").toDouble
      val e = r.getAs[Long]("exact_parts").toDouble
      assert(math.abs(a - e) / e <= 0.10,
        s"${r.getString(0)}: approx $a vs exact $e (>10% off)")
    }
  }
}
