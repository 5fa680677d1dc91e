package graft.operators

import graft.Rnd.rnd
import graft.{QDef, Tables => T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.3 Joins.
  *
  * Scale notes (100 TB):
  *  - Equi joins shuffle both sides on the key → sort-merge or shuffled-hash;
  *    AQE re-plans to broadcast when a side turns out small.
  *  - Dimension joins (`join_broadcast`) force `broadcast()` — region/nation
  *    are O(KB) forever, the fact side never shuffles.
  *  - The theta join keeps both inputs pre-filtered tiny so the unavoidable
  *    nested-loop stays bounded regardless of fact-table growth.
  *  - The range join uses the bucket-key idiom: a computed equi key (30-day
  *    bucket, window spans at most 2 buckets) + residual predicate, so it is
  *    a shuffle hash/SMJ join, never an O(n²) cross product. This is the same
  *    shape a sky cross-match takes at scale (HEALPix cell = bucket).
  *  - The as-of join is the union + running-`last` idiom: one shuffle on the
  *    key, one sort — O(n log n), no candidate blow-up, the scalable form of
  *    "nearest epoch at or before" matching.
  */
object Joins {

  /** The adaptive final plan of join_skew_aqe's last execution. The QDef
    * returns the already-computed aggregate as a LOCAL relation (the AQE
    * engagement pin inside it had to execute the join; re-running it at
    * harness materialization would double-charge the bench), which hides
    * the adaptive plan from the returned frame — this hook keeps the
    * independent PlanShapeSpec re-assertion possible. */
  @volatile private[graft] var lastSkewAqePlan: String = ""

  /** Zones-algorithm sky match set (a_id, b_id, dist_deg ≤ 5°) — shared by
    * `join_sky` (all pairs) and `join_sky_nn` (nearest per a-side source).
    * See the join_sky QDef comment for the algorithm and parity notes. */
  private def skyMatches(s: SparkSession, dir: String): DataFrame = {
    val r = 5.0 // match radius (deg) = zone height
    def ra(key: Column, m: Long): Column =
      ((key * m) % 36000L).cast("double") / lit(100.0)
    def dec(key: Column, m: Long): Column =
      ((key * m) % 18001L).cast("double") / lit(100.0) - lit(90.0)
    val a = T.customer(s, dir).select(
      col("c_custkey").as("a_id"),
      ra(col("c_custkey"), 7919L).as("a_ra"),
      dec(col("c_custkey"), 104729L).as("a_dec"))
      .withColumn("zone", floor((col("a_dec") + 90.0) / r).cast("long"))
    val b = T.supplier(s, dir).select(
      col("s_suppkey").as("b_id"),
      ra(col("s_suppkey"), 13007L).as("b_ra"),
      dec(col("s_suppkey"), 30011L).as("b_dec"))
      .withColumn("z0", floor((col("b_dec") + 90.0) / r).cast("long"))
      .withColumn("zone", explode(array(col("z0") - 1L, col("z0"), col("z0") + 1L)))
    // sin²: explicit x*x, NOT pow(x, 2) — Java Math.pow and C libm pow
    // are not bit-identical; multiplication is.
    val sd = sin(radians(col("a_dec") - col("b_dec")) / 2)
    val sr = sin(radians(col("a_ra") - col("b_ra")) / 2)
    val hav = // 2·asin(√(sin²(Δdec/2) + cos·cos·sin²(Δra/2))), degrees
      degrees(lit(2.0) * asin(sqrt(
        sd * sd +
          cos(radians(col("a_dec"))) * cos(radians(col("b_dec"))) * (sr * sr))))
    a.join(b, Seq("zone"))
      .where(abs(col("a_dec") - col("b_dec")) <= r)
      .withColumn("dist_deg", rnd(hav, 6))
      .where(col("dist_deg") <= r)
      .select(col("a_id"), col("b_id"), col("dist_deg"))
  }

  private val skyMatchesSql =
    """WITH a AS (
      |  SELECT c_custkey AS a_id,
      |    CAST((c_custkey * 7919) % 36000 AS DOUBLE) / 100.0 AS a_ra,
      |    CAST((c_custkey * 104729) % 18001 AS DOUBLE) / 100.0 - 90.0 AS a_dec
      |  FROM customer),
      |az AS (
      |  SELECT *, CAST(floor((a_dec + 90.0) / 5.0) AS BIGINT) AS zone FROM a),
      |b AS (
      |  SELECT s_suppkey AS b_id,
      |    CAST((s_suppkey * 13007) % 36000 AS DOUBLE) / 100.0 AS b_ra,
      |    CAST((s_suppkey * 30011) % 18001 AS DOUBLE) / 100.0 - 90.0 AS b_dec
      |  FROM supplier),
      |bz AS (
      |  SELECT b.*, CAST(floor((b_dec + 90.0) / 5.0) AS BIGINT) + d.dz AS zone
      |  FROM b CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dz) d),
      |matches AS (
      |  SELECT a_id, b_id, dist_deg FROM (
      |    SELECT a_id, b_id,
      |      floor((degrees(2.0 * asin(sqrt(
      |        sin(radians(a_dec - b_dec) / 2) * sin(radians(a_dec - b_dec) / 2) +
      |        cos(radians(a_dec)) * cos(radians(b_dec)) *
      |        (sin(radians(a_ra - b_ra) / 2) * sin(radians(a_ra - b_ra) / 2))
      |      )))) * 1e6 + 0.5) / 1e6 AS dist_deg
      |    FROM az JOIN bz USING (zone)
      |    WHERE abs(a_dec - b_dec) <= 5.0)
      |  WHERE dist_deg <= 5.0)""".stripMargin

  val defs: Seq[QDef] = Seq(

    QDef(
      "join_inner_eq",
      (s, dir) => {
        val o = T.orders(s, dir).where(col("o_totalprice") > 490000.0)
        val c = T.customer(s, dir)
        o.join(c, o("o_custkey") === c("c_custkey"), "inner")
          .select(col("o_orderkey"), col("c_custkey"), col("c_name"),
            rnd(col("o_totalprice"), 2).as("price"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, c_custkey, c_name, floor((o_totalprice) * 1e2 + 0.5) / 1e2 AS price
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |WHERE o_totalprice > 490000.0
             |ORDER BY o_orderkey""".stripMargin)),

    // Left outer + aggregate: unmatched customers keep count 0 / total 0.
    QDef(
      "join_left",
      (s, dir) => {
        val c = T.customer(s, dir)
        val o = T.orders(s, dir).where(col("o_totalprice") > 350000.0)
        c.join(o, c("c_custkey") === o("o_custkey"), "left")
          .groupBy(c("c_custkey"))
          .agg(count(col("o_orderkey")).as("n_big_orders"),
            rnd(coalesce(sum("o_totalprice"), lit(0.0)), 2).as("big_total"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, count(o_orderkey) AS n_big_orders,
             |  floor((coalesce(sum(o_totalprice), 0.0)) * 1e2 + 0.5) / 1e2 AS big_total
             |FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 350000.0) o
             |  ON c_custkey = o_custkey
             |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin)),

    // Right outer, row-level: unmatched right rows surface NULL left columns.
    QDef(
      "join_right",
      (s, dir) => {
        val o = T.orders(s, dir).where(col("o_totalprice") > 495000.0)
        val c = T.customer(s, dir).where(col("c_acctbal") < -900.0)
        o.join(c, o("o_custkey") === c("c_custkey"), "right")
          .select(col("c_custkey"), col("c_acctbal"), col("o_orderkey"))
          .orderBy(col("c_custkey").asc, col("o_orderkey").asc_nulls_first)
      },
      Some("""SELECT c_custkey, c_acctbal, o_orderkey
             |FROM (SELECT * FROM orders WHERE o_totalprice > 495000.0) o
             |RIGHT JOIN (SELECT * FROM customer WHERE c_acctbal < -900.0) c
             |  ON o_custkey = c_custkey
             |ORDER BY c_custkey ASC, o_orderkey ASC NULLS FIRST""".stripMargin)),

    // Full outer over two derived key sets; both null sides exercised.
    QDef(
      "join_full",
      (s, dir) => {
        val a = T.orders(s, dir).where(col("o_totalprice") > 480000.0)
          .select(col("o_custkey").as("k")).distinct()
        val b = T.customer(s, dir).where(col("c_acctbal") > 9900.0)
          .select(col("c_custkey").as("k")).distinct()
        a.join(b, a("k") === b("k"), "full")
          .select(
            coalesce(a("k"), b("k")).as("custkey"),
            a("k").isNotNull.as("has_big_order"),
            b("k").isNotNull.as("has_high_bal"))
          .orderBy("custkey")
      },
      Some("""SELECT coalesce(a.k, b.k) AS custkey,
             |  a.k IS NOT NULL AS has_big_order,
             |  b.k IS NOT NULL AS has_high_bal
             |FROM (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_totalprice > 480000.0) a
             |FULL JOIN (SELECT DISTINCT c_custkey AS k FROM customer WHERE c_acctbal > 9900.0) b
             |  ON a.k = b.k
             |ORDER BY custkey""".stripMargin)),

    // Left semi — EXISTS.
    QDef(
      "join_semi",
      (s, dir) => {
        val c = T.customer(s, dir)
        val o = T.orders(s, dir).where(col("o_totalprice") > 490000.0)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select("c_custkey", "c_name", "c_mktsegment")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o
             |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 490000.0)
             |ORDER BY c_custkey""".stripMargin)),

    // Left anti — NOT EXISTS.
    QDef(
      "join_anti",
      (s, dir) => {
        val c = T.customer(s, dir)
        val o = T.orders(s, dir).where(col("o_totalprice") > 400000.0)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer c
             |WHERE NOT EXISTS (SELECT 1 FROM orders o
             |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0)
             |ORDER BY c_custkey""".stripMargin)),

    // Broadcast dim joins: fact (customer) never shuffles; nation/region ship
    // to every executor. The explicit broadcast() hint pins the plan at any SF.
    QDef(
      "join_broadcast",
      (s, dir) => {
        val c = T.customer(s, dir)
        val n = T.nation(s, dir)
        val r = T.region(s, dir)
        c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(count(lit(1)).as("n_customers"),
            rnd(sum("c_acctbal"), 2).as("total_bal"))
          .orderBy("r_name")
      },
      Some("""SELECT r_name, count(*) AS n_customers, floor((sum(c_acctbal)) * 1e2 + 0.5) / 1e2 AS total_bal
             |FROM customer
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name ORDER BY r_name""".stripMargin)),

    // Pure theta (inequality-only) join; inputs pre-filtered tiny so the
    // BroadcastNestedLoop stays bounded at every scale factor.
    QDef(
      "join_theta",
      (s, dir) => {
        val sup = T.supplier(s, dir).where(col("s_acctbal") > 9500.0)
        val cust = T.customer(s, dir).where(col("c_acctbal") > 9500.0)
        sup.join(cust, sup("s_acctbal") < cust("c_acctbal"))
          .groupBy(col("s_suppkey"))
          .agg(count(lit(1)).as("n_richer_customers"),
            rnd(max("c_acctbal"), 2).as("max_cust_bal"))
          .orderBy("s_suppkey")
      },
      Some("""SELECT s_suppkey, count(*) AS n_richer_customers,
             |  floor((max(c_acctbal)) * 1e2 + 0.5) / 1e2 AS max_cust_bal
             |FROM (SELECT * FROM supplier WHERE s_acctbal > 9500.0) s
             |JOIN (SELECT * FROM customer WHERE c_acctbal > 9500.0) c
             |  ON s.s_acctbal < c.c_acctbal
             |GROUP BY s_suppkey ORDER BY s_suppkey""".stripMargin)),

    // Range/interval join via the bucket-key idiom (sky cross-match analogue).
    // Events are mapped onto the order-date domain deterministically; each
    // order window [d0, d0+30) covers ≤ 2 30-day buckets, so the join is an
    // equi join on bucket + residual predicate — no nested loop at any scale.
    QDef(
      "join_range",
      (s, dir) => {
        val epoch = lit("1970-01-01").cast("date")
        val e = T.events(s, dir)
          .where(col("event_type") === "purchase")
          .select(col("event_id"),
            date_add(lit("1995-01-01").cast("date"),
              (col("event_id") % 2000).cast("int")).as("e_date"))
          .withColumn("e_day", datediff(col("e_date"), epoch))
          .withColumn("bucket", floor(col("e_day") / 30))
        val o = T.orders(s, dir)
          .where(col("o_totalprice") > 450000.0)
          .select(col("o_orderkey"), col("o_orderdate").cast("date").as("d0"))
          .withColumn("d0_day", datediff(col("d0"), epoch))
          .withColumn("bucket",
            explode(array_distinct(array(
              floor(col("d0_day") / 30),
              floor((col("d0_day") + lit(29)) / 30)))))
        e.join(o, Seq("bucket"))
          .where(col("e_day") >= col("d0_day") && col("e_day") < col("d0_day") + 30)
          .groupBy("o_orderkey")
          .agg(count(lit(1)).as("n_events_in_window"))
          .orderBy("o_orderkey")
      },
      Some("""WITH e AS (
             |  SELECT event_id,
             |    DATE '1995-01-01' + CAST(event_id % 2000 AS INT) AS e_date
             |  FROM events WHERE event_type = 'purchase'),
             |o AS (
             |  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d0
             |  FROM orders WHERE o_totalprice > 450000.0)
             |SELECT o_orderkey, count(*) AS n_events_in_window
             |FROM e JOIN o ON e.e_date >= o.d0 AND e.e_date < o.d0 + 30
             |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin)),

    // 2-D sky cross-match [PK: the reference's (ra, dec) nearest-source
    // match], upgraded from join_range's 1-D band analogue to the real
    // zones algorithm: bucket declination into fixed-height zones, explode
    // ONE side (the smaller catalog) to its zone ±1 neighbors, equi-join on
    // the zone key, then apply the residual |Δdec| band and great-circle
    // (haversine) distance predicates. The plan is a shuffled equi-join —
    // never a nested loop — and the per-zone population bounds the
    // candidate set at any scale.
    //
    // Why dec-zones + ra RESIDUAL rather than a 2-D (dec, ra) grid cell:
    // this is the published zones-algorithm form — ra bucket width is only
    // valid scaled by 1/cos(dec), so a fixed 2-D grid with ±1 ra neighbors
    // silently DROPS true matches near the poles (Δra ≫ arc distance
    // there); the dec zone key already bounds candidates to a 2r-high band
    // and the distance predicate does the rest exactly. HEALPix cells (equal
    // -area, no polar pathology) are the drop-in upgrade for the bucket key
    // at survey scale; the join shape is unchanged.
    //
    // Coordinates are derived deterministically from the fixture keys
    // (multiplicative hash onto [0,360)×[-90,90]) — the fixtures carry no
    // sky columns; the join machinery is the operator under test. The
    // distance filter compares the ROUNDED distance so both engines decide
    // the boundary identically. Production note: a catalog spanning ra≈0/360
    // additionally duplicates a seam margin of one side; the fixtures'
    // synthetic coordinates make seam pairs identical in both engines, so
    // the oracle stays exact without it.
    QDef(
      "join_sky",
      (s, dir) => skyMatches(s, dir).orderBy("a_id", "b_id"),
      Some(s"""$skyMatchesSql
              |SELECT a_id, b_id, dist_deg FROM matches
              |ORDER BY a_id, b_id""".stripMargin)),

    // Nearest-neighbor sky cross-match [PK — lightcurator's cross-match
    // semantic: THE closest source, not all sources in the radius]: the
    // zones-join match set reduced to min-distance per a-side source
    // (rounded-distance order, b_id tiebreak). Same equi-join plan plus a
    // per-key window over the (small) match set; at scale the argmin is a
    // partial-aggregating max(struct) if match multiplicity grows.
    QDef(
      "join_sky_nn",
      (s, dir) => {
        val w = Window.partitionBy("a_id")
          .orderBy(col("dist_deg").asc, col("b_id").asc)
        skyMatches(s, dir)
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select(col("a_id"), col("b_id").as("nn_id"), col("dist_deg"))
          .orderBy("a_id")
      },
      Some(s"""$skyMatchesSql
              |SELECT a_id, b_id AS nn_id, dist_deg FROM (
              |  SELECT *, row_number() OVER (PARTITION BY a_id
              |    ORDER BY dist_deg ASC, b_id ASC) AS rn
              |  FROM matches)
              |WHERE rn = 1 ORDER BY a_id""".stripMargin)),

    // As-of join [PK: nearest-epoch match] via union + running last():
    // one shuffle on the key, one sort; per event, the latest order
    // (max (date, orderkey)) at or before the event's mapped date.
    QDef(
      "join_asof",
      (s, dir) => {
        val e = T.events(s, dir)
          .where(col("event_type") === "purchase")
          .select(
            (col("user_id") % 50).as("k"),
            date_add(lit("1995-01-01").cast("date"),
              (col("event_id") % 2000).cast("int")).as("d"),
            col("event_id"),
            lit(null).cast("long").as("o_orderkey"),
            lit(1).as("tag"))
        val o = T.orders(s, dir)
          .select(
            (col("o_custkey") % 50).as("k"),
            col("o_orderdate").cast("date").as("d"),
            lit(null).cast("long").as("event_id"),
            col("o_orderkey"),
            lit(0).as("tag"))
        val w = Window.partitionBy("k")
          .orderBy(col("d").asc, col("tag").asc, col("o_orderkey").asc_nulls_last)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        o.unionByName(e)
          .withColumn("asof_orderkey", last(col("o_orderkey"), ignoreNulls = true).over(w))
          .where(col("tag") === 1 && col("asof_orderkey").isNotNull)
          .select("event_id", "asof_orderkey")
          .orderBy("event_id")
      },
      Some("""WITH e AS (
             |  SELECT event_id, user_id % 50 AS k,
             |    DATE '1995-01-01' + CAST(event_id % 2000 AS INT) AS d
             |  FROM events WHERE event_type = 'purchase'),
             |o AS (
             |  SELECT o_orderkey, o_custkey % 50 AS k, CAST(o_orderdate AS DATE) AS d
             |  FROM orders),
             |c AS (
             |  SELECT e.event_id, o.o_orderkey,
             |    row_number() OVER (PARTITION BY e.event_id
             |      ORDER BY o.d DESC, o.o_orderkey DESC) AS rn
             |  FROM e JOIN o ON e.k = o.k AND o.d <= e.d)
             |SELECT event_id, o_orderkey AS asof_orderkey
             |FROM c WHERE rn = 1 ORDER BY event_id""".stripMargin)),

    // NEAREST as-of join (pandas merge_asof direction='nearest' / kdb wj):
    // each probe row pairs with the temporally CLOSEST build row in either
    // direction — the calibration-frame match-up (an observation calibrates
    // against the nearest reference exposure, before OR after). Same
    // union-tag idiom as join_asof — which makes the scale point: nearest
    // is NOT a second join, it is the SAME one shuffle with a second
    // window capture. Backward candidate = last order-struct over the
    // preceding frame (greatest (d, okey) ≤ probe — join_asof's pick);
    // forward candidate = first order-struct over the strictly-following
    // frame (least (d, okey) > probe; same-date orders sort BEFORE the
    // probe row via the tag, so they are backward candidates at distance
    // 0); the pick is min(integer day distance), ties to the backward
    // side (the as-of convention). All-integer distances — no FP
    // boundary. The oracle re-derives the same pick from a candidate
    // rank, so a wrong tiebreak anywhere hash-mismatches.
    QDef(
      "join_asof_nearest",
      (s, dir) => {
        val e = T.events(s, dir)
          .where(col("event_type") === "purchase")
          .select(
            (col("user_id") % 50).as("k"),
            date_add(lit("1995-01-01").cast("date"),
              (col("event_id") % 2000).cast("int")).as("d"),
            col("event_id"),
            lit(null).cast("long").as("o_orderkey"),
            lit(1).as("tag"))
        val o = T.orders(s, dir)
          .select(
            (col("o_custkey") % 50).as("k"),
            col("o_orderdate").cast("date").as("d"),
            lit(null).cast("long").as("event_id"),
            col("o_orderkey"),
            lit(0).as("tag"))
        val ord = Window.partitionBy("k")
          .orderBy(col("d").asc, col("tag").asc, col("o_orderkey").asc_nulls_last)
        val bwd = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // The forward capture as first() over (1 FOLLOWING, UNBOUNDED
        // FOLLOWING) is O(partition²): Spark's UnboundedFollowing frame
        // rescans forward from EVERY row (measured 11 s at sf0.1, the only
        // non-linear frame in the repo). The same value — least (d, tag,
        // okey) strictly after the current row — is last() over the
        // RUNNING frame of the exactly-reversed ordering, which the
        // engine maintains incrementally in O(partition).
        val revOrd = Window.partitionBy("k")
          .orderBy(col("d").desc, col("tag").desc, col("o_orderkey").desc_nulls_first)
        val fwd = revOrd.rowsBetween(Window.unboundedPreceding, -1L)
        val cand = when(col("o_orderkey").isNotNull,
          struct(col("d").as("od"), col("o_orderkey").as("okey")))
        o.unionByName(e)
          .withColumn("b", last(cand, ignoreNulls = true).over(bwd))
          .withColumn("f", last(cand, ignoreNulls = true).over(fwd))
          .where(col("tag") === 1)
          .withColumn("bdist", datediff(col("d"), col("b.od")).cast("long"))
          .withColumn("fdist", datediff(col("f.od"), col("d")).cast("long"))
          .withColumn("near", when(col("f").isNull
              || (col("b").isNotNull && col("bdist") <= col("fdist")),
            struct(col("b.okey"), col("bdist").as("dist")))
            .otherwise(struct(col("f.okey"), col("fdist").as("dist"))))
          // a probe with no candidate in EITHER direction yields a struct
          // of nulls (not a null struct) — test the field, not the wrapper
          .where(col("near.okey").isNotNull)
          .select(col("event_id"), col("near.okey").as("near_orderkey"),
            col("near.dist").as("day_dist"))
          .orderBy("event_id")
      },
      Some("""WITH e AS (
             |  SELECT event_id, user_id % 50 AS k,
             |    DATE '1995-01-01' + CAST(event_id % 2000 AS INT) AS d
             |  FROM events WHERE event_type = 'purchase'),
             |o AS (
             |  SELECT o_orderkey, o_custkey % 50 AS k, CAST(o_orderdate AS DATE) AS d
             |  FROM orders),
             |c AS (
             |  SELECT e.event_id, o.o_orderkey,
             |    CAST(abs(date_diff('day', o.d, e.d)) AS BIGINT) AS dist,
             |    row_number() OVER (PARTITION BY e.event_id
             |      ORDER BY abs(date_diff('day', o.d, e.d)) ASC,
             |        (o.d <= e.d) DESC,
             |        CASE WHEN o.d <= e.d THEN -o.o_orderkey
             |             ELSE o.o_orderkey END ASC) AS rn
             |  FROM e JOIN o ON e.k = o.k)
             |SELECT event_id, o_orderkey AS near_orderkey, dist AS day_dist
             |FROM c WHERE rn = 1 ORDER BY event_id""".stripMargin)),

    // LATERAL correlated subquery (SQL:1999 lateral derived table — the
    // ANSI spelling of "top-N per row"): for each qualifying customer, the
    // lateral body re-executes logically per outer row (here: that
    // customer's top-2 orders by price). The POINT is what Catalyst does
    // with it: DecorrelateInnerQuery rewrites the per-row LIMIT into a
    // rank-over-partition + one equi-join — the same plan a hand-written
    // win_topk_group query gets — so the declarative per-row form costs
    // ONE shuffle at 100 TB, never customer-count subquery executions
    // (the nested-loop reading is the semantics, not the execution).
    // Identical SQL runs on DuckDB (which decorrelates the same way).
    QDef(
      "join_lateral",
      (s, dir) => {
        T.customer(s, dir).createOrReplaceTempView("graft_lat_cust")
        T.orders(s, dir).createOrReplaceTempView("graft_lat_ord")
        s.sql("""SELECT c.c_custkey, l.o_orderkey, l.cents
                |FROM graft_lat_cust c, LATERAL (
                |  SELECT o_orderkey,
                |    CAST(floor(o_totalprice * 1e2 + 0.5) AS BIGINT) AS cents
                |  FROM graft_lat_ord o
                |  WHERE o.o_custkey = c.c_custkey
                |  ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2) l
                |WHERE c.c_acctbal > 9000.0
                |ORDER BY c.c_custkey, l.o_orderkey""".stripMargin)
      },
      Some("""SELECT c.c_custkey, l.o_orderkey, l.cents
             |FROM customer c, LATERAL (
             |  SELECT o_orderkey,
             |    CAST(floor(o_totalprice * 1e2 + 0.5) AS BIGINT) AS cents
             |  FROM orders o
             |  WHERE o.o_custkey = c.c_custkey
             |  ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2) l
             |WHERE c.c_acctbal > 9000.0
             |ORDER BY c.c_custkey, l.o_orderkey""".stripMargin)),

    // Skew-salted join: `events.event_type` has ~5 values over 100k+ rows —
    // a textbook hot-key join. Salting spreads each hot key over 16 shuffle
    // partitions (fact gets salt = event_id % 16; the dim replicates ×16 via
    // explode), so no single reducer owns a whole key. Semantically identical
    // to the unsalted join — the oracle is the plain form. (When the dim fits
    // in memory, broadcast is the better fix; salting is for dim-too-big +
    // skewed-fact, and AQE's skew-join split handles the residual cases.)
    QDef(
      "join_skew_salted",
      (s, dir) => {
        val e = T.events(s, dir)
          .withColumn("cents", rnd(col("value") * 100.0, 0).cast("long"))
          .withColumn("salt", col("event_id") % 16L)
        val dim = T.events(s, dir).select("event_type").distinct()
          .withColumn("w", length(col("event_type")).cast("long"))
        val saltedDim = dim.withColumn("salt", explode(sequence(lit(0L), lit(15L))))
        e.join(saltedDim, Seq("event_type", "salt"))
          .groupBy("event_type")
          .agg(max("w").as("w"), count(lit(1)).as("n"),
            sum("cents").as("sum_cents"))
          .orderBy("event_type")
      },
      Some("""WITH dim AS (
             |  SELECT DISTINCT event_type, CAST(length(event_type) AS BIGINT) AS w
             |  FROM events)
             |SELECT e.event_type, max(d.w) AS w, count(*) AS n,
             |  CAST(sum(CAST(floor((value * 100.0) * 1e0 + 0.5) / 1e0 AS BIGINT)) AS BIGINT) AS sum_cents
             |FROM events e JOIN dim d ON e.event_type = d.event_type
             |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin)),

    // NULL-SAFE equi-join (`<=>` / ANSI IS NOT DISTINCT FROM): NULL join
    // keys MATCH each other instead of silently dropping — the semantics a
    // curation pipeline needs when "unknown" is itself a join category
    // (unattributed events rolling up to an 'unknown' dim row; a plain
    // equi-join would lose every such row and the totals would silently
    // shrink). Spark plans EqualNullSafe as a true EQUI join key (the
    // comparison compiles to a null-coalesced hash key), so this stays a
    // hash/sort-merge join — PlanShapeSpec pins that it never degrades to
    // the nested-loop a theta-join ON clause would cost. At 100 TB:
    // identical shuffle economics to join_inner_eq; the NULL key is one
    // more hash bucket (skew-manageable like any hot key if 'unknown'
    // dominates — join_skew_aqe's territory).
    QDef(
      "join_null_safe",
      (s, dir) => {
        val fact = T.orders(s, dir)
          .select(
            expr("CASE WHEN o_orderkey % 7 = 0 THEN CAST(NULL AS BIGINT) " +
              "ELSE o_orderkey % 5 END").as("k"),
            expr("cast(floor(o_totalprice * 1e2 + 0.5) as bigint)").as("cents"))
        val dim = s.range(0L, 5L).select(col("id").as("k"))
          .unionAll(s.range(0L, 1L).select(lit(null).cast("long").as("k")))
          .withColumn("label",
            coalesce(concat(lit("seg_"), col("k")), lit("unknown")))
        fact.join(dim, fact("k") <=> dim("k"))
          .groupBy("label")
          .agg(count(lit(1)).as("n"), sum("cents").cast("long").as("sum_cents"))
          .orderBy("label")
      },
      Some("""WITH fact AS (
             |  SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL
             |              ELSE o_orderkey % 5 END AS k,
             |    CAST(floor(o_totalprice * 1e2 + 0.5) AS BIGINT) AS cents
             |  FROM orders),
             |dim AS (
             |  SELECT k, coalesce('seg_' || k, 'unknown') AS label FROM (
             |    SELECT range AS k FROM range(0, 5)
             |    UNION ALL SELECT NULL))
             |SELECT label, count(*) AS n, CAST(sum(cents) AS BIGINT) AS sum_cents
             |FROM fact JOIN dim ON fact.k IS NOT DISTINCT FROM dim.k
             |GROUP BY label ORDER BY label""".stripMargin)),

    // ENGINE-NATIVE skew handling — the companion to join_skew_salted: at
    // 100 TB the production lever is AQE's OptimizeSkewedJoin, which
    // detects a hot reduce partition from the materialized map-output
    // stats and splits it across the SKEWED side's map-chunk boundaries
    // while replicating the other side — no salting rewrite, identical
    // result. The fixture manufactures the textbook shape (75% of orders
    // on ONE join key, the rest spread over 997) and tunes the detection
    // floors to fixture bytes: the split granularity is MAP OUTPUT
    // boundaries, so the fact is staged through an 8-task exchange (the
    // stand-in for a real many-task scan — a 1-task map side is
    // physically unsplittable however skewed), and
    // coalescePartitions.minPartitionSize must drop below the hot
    // partition's size or the split target clamps to its 1 MB default and
    // the rule refuses (found empirically; the production defaults assume
    // 256 MB+ partitions). The skew engagement is `require`d on the
    // executed adaptive plan — mistuned thresholds fail the query, not
    // just a spec — and the result is the plain-join oracle. Confs live
    // on an isolated newSession so nothing leaks to the shared session.
    QDef(
      "join_skew_aqe",
      (s, dir) => {
        val s2 = s.newSession()
        s2.conf.set("spark.sql.shuffle.partitions", "32")
        s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        s2.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        // Floors sized to the SMALLEST fixture (sf0.001's hot partition is
        // ~12 KB): detection needs hot > max(threshold, factor · median),
        // and the split target max(advisory, minPartitionSize) must sit
        // below the per-map chunk size or zero slices come back. The
        // RATIOS are what transfer to production; the bytes scale with
        // the partitions (256 MB threshold / 64 MB advisory at real scale).
        s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
        s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2k")
        s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1k")
        s2.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1k")
        val fact = T.orders(s2, dir)
          .select(expr("CASE WHEN o_orderkey % 4 != 0 THEN 42L " +
              "ELSE o_orderkey % 997L END").as("key"),
            expr("cast(floor(o_totalprice * 1e2 + 0.5) as bigint)").as("cents"))
          .repartition(8)
        val dim = s2.range(0L, 997L)
          .select(col("id").as("key"), (col("id") * 7L % 100L).as("w"))
        val joined = fact.hint("merge").join(dim, "key")
          .agg(count(lit(1)).as("n"),
            sum(col("cents")).cast("long").as("sum_cents"),
            sum(col("w") * col("cents")).cast("long").as("sum_wcents"))
        val rows = joined.collect() // materialize so AQE re-plans on stats
        val p = joined.queryExecution.executedPlan.toString
        lastSkewAqePlan = p // PlanShapeSpec re-asserts the shape externally
        require(p.contains("skew=true"),
          s"AQE OptimizeSkewedJoin did not engage on the hot-key join:\n$p")
        require(p.contains("skewed"),
          s"no skewed AQEShuffleRead in the adaptive plan:\n$p")
        // Hand the harness the ALREADY-COMPUTED one-row aggregate as a
        // local relation: the engagement pin above had to execute the
        // join (AQE decisions only exist on a run plan), so returning the
        // live frame would silently run the whole skew join a second time
        // at materialization.
        s2.createDataFrame(java.util.Arrays.asList(rows: _*), joined.schema)
      },
      Some("""WITH fact AS (
             |  SELECT CASE WHEN o_orderkey % 4 != 0 THEN 42
             |              ELSE o_orderkey % 997 END AS key,
             |    CAST(floor(o_totalprice * 1e2 + 0.5) AS BIGINT) AS cents
             |  FROM orders),
             |dim AS (SELECT range AS key, range * 7 % 100 AS w FROM range(0, 997))
             |SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS sum_cents,
             |  CAST(sum(w * cents) AS BIGINT) AS sum_wcents
             |FROM fact JOIN dim USING (key)""".stripMargin)),

    // Bounded cartesian of the two tiny dims.
    QDef(
      "join_cross",
      (s, dir) =>
        T.region(s, dir).crossJoin(T.nation(s, dir))
          .select("r_regionkey", "r_name", "n_nationkey", "n_name")
          .orderBy("r_regionkey", "n_nationkey"),
      Some("""SELECT r_regionkey, r_name, n_nationkey, n_name
             |FROM region CROSS JOIN nation
             |ORDER BY r_regionkey, n_nationkey""".stripMargin)),

    // Interval-overlap join: error windows [t, t+3600) × purchase windows
    // [t, t+1800) of the same user, overlap iff aS < bE ∧ bS < aE. The
    // Spark plan is an EQUI join on (user_id, time-bucket) — each interval
    // explodes to the ≤2 width-3600 buckets it covers, candidate pairs meet
    // in a bucket, the exact predicate filters residually, and `distinct`
    // collapses pairs that met in both buckets. Never a nested-loop join;
    // candidate population per bucket is bounded by interval density, not
    // corpus size — the same plan at 100 TB shuffles on a key whose
    // cardinality grows with the data.
    QDef(
      "join_interval",
      (s, dir) => {
        def side(typ: String, dur: Long, p: String) =
          T.events(s, dir).where(col("event_type") === typ)
            .select(col("event_id").as(s"${p}_id"), col("user_id"),
              unix_timestamp(col("ts")).as(s"${p}_s"))
            .withColumn(s"${p}_e", col(s"${p}_s") + dur)
            .withColumn("bk", explode(sequence(
              expr(s"${p}_s div 3600"), expr(s"${p}_e div 3600"))))
        val a = side("error", 3600L, "a")
        val b = side("purchase", 1800L, "b")
        a.join(b, Seq("user_id", "bk"))
          .where(col("a_s") < col("b_e") && col("b_s") < col("a_e"))
          .select(col("a_id"), col("b_id"), col("user_id"),
            (least(col("a_e"), col("b_e")) - greatest(col("a_s"), col("b_s")))
              .as("overlap_s"))
          .distinct()
          .orderBy("a_id", "b_id")
      },
      Some("""WITH a AS (
             |  SELECT event_id AS a_id, user_id,
             |    CAST(floor(epoch(ts)) AS BIGINT) AS a_s,
             |    CAST(floor(epoch(ts)) AS BIGINT) + 3600 AS a_e
             |  FROM events WHERE event_type = 'error'),
             |b AS (
             |  SELECT event_id AS b_id, user_id,
             |    CAST(floor(epoch(ts)) AS BIGINT) AS b_s,
             |    CAST(floor(epoch(ts)) AS BIGINT) + 1800 AS b_e
             |  FROM events WHERE event_type = 'purchase')
             |SELECT a_id, b_id, user_id,
             |  least(a_e, b_e) - greatest(a_s, b_s) AS overlap_s
             |FROM a JOIN b USING (user_id)
             |WHERE a_s < b_e AND b_s < a_e
             |ORDER BY a_id, b_id""".stripMargin)),

    // Bloom-filtered join: pre-filter the fact with a tiny bitmap built from
    // the dim keys BEFORE the real join — the shuffle-reduction idiom for a
    // selective dim too large to broadcast whole. The filter is built as an
    // aggregate (k=2 arithmetic hashes → bit positions → bit_or per 64-bit
    // word: m=8192 bits = 128 rows, constant in dim size), broadcast to the
    // fact, and probed with two hash-join lookups + bitmask tests; rows that
    // fail cannot be in the dim (no false negatives), so the final equi-join
    // sees only survivors and the result is IDENTICAL to the plain join —
    // which is exactly what the oracle runs. At 100 TB the bitmap stays KB-
    // sized while the pre-join fact volume drops by the filter's selectivity
    // (false-positive rate ≈ (1-e^{-kn/m})^k, ≪ 1 here). Spark's own
    // runtime row-level filtering (spark.sql.optimizer.runtime.bloomFilter)
    // injects the same shape automatically when stats justify it; this
    // operator is the explicit, plannable form.
    QDef(
      "join_bloom",
      (s, dir) => {
        // SINGLE source of truth for the k=2 hash family: the probe-side SQL
        // is generated from the same strings that build the bitmap, so a
        // constant tweak cannot desynchronize build and probe (bloom false
        // negatives would silently drop result rows).
        val M = 8192L
        val hashSql = Seq("o_custkey * 2654435761", "(o_custkey * 40503 + 17)")
          .map(h => s"$h % $M")
        def h(i: Int, k: String): org.apache.spark.sql.Column =
          expr(hashSql(i).replace("o_custkey", k))
        val dim = T.customer(s, dir).where(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"), col("c_name"))
        val bloom = dim.select(explode(array(h(0, "c_custkey"), h(1, "c_custkey"))).as("bit"))
          .select(expr("bit div 64").as("w"), expr("bit % 64").as("b"))
          .groupBy("w").agg(expr("bit_or(shiftleft(1L, cast(b as int)))").as("bits"))
        val fact = T.orders(s, dir)
          .select(col("o_custkey"), col("o_totalprice"))
        val survived = fact
          .join(broadcast(bloom.withColumnRenamed("bits", "bits1")),
            expr(s"${hashSql(0)} div 64") === col("w"))
          .where(expr(s"bits1 & shiftleft(1L, cast(${hashSql(0)} % 64 as int))") =!= 0L)
          .drop("w")
          .join(broadcast(bloom.withColumnRenamed("bits", "bits2")),
            expr(s"${hashSql(1)} div 64") === col("w"))
          .where(expr(s"bits2 & shiftleft(1L, cast(${hashSql(1)} % 64 as int))") =!= 0L)
        survived.join(dim, col("o_custkey") === col("c_custkey"))
          .groupBy("c_custkey")
          .agg(count(lit(1)).as("n_orders"), rnd(sum(col("o_totalprice")), 2).as("total"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c.c_custkey, count(*) AS n_orders,
             |  floor((sum(o.o_totalprice)) * 1e2 + 0.5) / 1e2 AS total
             |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
             |WHERE c.c_mktsegment = 'BUILDING'
             |GROUP BY c.c_custkey ORDER BY c.c_custkey""".stripMargin)),

    // Batch MERGE / upsert — the lakehouse CDC-compaction shape: apply a
    // changeset (upserts + delete markers) to a base snapshot and emit the
    // merged table with a per-key disposition. One FULL OUTER equi-join on
    // the key + coalesce picks the surviving value; deletes drop the value,
    // unmatched delete markers surface as explicit no-ops (an auditable
    // CDC-replay artifact rather than a silent drop). Base and changeset
    // are both deterministic arithmetic slices of `orders` so the oracle is
    // the identical join. At 100 TB this is ONE co-partitioned shuffle per
    // side on the merge key — and when the base is bucketed/clustered by
    // key (sink_bucketed), the base side's exchange disappears entirely;
    // AQE turns a small changeset into a broadcast and the base never
    // shuffles at all. No window, no skew exposure (merge keys are unique
    // per side by construction, as in any primary-key MERGE).
    QDef(
      "table_merge",
      (s, dir) => {
        val base = T.orders(s, dir)
          .where(col("o_orderkey") % 4L =!= 0L)
          .select(col("o_orderkey").as("key"), col("o_totalprice").as("b_val"))
        val changes = T.orders(s, dir)
          .where(col("o_orderkey") % 3L === 0L)
          .select(col("o_orderkey").as("key"),
            rnd(col("o_totalprice") * 1.1, 2).as("c_val"),
            when(col("o_orderkey") % 21L === 0L, lit("D"))
              .otherwise(lit("U")).as("op"))
        base.join(changes, Seq("key"), "full_outer")
          .withColumn("disposition",
            when(col("op") === "D" && col("b_val").isNotNull, lit("delete"))
              .when(col("op") === "D", lit("noop"))
              .when(col("op") === "U" && col("b_val").isNotNull, lit("update"))
              .when(col("op") === "U", lit("insert"))
              .otherwise(lit("keep")))
          .withColumn("val",
            when(col("op") === "D", lit(null).cast("double"))
              .otherwise(coalesce(col("c_val"), col("b_val"))))
          .select("key", "disposition", "val")
          .orderBy("key")
      },
      Some("""WITH base AS (
             |  SELECT o_orderkey AS key, o_totalprice AS b_val
             |  FROM orders WHERE o_orderkey % 4 <> 0),
             |changes AS (
             |  SELECT o_orderkey AS key,
             |    floor((o_totalprice * 1.1) * 1e2 + 0.5) / 1e2 AS c_val,
             |    CASE WHEN o_orderkey % 21 = 0 THEN 'D' ELSE 'U' END AS op
             |  FROM orders WHERE o_orderkey % 3 = 0)
             |SELECT coalesce(b.key, c.key) AS key,
             |  CASE WHEN c.op = 'D' AND b.key IS NOT NULL THEN 'delete'
             |       WHEN c.op = 'D' THEN 'noop'
             |       WHEN c.op = 'U' AND b.key IS NOT NULL THEN 'update'
             |       WHEN c.op = 'U' THEN 'insert'
             |       ELSE 'keep' END AS disposition,
             |  CASE WHEN c.op = 'D' THEN NULL
             |       ELSE coalesce(c.c_val, b.b_val) END AS val
             |FROM base b FULL OUTER JOIN changes c ON b.key = c.key
             |ORDER BY key""".stripMargin))
  )
}
