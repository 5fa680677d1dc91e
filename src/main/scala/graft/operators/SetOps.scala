package graft.operators

import graft.{QDef, Tables => T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** §2.7 Set operations. Two derived key sets:
  *   A = custkeys of orders with totalprice > 450k (bag: one per such order)
  *   B = custkeys of customers with acctbal > 9000 (set)
  */
object SetOps {

  private def bigOrderKeys(s: SparkSession, dir: String): DataFrame =
    T.orders(s, dir).where(col("o_totalprice") > 450000.0)
      .select(col("o_custkey").as("k"))

  private def richCustomerKeys(s: SparkSession, dir: String): DataFrame =
    T.customer(s, dir).where(col("c_acctbal") > 9000.0)
      .select(col("c_custkey").as("k"))

  private val aSql = "SELECT o_custkey AS k FROM orders WHERE o_totalprice > 450000.0"
  private val bSql = "SELECT c_custkey AS k FROM customer WHERE c_acctbal > 9000.0"

  val defs: Seq[QDef] = Seq(

    QDef(
      "set_union_all",
      (s, dir) =>
        bigOrderKeys(s, dir).unionAll(richCustomerKeys(s, dir)).orderBy("k"),
      Some(s"SELECT k FROM ($aSql UNION ALL $bSql) ORDER BY k")),

    QDef(
      "set_union_distinct",
      (s, dir) =>
        bigOrderKeys(s, dir).union(richCustomerKeys(s, dir)).distinct().orderBy("k"),
      Some(s"SELECT k FROM ($aSql UNION $bSql) ORDER BY k")),

    QDef(
      "set_intersect",
      (s, dir) =>
        bigOrderKeys(s, dir).intersect(richCustomerKeys(s, dir)).orderBy("k"),
      Some(s"SELECT k FROM ($aSql INTERSECT $bSql) ORDER BY k")),

    // Bag intersection (INTERSECT ALL): a duplicated big-order custkey
    // survives min(occurrences-in-A, occurrences-in-B) times.
    QDef(
      "set_intersect_all",
      (s, dir) =>
        bigOrderKeys(s, dir).intersectAll(richCustomerKeys(s, dir)).orderBy("k"),
      Some(s"SELECT k FROM ($aSql INTERSECT ALL $bSql) ORDER BY k")),

    // Bag difference (EXCEPT ALL): duplicate big-order custkeys survive once
    // per unmatched occurrence.
    QDef(
      "set_except",
      (s, dir) =>
        bigOrderKeys(s, dir).exceptAll(richCustomerKeys(s, dir)).orderBy("k"),
      Some(s"SELECT k FROM ($aSql EXCEPT ALL $bSql) ORDER BY k")),

    // Set difference (EXCEPT DISTINCT — the ANSI default): each custkey in
    // A-not-B survives exactly once however many big orders it placed.
    // Completes the set-op matrix (union/intersect/except × all/distinct).
    // Same scale shape as the rest of the family: one hash shuffle on the
    // key with map-side partial distinct; never a sort.
    QDef(
      "set_except_distinct",
      (s, dir) =>
        bigOrderKeys(s, dir).except(richCustomerKeys(s, dir)).orderBy("k"),
      Some(s"SELECT k FROM ($aSql EXCEPT $bSql) ORDER BY k"))
  )
}
