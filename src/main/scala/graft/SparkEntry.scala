package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 (operator inventory) and §7.
  *
  * Every operator family from the inventory contributes a list of [[QDef]]s
  * from its module under `graft.operators`; this object is just the
  * aggregation point the driver harness calls into.
  */
object SparkEntry {

  /** All declared operators, in SURVEY §2 order. */
  def all: Seq[QDef] =
    operators.Scans.defs ++
      operators.TableOps.defs ++
      operators.FrameOps.defs ++
      operators.Filters.defs ++
      operators.Joins.defs ++
      operators.Aggregates.defs ++
      operators.Windows.defs ++
      operators.SetOps.defs ++
      operators.Scalars.defs ++
      operators.TextOps.defs ++
      operators.Dedup.defs ++
      operators.Similarity.defs ++
      operators.Graph.defs ++
      operators.StreamingOps.defs ++
      operators.Extensibility.defs ++
      multimodal.Multimodal.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("agg_hash")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent SQL runnable by DuckDB on the same
    * parquet tables. Omitted for non-SQL-expressible ops (approx aggregates,
    * streaming-only semantics) → driver records a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    all.collect { case QDef(n, _, Some(sql)) => n -> sql }.toMap
}
