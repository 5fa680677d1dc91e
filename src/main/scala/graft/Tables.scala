package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loaders (FIXTURES.md). One parquet file per table under
  * `sfDir`; schemas come from the parquet footers — never inferred.
  *
  * Scale note: at 100 TB each of these would be a partitioned parquet lake
  * (e.g. `lineitem/` partitioned by ship-month) and the same
  * `spark.read.parquet(dir)` call picks up partition pruning for free; the
  * query code in `graft.operators` is written against the DataFrame, not the
  * layout, so it is unchanged by that move.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")

  /** `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which Spark
    * rejects by default ([PARQUET_TYPE_ILLEGAL]). Read nanos as LONG via the
    * legacy conf, then floor-divide to microseconds — integer division, NOT
    * double math: epoch-nanos (~1.7e18) exceed 2^53, a double round-trip
    * would corrupt low bits. Matches DuckDB, which truncates nanos→micros. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}

/** One declared operator: name, DataFrame implementation, optional DuckDB
  * oracle SQL (None ⇒ non-SQL-expressible; driver falls back to a rows-only
  * check — `SparkEntry.oracleSql` contract). */
final case class QDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
