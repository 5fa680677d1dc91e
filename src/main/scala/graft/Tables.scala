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

  /** `events.parquet` has stored `ts` under three different physical types
    * across fixture generations, so normalize to TIMESTAMP here — the one
    * loader — rather than at every consumer:
    *  - parquet TIMESTAMP(NANOS): Spark rejects it by default
    *    ([PARQUET_TYPE_ILLEGAL]); read nanos as LONG via the legacy conf,
    *    then floor-divide to micros — integer division, NOT double math
    *    (epoch-nanos ~1.7e18 exceed 2^53; a double round-trip corrupts low
    *    bits). Matches DuckDB, which truncates nanos→micros.
    *  - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark reads
    *    TIMESTAMP_NTZ, which `unix_micros`/time-window ops reject or treat
    *    differently; cast to TIMESTAMP. Under the library's pinned UTC
    *    session timezone the cast is a pure reinterpretation — the same
    *    epoch micros DuckDB's `epoch_us` computes on the naive value.
    *  - plain TIMESTAMP: pass through. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
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
