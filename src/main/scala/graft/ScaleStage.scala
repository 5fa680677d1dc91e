package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Self-staged scale-sweep fixtures: replicate the driver's sf0.1 tables
  * `factor`× with DISJOINT key spaces per replica, so the iterative /
  * index-building operator families can be timed at ~sf1 and their scaling
  * exponents measured (BENCH_SCALE.json) — the step that turns "designed
  * for 100 TB" plan-reading into measurement.
  *
  * Replication discipline (what makes the timing honest):
  *  - every key column shifts by `i * (max+1)` so joins keep their
  *    per-replica fan-out (each replica is a disjoint component — graph
  *    operators see `factor`× components, not one `factor`²-denser blob);
  *  - `documents.text` is word-salted per replica (`w` → `w`x`i`), so
  *    replicas are NOT near-duplicates of each other: the dedup family's
  *    candidate structure scales ~linearly instead of exploding on
  *    cross-replica duplicate buckets a real 10× corpus would never have;
  *  - `events.ts` / `embeddings.embedding` keep their values — per-key
  *    series length and vector geometry are the premises those families'
  *    state bounds rest on, and replication preserves both;
  *  - layout matches the driver exactly: ONE parquet file per table (the
  *    staged dir is a drop-in SPARK_GRAFT_SF_DIR), events.ts staying in
  *    its raw physical type via the same nanosAsLong read the loader uses.
  *
  * Usage: ScaleStage <srcSfDir> <outDir> [factor=10]
  */
object ScaleStage {

  private def singleFile(s: SparkSession, df: DataFrame, outDir: String,
      table: String): Unit = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val tmp = s"$outDir/.stage_$table"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = {
      val st = Files.list(Paths.get(tmp))
      try st.iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(".parquet"))
        .toSeq.head
      finally st.close()
    }
    Files.move(part, Paths.get(s"$outDir/$table.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    FsUtil.deleteRecursively(new java.io.File(tmp))
  }

  /** Union `factor` replicas of `df`, shifting each column in `keys` by
    * `i * (max+1)` per replica — disjoint key spaces, preserved structure. */
  private def replicate(s: SparkSession, df: DataFrame, factor: Int,
      keys: Seq[String], extra: (DataFrame, Int) => DataFrame = (d, _) => d)
      : DataFrame = {
    val strides: Map[String, Long] = keys.map { k =>
      k -> (df.agg(max(col(k))).head.getLong(0) + 1L)
    }.toMap
    (0 until factor).map { i =>
      val shifted = keys.foldLeft(df) { (d, k) =>
        d.withColumn(k, col(k) + lit(i.toLong * strides(k)))
      }
      extra(shifted, i)
    }.reduce(_ unionAll _)
  }

  def main(args: Array[String]): Unit = {
    val srcDir = args(0)
    val outDir = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))

    // Dimensions copy as-is (at a real sf1 these grow too, but the sweep
    // targets the iterative families, whose cost lives in the fact side).
    singleFile(s, Tables.region(s, srcDir), outDir, "region")
    singleFile(s, Tables.nation(s, srcDir), outDir, "nation")

    singleFile(s, replicate(s, Tables.customer(s, srcDir), factor,
      Seq("c_custkey")), outDir, "customer")
    singleFile(s, replicate(s, Tables.supplier(s, srcDir), factor,
      Seq("s_suppkey")), outDir, "supplier")
    singleFile(s, replicate(s, Tables.part(s, srcDir), factor,
      Seq("p_partkey")), outDir, "part")
    singleFile(s, replicate(s, Tables.orders(s, srcDir), factor,
      Seq("o_orderkey", "o_custkey")), outDir, "orders")
    singleFile(s, replicate(s, Tables.lineitem(s, srcDir), factor,
      Seq("l_orderkey", "l_partkey", "l_suppkey")), outDir, "lineitem")

    // events: raw read keeps ts in its on-disk physical type (LONG nanos
    // under the loader's legacy conf) so the staged file round-trips
    // through Tables.events identically.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val eventsRaw = s.read.parquet(s"$srcDir/events.parquet")
    singleFile(s, replicate(s, eventsRaw, factor,
      Seq("event_id", "user_id")), outDir, "events")

    // documents: word-salt the text per replica (deterministic, content
    // preserved within a replica) so cross-replica pairs are NOT near-dups.
    singleFile(s, replicate(s, Tables.documents(s, srcDir), factor,
      Seq("doc_id"),
      (d, i) =>
        if (i == 0) d
        else d.withColumn("text",
            regexp_replace(col("text"), "(\\S+)", s"$$1x$i"))
          .withColumn("n_chars", length(col("text")).cast("long"))),
      outDir, "documents")

    singleFile(s, replicate(s, Tables.embeddings(s, srcDir), factor,
      Seq("vec_id")), outDir, "embeddings")

    val counts = Seq("customer", "orders", "lineitem", "events",
      "documents", "embeddings").map { t =>
      s"$t=${s.read.parquet(s"$outDir/$t.parquet").count()}"
    }
    println(s"[scale-stage] factor=$factor out=$outDir ${counts.mkString(" ")}")
    s.stop()
  }
}
