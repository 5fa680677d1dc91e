package graft
import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Contract: bench runs local[32] (BASELINE.md / driver brief); the env
    // var still overrides for constrained dev machines.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Driver contract: no args. Extra args (local dev only) restrict the run
    // to the named queries.
    val only = args.toSet
    val base = SparkEntry.queries.toSeq.sortBy(_._1)
    val picked = if (only.isEmpty) base else base.filter(q => only(q._1))
    // JIT/codegen warm-up at the smallest fixture: compiles every query's
    // generated code and JIT-warms Spark's scan/shuffle paths so the timed
    // pass measures steady-state plan execution, not first-call compilation.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    if (new java.io.File(warmDir).isDirectory) picked.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => () }
    }
    val results = picked.map { case (name, fn) =>
      if (only.nonEmpty) { try fn(spark, sfDir).count() catch { case _: Throwable => } }
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
