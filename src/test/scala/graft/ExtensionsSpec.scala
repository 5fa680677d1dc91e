package graft

/** The `spark.sql.extensions=graft.GraftExtensions` deployment path: the
  * shared test session is built with that conf (see [[TestSession]] — it is a
  * static conf, applied when the first session over the context is created),
  * so the injected functions must resolve from plain SQL with no programmatic
  * registration. */
class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions injects graft_dot / graft_mag via spark.sql.extensions") {
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
        "graft_mag(100.0d) AS m").head()
    assert(r.getDouble(0) === 11.0)
    assert(r.getDouble(1) === 20.0) // -2.5·log10(100) + 25
  }

  test("MagSargRewrite preserves the FULL flux domain — NaN, negative, zero, " +
      "NULL — under Spark's NaN-greatest comparison ordering") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // Spark orders NaN ABOVE every double, so a naive `flux > t` rewrite of
    // `graft_mag(flux) < m` would admit NaN flux that the original predicate
    // (mag = NaN, NaN < m = false) excludes. The crafted row set covers every
    // domain edge the rule's doc comment claims.
    // Staged through parquet: a LocalRelation would be constant-folded by
    // ConvertToLocalRelation (evaluating the ORIGINAL predicate, proving
    // nothing about the rewrite); a scan keeps the Filter alive for the
    // optimizer rule and the source-filter translation.
    val dir = java.nio.file.Files.createTempDirectory("graft_magnan").toString
    Seq[(Int, java.lang.Double)](
      (1, Double.NaN),  // mag NaN        — must be EXCLUDED (the bug class)
      (2, -5.0),        // mag NaN        — excluded
      (3, 0.0),         // mag +Inf       — excluded
      (4, null),        // mag NULL       — excluded
      (5, 100.0),       // mag 20.0       — included (above threshold t≈75.86)
      (6, 10.0)         // mag 22.5       — excluded (below t)
    ).toDF("id", "flux").write.mode("overwrite").parquet(dir)
    val rows = spark.read.parquet(dir)
    graft.functions.Magnitude.register(spark)
    graft.plans.MagSargRewrite.install(spark)
    val filtered = rows.where(expr("graft_mag(flux)") < lit(20.3))
    // The rewrite must have fired (no magnitude left in the optimized
    // plan), kept its sargable half pushed to the scan, AND carry the NaN
    // guard that Spark's NaN-greatest comparison ordering requires.
    val opt = filtered.queryExecution.optimizedPlan.toString
    assert(!opt.contains("graft_mag"),
      s"the sargable rewrite did not fire on the crafted frame:\n$opt")
    assert(opt.toLowerCase.contains("isnan"),
      s"the rewrite lost its NaN guard:\n$opt")
    val phys = filtered.queryExecution.executedPlan.toString
    assert(phys.contains("PushedFilters") && phys.contains("GreaterThan(flux"),
      s"the sargable conjunct no longer reaches the scan:\n$phys")
    // … and the surviving ids must match the ORIGINAL predicate's semantics.
    assert(filtered.select("id").as[Int].collect().sorted === Array(5),
      "rewritten predicate diverged from graft_mag(flux) < m on a domain edge")
    // m = NaN is inexpressible as a flux threshold (mag < NaN is true for
    // every non-NaN magnitude under the total ordering) — the rule must
    // LEAVE it alone and the unrewritten form must keep Spark's semantics.
    val nanM = rows.where(expr("graft_mag(flux) < double('NaN')"))
    assert(nanM.queryExecution.optimizedPlan.toString.contains("graft_mag"),
      "m = NaN must not be rewritten into a flux comparison")
    assert(nanM.select("id").as[Int].collect().sorted === Array(3, 5, 6),
      "unrewritten m = NaN form lost Spark's NaN-greatest ordering semantics")
    graft.FsUtil.deleteRecursively(new java.io.File(dir))
  }
}
