package graft

/** SURVEY §5.3 #2 — oracle-parity self-test: every oracle string that is
  * ANSI-portable enough for Spark's parser must reproduce the DataFrame
  * form's exact rows when run via `spark.sql` over the same fixtures.
  * Catches DataFrame-vs-SQL drift locally, before the driver's DuckDB pass
  * can catch dialect drift. DuckDB-only constructs (`epoch`, `unnest`,
  * `len`, `list_*`, `datediff('day',…)`, `strftime`, …) fail analysis and
  * are counted as dialect-skips; a minimum-pass floor keeps this test from
  * silently degrading to all-skips.
  */
class OracleParitySpec extends SparkSpec {

  test("ANSI-portable oracle SQL ≡ DataFrame results (exact rows)") {
    val s = spark
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings")
      .foreach(t => Tables.load(s, sf, t).createOrReplaceTempView(t))
    Tables.events(s, sf).createOrReplaceTempView("events")

    var passed = List.empty[String]
    var skipped = List.empty[String]
    var mismatched = List.empty[String]
    var errored = List.empty[String]

    // Dialect probe runs PARSE + ANALYZE only, via the analyzer directly:
    // probing with s.sql(...).collect() posted a FAILED execution event per
    // dialect-skip, and Spark's ObservationManager listener (registered
    // session-wide once any query uses .observe(), e.g. pipeline_observe)
    // re-throws the analysis exception inside ExecutionListenerBus — a
    // swallowed ERROR line per skip that could mask a REAL listener
    // failure. Analyzer-level probing never reaches the execution-event
    // machinery, so the test log stays clean.
    def analyzes(sql: String): Boolean =
      try {
        s.sessionState.analyzer.executeAndCheck(
          s.sessionState.sqlParser.parsePlan(sql),
          new org.apache.spark.sql.catalyst.QueryPlanningTracker)
        true
      } catch { case _: Exception => false } // DuckDB-only dialect
    SparkEntry.all.foreach { q =>
      q.oracle.foreach { sql =>
        if (!analyzes(sql)) skipped ::= q.name
        else {
          // Analyzer-level probing means an oracle that only throws at
          // EXECUTION would otherwise escape the loop and abort the whole
          // parity report — record it as errored and keep going, so one
          // runtime failure cannot mask the rest of the inventory.
          try {
            val a = s.sql(sql).collect().map(_.toString).sorted
            val b = q.fn(s, sf).collect().map(_.toString).sorted
            if (a.sameElements(b)) passed ::= q.name
            else mismatched ::= q.name
          } catch { case e: Exception =>
            info(s"errored ${q.name}: ${e.getMessage.take(200)}")
            errored ::= q.name
          }
        }
      }
    }
    info(s"parity-passed (${passed.size}): ${passed.sorted.mkString(", ")}")
    info(s"dialect-skipped (${skipped.size}): ${skipped.sorted.mkString(", ")}")
    assert(errored.isEmpty,
      s"oracle SQL analyzed but threw at execution: $errored")
    assert(mismatched.isEmpty,
      s"oracle SQL runs in Spark but disagrees with the DataFrame form: $mismatched")
    assert(passed.size >= 20,
      s"parity floor: expected ≥20 portable oracles, got ${passed.size} — " +
        "either oracles drifted to heavy dialect or views/fixtures broke")
  }
}
