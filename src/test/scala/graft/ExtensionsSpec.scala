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
}
