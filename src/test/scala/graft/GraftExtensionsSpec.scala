package graft

import org.apache.spark.sql.SparkSession

/** The spark.sql.extensions integration point: a session built with
  * GraftExtensions has every graft kernel in pure SQL. */
class GraftExtensionsSpec extends SparkSpec {

  test("withExtensions(GraftExtensions) exposes the kernels in SQL") {
    val base = spark // materialize the shared session (and its context) first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = ext.sql(
        """SELECT l2sq(array(1.0F, 2.0F), array(3.0F, 5.0F)) AS d,
          |       dot_i8(quantize_i8(array(127.0F, -0.5F)),
          |              quantize_i8(array(127.0F, -0.5F))) AS q,
          |       simhash64('alpha beta') AS h""".stripMargin).collect().head
      assert(r.getDouble(0) == 13.0)
      assert(r.getLong(1) == 16130L)
      // new sessions of the same context inherit the extensions
      val r2 = ext.newSession().sql(
        "SELECT cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c")
        .collect().head
      assert(r2.getDouble(0) == 1.0)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
