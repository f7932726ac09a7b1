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

  test("the reference's embed->search flow runs as one SQL statement") {
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      graft.sources.Ingest.corpusFromDocuments(ext, sfSmall)
        .createOrReplaceTempView("corpus")
      // semantic search in pure SQL: embed the corpus and the query
      // text with the engine's deterministic embedder, rank by
      // squared-L2 — the reference's whole search path (app.py:58-75)
      // as one statement a SQL-only user can run
      val sql =
        """SELECT id, l2sq(embed_text(sentence, 64),
          |                embed_text('key agg row scan', 64)) AS dist
          |FROM corpus ORDER BY dist ASC, id ASC LIMIT 5""".stripMargin
      val got = ext.sql(sql).collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(got.length == 5)
      assert(got.sliding(2).forall(p => p(0)._2 <= p(1)._2), "ascending distance")
      // parity with the DataFrame API path on the same session
      import org.apache.spark.sql.functions.col
      val df = graft.sources.Ingest.corpusFromDocuments(ext, sfSmall)
        .select(col("id"), graft.functions.l2sq(
          graft.functions.embed_text(col("sentence"), 64),
          graft.functions.embed_text(
            org.apache.spark.sql.functions.lit("key agg row scan"), 64)).as("dist"))
        .orderBy(col("dist").asc, col("id").asc).limit(5)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(got.toSeq == df.toSeq, "SQL and DataFrame paths must agree exactly")
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
