package graft

import graft.sources.Ingest

/** Ingest surface semantics (reference app.py:199-223): the required
  * `sentences` CSV column with error parity, line-splitting with
  * trim/drop-empty, positional ids, and CSV sink round trip. */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  test("joinedDisplay (F3): newline join in id order with display cap") {
    val corpus = Seq((2L, "c"), (0L, "a"), (1L, "b")).toDF("id", "sentence")
    val r = graft.sources.Ingest.joinedDisplay(corpus).head
    assert(r.getLong(0) == 3L && r.getString(1) == "a\nb\nc")
    val capped = graft.sources.Ingest.joinedDisplay(corpus, cap = 2).head
    assert(capped.getLong(0) == 2L && capped.getString(1) == "a\nb")
  }

  test("fromCsv errors on a missing 'sentences' column (app.py:208 parity)") {
    val dir = tmpDir("csv-bad-")
    Seq("text_col", "hello", "world").toDF("value")
      .coalesce(1).write.mode("overwrite").option("header", "false").csv(dir + "/data")
    val e = intercept[IllegalArgumentException] {
      Ingest.fromCsv(spark, dir + "/data")
    }
    assert(e.getMessage.contains("sentences"))
  }

  test("fromCsv reads the sentences column with contiguous positional ids") {
    val dir = tmpDir("csv-ok-")
    Seq("alpha", "beta", "gamma", "delta").toDF("sentences")
      .coalesce(1).write.mode("overwrite").option("header", "true").csv(dir + "/data")
    val got = Ingest.fromCsv(spark, dir + "/data")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(got.map(_._2).toSet == Set("alpha", "beta", "gamma", "delta"))
  }

  test("fromCsv coerces non-string cells to string (app.py:204 astype parity)") {
    val dir = tmpDir("csv-mixed-")
    Seq("42", "3.5", "true").toDF("sentences")
      .coalesce(1).write.mode("overwrite").option("header", "true").csv(dir + "/data")
    val got = Ingest.fromCsv(spark, dir + "/data")
    assert(got.schema("sentence").dataType.typeName == "string")
    assert(got.collect().map(_.getString(1)).toSet == Set("42", "3.5", "true"))
  }

  test("fromLines trims, drops empty lines, assigns positional ids in order") {
    val got = Ingest.fromLines(spark, "  first \n\n second\n   \nthird  ")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(got == Seq((0L, "first"), (1L, "second"), (2L, "third")))
  }

  test("fromLinesDf applies the same trim/non-empty filter distributed") {
    val got = Ingest.fromLinesDf(Seq(" x ", "", "y", "  ").toDF("raw"))
      .collect().map(_.getString(1)).toSet
    assert(got == Set("x", "y"))
  }

  test("corpusFromDocuments: (id, sentence) with non-empty trimmed text") {
    val df = Ingest.corpusFromDocuments(spark, sfSmall)
    assert(df.columns.toSeq == Seq("id", "sentence"))
    val n = df.count()
    assert(n > 0 && n <= Tables.documents(spark, sfSmall).count())
  }

  test("exportCsv -> fromCsv style round trip preserves rows") {
    val dir = tmpDir("csv-rt-")
    val assignments = Seq((0L, 1L), (1L, 1L), (2L, -1L)).toDF("id", "cluster_id")
    graft.operators.Clustering.exportCsv(assignments, dir + "/out")
    val back = spark.read.option("header", "true").csv(dir + "/out")
      .collect().map(r => (r.getString(0).toLong, r.getString(1).toLong)).toSet
    assert(back == Set((0L, 1L), (1L, 1L), (2L, -1L)))
  }

  test("exportCsv guard: above the row bound it fails fast naming exportCsvParts") {
    val dir = tmpDir("csv-guard-")
    val assignments = Seq((0L, 1L), (1L, 1L), (2L, -1L)).toDF("id", "cluster_id")
    val e = intercept[IllegalArgumentException](
      graft.operators.Clustering.exportCsv(assignments, dir + "/out", maxRows = 2))
    assert(e.getMessage.contains("exportCsvParts"))
    // the partitioned form writes parallel parts + a header sidecar
    graft.operators.Clustering.exportCsvParts(assignments, dir + "/parts")
    val header = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir + "/parts", "_header.csv")), "UTF-8")
    assert(header.trim == "id,cluster_id")
    val back = spark.read.schema("id STRING, cluster_id STRING").csv(dir + "/parts")
      .collect().map(r => (r.getString(0).toLong, r.getString(1).toLong)).toSet
    assert(back == Set((0L, 1L), (1L, 1L), (2L, -1L)))
  }
}
