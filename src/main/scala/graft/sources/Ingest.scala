package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus ingest — the reference's two sources re-expressed
  * (CSV upload app.py:199-212; text-area lines app.py:214-223), plus
  * the driver `documents` table as the scale-path source.
  *
  * Corpus schema everywhere: `(id: Long, sentence: String)` with
  * positional ids (the reference's row id IS the list position,
  * app.py:22,28). Positional ids come from `zipWithIndex`, which is
  * contiguous and follows file order (partition indexes are assigned
  * in file-offset order), so it scales without a single-partition
  * coalesce; for 100 TB corpora a source-provided id (`doc_id`) is
  * the better key and [[corpusFromDocuments]] uses it directly.
  */
object Ingest {

  val SentencesCol = "sentences"

  /** CSV source (reference app.py:199-212): header CSV, requires a
    * column literally named `sentences` (errors like the reference's
    * app.py:208 message if missing), values coerced to string. */
  def fromCsv(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("header", "true").csv(path)
    if (!raw.columns.contains(SentencesCol)) {
      throw new IllegalArgumentException(
        s"CSV file must have a '$SentencesCol' column")
    }
    withPositionalId(raw.select(col(SentencesCol).cast("string").as("sentence")))
  }

  /** Text-lines source (reference app.py:214-223): split on newline,
    * trim each line, drop empties. */
  def fromLines(spark: SparkSession, text: String): DataFrame = {
    val lines = text.split("\n").iterator.map(_.trim).filter(_.nonEmpty).toSeq
    val rows = lines.zipWithIndex.map { case (s, i) => Row(i.toLong, s) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, lines.size / 10000).min(32)),
      corpusSchema)
  }

  /** Same as [[fromLines]] but distributed: a DataFrame with one string
    * column of raw lines (trim + drop-empty semantics, P1/F1). */
  def fromLinesDf(df: DataFrame): DataFrame = {
    val cleaned = df.select(trim(col(df.columns.head)).as("sentence"))
      .filter(length(col("sentence")) > 0)
    withPositionalId(cleaned)
  }

  /** Driver `documents` table as a corpus: source-provided contiguous
    * id, trim + non-empty filter applied for parity with line ingest.
    * Deliberately UNORDERED: this is the shared source under ~20
    * operators, and a global sort here costs a range exchange in any
    * derived query that doesn't destroy order (Catalyst strips it
    * under aggregates, but order-preserving derivations would pay it).
    * Queries whose OUTPUT contract is id order sort at their own
    * output edge. */
  def corpusFromDocuments(spark: SparkSession, sfDir: String): DataFrame = {
    graft.Tables.documents(spark, sfDir)
      .select(col("doc_id").as("id"), trim(col("text")).as("sentence"))
      .filter(length(col("sentence")) > 0)
  }

  /** Newline-joined corpus display (reference F3: the text-area
    * render, `"\n".join(sentences)`, app.py:231-233) — the one UI
    * string operation, expressed scale-safely: a `limit(cap)` on id
    * order bounds what reaches the single-row aggregate (a display
    * surface is bounded by definition; an uncapped global collect_list
    * would funnel the corpus through one task). Returns one row
    * (n_docs, joined) with sentences in id order. */
  def joinedDisplay(corpus: DataFrame, cap: Int = 500): DataFrame =
    corpus.orderBy(col("id").asc).limit(cap)
      .agg(
        count(lit(1)).as("n_docs"),
        array_join(
          transform(array_sort(collect_list(struct(col("id"), col("sentence")))),
            x => x.getField("sentence")),
          "\n").as("joined"))

  private val corpusSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("sentence", StringType, nullable = true)))

  /** Prepend a contiguous positional `id` following partition order. */
  def withPositionalId(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val fields = StructField("id", LongType, nullable = false) +: df.schema.fields
    val rdd = df.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(idx +: row.toSeq)
    }
    spark.createDataFrame(rdd, StructType(fields))
  }
}
