package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Ingest

/** Deterministic dataset splitting — the train/val/test assignment a
  * training pipeline needs to be REPRODUCIBLE and JOIN-FREE at any
  * scale (absent from the reference, whose corpus fits one screen;
  * north-star extension per BASELINE.json).
  *
  * Split by content-independent hash of the document id: stable under
  * reruns, shard-order, and corpus growth (adding docs never moves an
  * existing doc's split), and computable by any engine that has md5 —
  * the DuckDB oracle reproduces the assignment bit-for-bit. The first
  * two hex chars of `md5(salt || id)` are uniform over 256 values;
  * comparing against hex-literal thresholds gives ~80/10/10 without
  * any numeric conversion (hex-string order is ASCII order in both
  * engines).
  */
object Sampling {

  /** Per-document split assignment over the driver corpus:
    * (id, split) with split ∈ train|val|test at ~80/10/10. */
  def sampleSplit(spark: SparkSession, sfDir: String,
                  salt: String = "graft"): DataFrame =
    sampleSplitCorpus(Ingest.corpusFromDocuments(spark, sfDir), salt)

  def sampleSplitCorpus(corpus: DataFrame, salt: String = "graft"): DataFrame =
    corpus
      .withColumn("hx",
        substring(md5(concat(lit(salt), col("id").cast("string"))), 1, 2))
      // 0x00..0xcc -> train (205/256 ~ 80.1%), 0xcd..0xe6 -> val
      // (26/256 ~ 10.2%), rest -> test (25/256 ~ 9.8%)
      .withColumn("split",
        when(col("hx") < "cd", "train")
          .when(col("hx") < "e7", "val")
          .otherwise("test"))
      .select(col("id"), col("split"))
      .orderBy(col("id").asc)

  /** Per-source sampling rates for the mixture (hex thresholds over
    * the first two md5 chars, same mechanism as sampleSplit):
    * src0 keeps ~80%, src1 ~50%, src2 ~25%, everything else ~10%. */
  val MixtureRates: Seq[(String, String)] =
    Seq("src0" -> "cd", "src1" -> "80", "src2" -> "40")
  val MixtureDefaultRate: String = "1a"

  /** Domain-mixture downsampling — reweighting sources to a target
    * mixture is the step between corpus assembly and training. Keep
    * decisions are per-row hash thresholds (deterministic, join-free,
    * content-independent — a row's fate never depends on other rows,
    * so the operator is a pure narrow filter at any scale). Returns
    * the per-source audit table (source, n_total, n_kept) a pipeline
    * logs as its mixture card. */
  def mixtureSample(spark: SparkSession, sfDir: String,
                    salt: String = "mix"): DataFrame = {
    val keepThreshold = MixtureRates.foldRight(lit(MixtureDefaultRate)) {
      case ((src, hex), els) => when(col("source") === src, lit(hex)).otherwise(els)
    }
    graft.Tables.documents(spark, sfDir)
      .withColumn("hx",
        substring(md5(concat(lit(salt), col("doc_id").cast("string"))), 1, 2))
      .withColumn("keep", col("hx") < keepThreshold)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
      .orderBy(col("source").asc)
  }
}
