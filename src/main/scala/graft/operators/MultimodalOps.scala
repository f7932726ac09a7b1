package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Ingest

/** Multimodal-column plumbing (BASELINE.json north star): treat
  * image/audio/video as opaque `binary` payloads with typed metadata
  * and run decode/feature-extraction as a partition-batched codec —
  * the Scala analogue of a `mapInPandas` batch UDF.
  *
  * The container has no image/audio libraries (zero egress), so the
  * decode step is a clearly-marked deterministic stand-in
  * ([[fakeDecode]]): it consumes the payload bytes and emits a
  * fixed-size feature vector. Everything AROUND it — the binary
  * schema, the per-partition batch loop (amortizing any native codec
  * init once per partition, exactly where a JNI/TorchScript handle
  * would live), the metadata struct, and the downstream columnar
  * projection — is real, tested, and is what survives when a real
  * codec replaces the stand-in.
  *
  * 100 TB posture: payloads are the dominant bytes; this pipeline
  * never shuffles them (narrow map → project scalars/vectors, payload
  * dropped before any wide op), and column pruning means queries not
  * touching `payload` never read it from parquet.
  */
object MultimodalOps {

  /** One multimodal row: opaque payload + typed metadata. */
  case class MediaRow(id: Long, mime: String, payload: Array[Byte])

  /** Extracted features: cheap scalars + a fixed-size embedding. */
  case class MediaFeatures(id: Long, mime: String, n_bytes: Long,
                           fp: String, feature: Array[Float])

  val FeatureDim = 16

  /** Deterministic stand-in for a media decoder: byte histogram over
    * `FeatureDim` buckets, L2-normalized. A real deployment swaps this
    * one function for an image/audio codec; the batch loop around it
    * is unchanged. */
  def fakeDecode(payload: Array[Byte]): Array[Float] = {
    val acc = new Array[Double](FeatureDim)
    var i = 0
    while (i < payload.length) { acc((payload(i) & 0xff) % FeatureDim) += 1.0; i += 1 }
    var norm = 0.0
    var j = 0
    while (j < FeatureDim) { norm += acc(j) * acc(j); j += 1 }
    val inv = if (norm == 0.0) 0.0 else 1.0 / math.sqrt(norm)
    val out = new Array[Float](FeatureDim)
    j = 0
    while (j < FeatureDim) { out(j) = (acc(j) * inv).toFloat; j += 1 }
    out
  }

  /** The documents corpus as a multimodal table: UTF-8 payload bytes
    * stand in for media bytes (the driver testdata has no binary
    * columns — schema and volume shape are what matter). */
  def mediaFromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Ingest.corpusFromDocuments(spark, sfDir)
      .select(col("id"), lit("text/plain").as("mime"),
        encode(col("sentence"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** Partition-batched decode + feature extraction. `mapPartitions`
    * is deliberate (SURVEY §2.10): codec initialization happens once
    * per partition (where a native handle would be opened), then rows
    * stream through it — the JVM analogue of a `mapInPandas` batch. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition codec init would go here (native lib handle,
      // model session, ...). The fake codec needs none.
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        md.reset()
        val fp = md.digest(r.payload).map("%02x".format(_)).mkString
        MediaFeatures(r.id, r.mime, r.payload.length.toLong, fp, fakeDecode(r.payload))
      }
    }
  }

  /** One sampled frame: payload slice index + its scalar features. */
  case class FrameRow(id: Long, frame_idx: Long, n_frame_bytes: Long,
                      frame_md5: String)

  /** Frame sampling — the video-side primitive of the multimodal
    * family: treat the payload as fixed-size frames, keep every
    * `stride`-th one, fingerprint each INSIDE the partition-batched
    * codec (same batch loop as [[extractFeatures]]; a real deployment
    * decodes the kept frames here instead of hashing slices). Fan-out
    * is rows-per-frame but stays narrow — the payload itself is
    * dropped, only per-frame scalars leave the map. */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int = 64,
                   stride: Int = 2): Dataset[FrameRow] = {
    require(frameBytes > 0 && stride > 0)
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.flatMap { r =>
        val nFrames = (r.payload.length + frameBytes - 1) / frameBytes
        (0 until nFrames).iterator
          .filter(_ % stride == 0)
          .map { i =>
            val from = i * frameBytes
            val until = math.min(r.payload.length, from + frameBytes)
            md.reset()
            val fp = md.digest(java.util.Arrays.copyOfRange(r.payload, from, until))
              .map("%02x".format(_)).mkString
            FrameRow(r.id, i.toLong, (until - from).toLong, fp)
          }
      }
    }
  }

  /** Registered-query surface for frame sampling over the stand-in
    * corpus (documents are ASCII, so the DuckDB oracle reproduces the
    * byte slices with substr — asserted by the hash match). */
  def frameSampleStats(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    sampleFrames(mediaFromDocuments(spark, sfDir))
      .toDF()
      .orderBy(col("id").asc, col("frame_idx").asc)
  }

  /** Oracle-able scalar projection of the multimodal pipeline:
    * (id, mime, n_bytes, fp). n_bytes/md5 are computed inside the
    * batched codec, so a hash-match here proves the binary plumbing
    * end-to-end (DuckDB: octet_length(encode(text)), md5(text)). */
  def mediaFeatureStats(spark: SparkSession, sfDir: String): DataFrame = {
    extractFeatures(mediaFromDocuments(spark, sfDir))
      .toDF()
      .select(col("id"), col("mime"), col("n_bytes"), col("fp"))
      .orderBy(col("id").asc)
  }
}
