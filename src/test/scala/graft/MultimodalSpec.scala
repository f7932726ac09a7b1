package graft

import graft.operators.MultimodalOps

/** Multimodal binary-column plumbing: schema, batch shape, and the
  * deterministic stand-in codec (SURVEY extension; the real decode
  * swaps in behind the same mapPartitions loop). */
class MultimodalSpec extends SparkSpec {

  test("media table schema: (id, mime, payload binary)") {
    val media = MultimodalOps.mediaFromDocuments(spark, sfSmall)
    val fields = media.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(fields("id") == "long")
    assert(fields("mime") == "string")
    assert(fields("payload") == "binary")
  }

  test("extractFeatures: fp/n_bytes match driver-side recomputation; feature is unit-norm") {
    val feats = MultimodalOps.extractFeatures(
        MultimodalOps.mediaFromDocuments(spark, sfSmall))
      .collect().map(f => f.id -> f).toMap
    val docs = graft.sources.Ingest.corpusFromDocuments(spark, sfSmall)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(feats.keySet == docs.keySet)
    val md = java.security.MessageDigest.getInstance("MD5")
    docs.take(25).foreach { case (id, text) =>
      val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val f = feats(id)
      assert(f.n_bytes == bytes.length)
      md.reset()
      assert(f.fp == md.digest(bytes).map("%02x".format(_)).mkString)
      assert(f.feature.length == MultimodalOps.FeatureDim)
      val norm = math.sqrt(f.feature.map(x => x.toDouble * x.toDouble).sum)
      assert(math.abs(norm - 1.0) < 1e-5)
    }
  }

  test("sampleFrames: stride-2 frame selection covers exactly the even frames") {
    import spark.implicits._
    // 150 bytes -> frames 0..2 (64, 64, 22 bytes); stride 2 keeps 0 and 2
    val payload = ("x" * 150).getBytes("UTF-8")
    val media = Seq(MultimodalOps.MediaRow(7L, "video/fake", payload)).toDS()
    val frames = MultimodalOps.sampleFrames(media, frameBytes = 64, stride = 2)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(f => (f.frame_idx, f.n_frame_bytes)).toSeq ==
      Seq((0L, 64L), (2L, 22L)))
    // fingerprints are of the SLICES: frame 0 is 64 x's, frame 2 is 22 x's
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: String) = md.digest(s.getBytes).map("%02x".format(_)).mkString
    assert(frames(0).frame_md5 == h("x" * 64))
    assert(frames(1).frame_md5 == h("x" * 22))
    // stride 1 keeps every frame; empty payload yields no frames
    assert(MultimodalOps.sampleFrames(media, 64, 1).count() == 3)
    val empty = Seq(MultimodalOps.MediaRow(8L, "video/fake",
      Array.emptyByteArray)).toDS()
    assert(MultimodalOps.sampleFrames(empty, 64, 2).count() == 0)
  }

  test("fakeDecode is deterministic and payload-sensitive") {
    val a = MultimodalOps.fakeDecode("same bytes".getBytes)
    val b = MultimodalOps.fakeDecode("same bytes".getBytes)
    val c = MultimodalOps.fakeDecode("other payload!".getBytes)
    assert(a.sameElements(b))
    assert(!a.sameElements(c))
    assert(MultimodalOps.fakeDecode(Array.emptyByteArray).forall(_ == 0f))
  }
}
