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

  test("fakeDecode is deterministic and payload-sensitive") {
    val a = MultimodalOps.fakeDecode("same bytes".getBytes)
    val b = MultimodalOps.fakeDecode("same bytes".getBytes)
    val c = MultimodalOps.fakeDecode("other payload!".getBytes)
    assert(a.sameElements(b))
    assert(!a.sameElements(c))
    assert(MultimodalOps.fakeDecode(Array.emptyByteArray).forall(_ == 0f))
  }
}
