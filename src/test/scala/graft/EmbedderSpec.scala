package graft

import graft.functions.Embedder

/** The deterministic hashing embedder's contract (reference capability
  * app.py:18-20,35-43; construction documented in Embedder.scala). */
class EmbedderSpec extends SparkSpec {
  import spark.implicits._

  test("deterministic: identical text yields identical vectors") {
    val a = Embedder.embedToFloats("the quick brown fox", 64)
    val b = Embedder.embedToFloats("the quick brown fox", 64)
    assert(a.sameElements(b))
  }

  test("unit L2 norm for any text with at least one token; zero vector otherwise") {
    val v = Embedder.embedToFloats("hello world hello", 64)
    val norm = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
    assert(math.abs(norm - 1.0) < 1e-6)
    assert(Embedder.embedToFloats("", 64).forall(_ == 0f))
    assert(Embedder.embedToFloats("!!! ???", 64).forall(_ == 0f))
  }

  test("dimension is respected") {
    assert(Embedder.embedToFloats("a b c", 8).length == 8)
    assert(Embedder.embedToFloats("a b c", 128).length == 128)
  }

  test("case-insensitive and separator-insensitive tokenization") {
    val a = Embedder.embedToFloats("Hello, WORLD!", 32)
    val b = Embedder.embedToFloats("hello world", 32)
    assert(a.sameElements(b))
  }

  test("different texts map to different vectors (no trivial collapse)") {
    val a = Embedder.embedToFloats("spark catalyst tungsten", 64)
    val b = Embedder.embedToFloats("duck db oracle", 64)
    assert(!a.sameElements(b))
  }

  test("expression path equals the kernel (codegen and interpreted agree)") {
    val texts = Seq("one two three", "", "Mixed CASE tokens", "a1 b2 c3")
    val viaExpr = texts.toDF("t")
      .select(graft.functions.embed_text(org.apache.spark.sql.functions.col("t"), 16))
      .collect().map(_.getSeq[Float](0).toArray)
    texts.zip(viaExpr).foreach { case (t, got) =>
      assert(got.sameElements(Embedder.embedToFloats(t, 16)), s"mismatch for '$t'")
    }
  }
}
