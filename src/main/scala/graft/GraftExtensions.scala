package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions._

/** Spark-native integration point: users add
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (or `.withExtensions(new GraftExtensions)`) and every graft scalar
  * kernel is available in pure SQL on every session of that context —
  * no imperative `registerVectorFunctions` call, and the functions
  * are injected at the registry level the planner consults, so
  * codegen'd expressions stay codegen'd.
  *
  * This is the extension mechanism Spark designed for libraries
  * (SparkSessionExtensions); the engine deliberately needs only
  * `injectFunction` — the operators compose from declarative plans,
  * so there is no custom Rule/Strategy to inject.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  // 3-arg constructor: the longer forms validate `group`/`source`
  // against built-in whitelists; usage text lives in the scaladoc
  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, usage: String)(builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))

    inject("l2sq", "squared L2 distance of two float/double arrays") {
      es => L2Sq(es(0), es(1))
    }
    inject("vec_dot", "dot product of two float/double arrays") {
      es => DotProduct(es(0), es(1))
    }
    inject("cosine_sim", "cosine similarity (0.0 on zero norm)") {
      es => CosineSim(es(0), es(1))
    }
    inject("embed_text", "deterministic hashing text embedder") {
      case Seq(text)      => EmbedText(text, Embedder.DefaultDim)
      case Seq(text, dim) => EmbedText(text, dim.eval().asInstanceOf[Number].intValue())
      case es             => EmbedText(es.head, Embedder.DefaultDim)
    }
    inject("simhash64", "64-bit SimHash fingerprint of a text column") {
      es => SimHash64(es(0))
    }
    inject("quant_scale", "int8 quantization scale: max(abs(x))/127") {
      es => QuantScale(es(0))
    }
    inject("quantize_i8", "symmetric int8 quantization to array<tinyint>") {
      es => QuantizeI8(es(0))
    }
    inject("dot_i8", "exact integer dot product of int8 vectors") {
      es => DotI8(es(0), es(1))
    }
  }
}
