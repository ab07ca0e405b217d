package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * SQL surface for the engine's custom expressions (SURVEY §2.15: parity
 * needs Spark's whole `functions._` catalog — free — plus the
 * Pulsar-specific expressions exposed to SQL users).
 *
 * Two registration paths:
 *  - [[Registry.registerAll]] for an existing session;
 *  - [[GraftExtensions]] via `spark.sql.extensions=graft.functions.GraftExtensions`
 *    for injection at session build (the idiomatic deployment).
 */
object Registry {
  private[functions] def all: Seq[(String, Seq[Expression] => Expression)] = fns

  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "pulsar_hash" -> (es => PulsarHashExpr(es.head)),
    "dot_product" -> (es => DotProductExpr(es(0), es(1))),
    "cosine_sim" -> (es => CosineSimExpr(es(0), es(1))),
    "sign_lsh" -> (es => SignLshExpr(es(0),
      es(1).eval().asInstanceOf[Number].intValue())),
    "minhash_sig" -> (es => MinHashSigExpr(es(0),
      es(1).eval().asInstanceOf[Number].intValue())),
    "simhash_sig" -> (es => SimHashSigExpr(es.head)),
    "char_ngrams" -> (es => CharNgramsExpr(es(0),
      es(1).eval().asInstanceOf[Number].intValue())),
    "char_entropy" -> (es => CharEntropyExpr(es.head)),
    "shingle_hashes" -> (es => ShingleHashExpr(es(0),
      es(1).eval().asInstanceOf[Number].intValue(),
      es(2).eval().asInstanceOf[Boolean])),
    "hll_sketch" -> (es => HllSketchAgg(es.head,
      if (es.length > 1) es(1).eval().asInstanceOf[Number].intValue()
      else Hll.DefaultP).toAggregateExpression()),
    "hll_merge" -> (es => HllMergeAgg(es.head).toAggregateExpression()),
    "hll_estimate" -> (es => HllEstimateExpr(es.head)),
    "cms_sketch" -> (es => CmsSketchAgg(es.head,
      if (es.length > 1) es(1).eval().asInstanceOf[Number].intValue() else Cms.DefaultDepth,
      if (es.length > 2) es(2).eval().asInstanceOf[Number].intValue() else Cms.DefaultWidth)
      .toAggregateExpression()),
    "cms_merge" -> (es => CmsMergeAgg(es.head).toAggregateExpression()),
    "cms_estimate" -> (es => CmsEstimateExpr(es(0), es(1))),
    "kmv_sketch" -> (es => KmvSketchAgg(es(0), es(1),
      if (es.length > 2) es(2).eval().asInstanceOf[Number].intValue() else Kmv.DefaultK)
      .toAggregateExpression()),
    "kmv_merge" -> (es => KmvMergeAgg(es.head).toAggregateExpression()),
    "kmv_quantile" -> (es => KmvQuantileExpr(es(0), es(1))),
    "bloom_sketch" -> (es => BloomSketchAgg(es.head,
      if (es.length > 1) es(1).eval().asInstanceOf[Number].intValue() else Bloom.DefaultBits,
      if (es.length > 2) es(2).eval().asInstanceOf[Number].intValue() else Bloom.DefaultK)
      .toAggregateExpression()),
    "bloom_merge" -> (es => BloomMergeAgg(es.head).toAggregateExpression()),
    "bloom_contains" -> (es => BloomContainsExpr(es(0), es(1))),
    "ss_sketch" -> (es => SsSketchAgg(es.head,
      if (es.length > 1) es(1).eval().asInstanceOf[Number].intValue()
      else SpaceSaving.DefaultCapacity).toAggregateExpression()),
    "ss_merge" -> (es => SsMergeAgg(es.head).toAggregateExpression()),
    "ss_probe" -> (es => SsProbeExpr(es(0), es(1))),
    "ss_topk" -> (es => SsTopkExpr(es(0),
      es(1).eval().asInstanceOf[Number].intValue())),
    "ngram_coverage" -> (es => NgramCoverageExpr(es(0),
      es(1).eval().asInstanceOf[Number].intValue())),
    "nfc_normalize" -> (es => NfcNormalizeExpr(es.head)),
    "url_canonicalize" -> (es => UrlCanonicalizeExpr(es.head)),
    // schema-registry SerDes: second arg is the (foldable) spec/schema
    "proto_encode" -> (es => ProtoEncodeExpr(es(0), es(1).eval().toString)),
    "proto_decode" -> (es => ProtoDecodeExpr(es(0), es(1).eval().toString)),
    "avro_encode" -> (es => AvroEncodeExpr(es(0), es(1).eval().toString)),
    "avro_decode" -> (es => AvroDecodeExpr(es(0), es(1).eval().toString))
  )

  def registerAll(spark: SparkSession): Unit =
    fns.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

/** Session-extension injection point (SparkSessionExtensions): the same
  * catalog [[Registry.registerAll]] installs, injected at session build
  * (`spark.sql.extensions=graft.functions.GraftExtensions`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    Registry.all.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), builder))
    }
  }
}
