package graft

import graft.ext.VectorOps
import org.apache.spark.sql.functions._

/** Int8 scalar quantization: code values, reconstruction bound,
  * quantized dot product, zero-vector edge. */
class VecQuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("codes: max maps to ±127, round-half-away, zero stays zero") {
    val q = Seq(Tuple1(Seq(127.0f, -127.0f, 0.0f, 0.5f, -0.5f))).toDF("embedding")
      .select(VectorOps.quantizeI8(col("embedding")).as("q"))
      .select(col("q.scale"), col("q.codes")).as[(Double, Seq[Byte])].head()
    assert(q._1 === 1.0)
    // 0.5/1.0 + 0.5 = 1.0 -> floor 1 (half away from zero both signs)
    assert(q._2 === Seq[Byte](127, -127, 0, 1, -1))
  }

  test("reconstruction error bounded by scale/2; dequantize inverts within bound") {
    val rnd = new scala.util.Random(9)
    val vecs = Seq.tabulate(200)(i =>
      (i.toLong, Seq.fill(16)((rnd.nextFloat() - 0.5f) * 10f)))
      .toDF("vec_id", "embedding")
    val checked = VectorOps.withQuantizedI8(vecs)
      .select(col("vec_id"), col("q.scale").as("s"),
        aggregate(zip_with(col("embedding"), VectorOps.dequantizeI8(col("q")),
          (x, d) => abs(x.cast("double") - d)), lit(0.0), (a, e) => greatest(a, e))
          .as("max_err"))
      .as[(Long, Double, Double)].collect()
    checked.foreach { case (id, s, err) =>
      assert(err <= s * 0.5000001, s"vec $id err $err scale $s")
    }
  }

  test("quantized dot approximates the true dot within the error envelope") {
    val a = Seq(Tuple1(Seq(1.0f, 2.0f, -3.0f, 4.0f))).toDF("embedding")
    val q = VectorOps.withQuantizedI8(a).select(col("q")).collect().head.getStruct(0)
    val dotQ = Seq((Seq(1.0f, 2.0f, -3.0f, 4.0f), Seq(2.0f, 0.5f, 1.0f, -1.0f)))
      .toDF("va", "vb")
      .select(VectorOps.quantizedDot(
        VectorOps.quantizeI8(col("va")), VectorOps.quantizeI8(col("vb"))).as("d"),
        VectorOps.dot(col("va"), col("vb")).as("t"))
      .as[(Double, Double)].head()
    // true dot = 2 + 1 - 3 - 4 = -4; 8-bit error envelope is small
    assert(math.abs(dotQ._2 - -4.0) < 1e-6)
    assert(math.abs(dotQ._1 - dotQ._2) < 0.2, s"quantized ${dotQ._1} vs ${dotQ._2}")
  }

  test("zero vector quantizes to scale 0, all-zero codes, err_ok") {
    val q = Seq(Tuple1(Seq(0.0f, 0.0f))).toDF("embedding")
      .select(VectorOps.quantizeI8(col("embedding")).as("q"))
      .select(col("q.scale"), col("q.codes")).as[(Double, Seq[Byte])].head()
    assert(q === ((0.0, Seq[Byte](0, 0))))
  }

  test("registered vec_quantize query: certificate true on real embeddings") {
    val out = SparkEntry.queries("vec_quantize")(spark, "/root/testdata/sf0.001").collect()
    assert(out.length === 500) // embeddings table rows at sf0.001
    assert(out.forall(_.getBoolean(3)), "reconstruction bound violated")
  }
}
