package graft

import graft.functions.ProtoSerde
import org.apache.spark.sql.functions._

/** Protobuf wire-format SerDe: golden bytes, presence semantics,
  * unknown-field skipping, and the registered identity query. */
class ProtoSerdeSpec extends SparkSpec {
  import spark.implicits._

  private val spec = "1:int64:a,2:string:b"

  private def enc(df: org.apache.spark.sql.DataFrame, s: String = spec) =
    df.select(ProtoSerde.proto_encode(struct(df.columns.map(col): _*), s).as("bin"))
      .as[Array[Byte]]

  test("golden wire bytes: varint tag/value, length-delimited string") {
    val out = enc(Seq((1L, "hi")).toDF("a", "b")).head()
    assert(out.toSeq === Seq(0x08, 0x01, 0x12, 0x02, 'h'.toInt, 'i'.toInt).map(_.toByte))
    // negative int64: ten-byte two's-complement varint, per spec
    val neg = enc(Seq((-1L, "")).toDF("a", "b")).head()
    assert(neg.toSeq === (Seq.fill(1)(0x08) ++ Seq.fill(9)(0xff) ++ Seq(0x01) ++
      Seq(0x12, 0x00)).map(_.toByte))
  }

  test("proto3 presence: null field omitted on encode, NULL on decode") {
    val bytes = Seq(Tuple2[java.lang.Long, String](null, "x")).toDF("a", "b")
      .select(ProtoSerde.proto_encode(struct(col("a"), col("b")), spec).as("bin"))
      .as[Array[Byte]].head()
    assert(bytes.toSeq === Seq(0x12, 0x01, 'x'.toInt).map(_.toByte)) // only field 2
    val back = Seq(bytes).toDF("bin")
      .select(ProtoSerde.proto_decode(col("bin"), spec).as("r"))
      .select("r.a", "r.b").as[(Option[Long], String)].head()
    assert(back === ((None, "x")))
  }

  test("unknown field numbers are skipped by wire type") {
    // field 9 (string "zz") + field 15 (fixed64) + field 1 (int64 5)
    val alien = (Seq((9 << 3) | 2, 2, 'z'.toInt, 'z'.toInt) ++
      Seq((15 << 3) | 1, 1, 2, 3, 4, 5, 6, 7, 8) ++
      Seq(0x08, 0x05)).map(_.toByte).toArray
    val back = Seq(alien).toDF("bin")
      .select(ProtoSerde.proto_decode(col("bin"), spec).as("r"))
      .select("r.a", "r.b").as[(Option[Long], Option[String])].head()
    assert(back === ((Some(5L), None)))
  }

  test("malformed negative varint length fails loudly, no backwards seek (ADVICE r5)") {
    // field 2 (string) with a 10-byte varint encoding length -1: a
    // signed read yields len < 0 which passes `o2 + len <= b.length`
    // and would move the offset BACKWARDS — must be rejected instead.
    val negLen = (Seq(0x12) ++ Seq.fill(9)(0xff) ++ Seq(0x01) ++ Seq('x'.toInt))
      .map(_.toByte).toArray
    val e1 = intercept[Exception] {
      Seq(negLen).toDF("bin")
        .select(ProtoSerde.proto_decode(col("bin"), spec).as("r"))
        .select("r.a").collect()
    }
    assert(e1.toString.contains("truncated") ||
      Option(e1.getCause).exists(_.toString.contains("truncated")))
    // same guard on the unknown-field skip path (field 9, wire type 2)
    val negSkip = (Seq((9 << 3) | 2) ++ Seq.fill(9)(0xff) ++ Seq(0x01))
      .map(_.toByte).toArray
    val e2 = intercept[Exception] {
      Seq(negSkip).toDF("bin")
        .select(ProtoSerde.proto_decode(col("bin"), spec).as("r"))
        .select("r.a").collect()
    }
    assert(e2.toString.contains("truncated") ||
      Option(e2.getCause).exists(_.toString.contains("truncated")))
  }

  test("round-trip across every supported type") {
    val all = "1:int64:l,2:int32:i,3:bool:o,4:double:d,5:float:f,6:string:s,7:bytes:y"
    val df = Seq((42L, -7, true, 2.0, -1.5f, "héllo", Array[Byte](9, 8)))
      .toDF("l", "i", "o", "d", "f", "s", "y")
    val back = df.select(ProtoSerde.proto_decode(
        ProtoSerde.proto_encode(struct(df.columns.map(col): _*), all), all).as("r"))
      .select("r.*")
      .as[(Long, Int, Boolean, Double, Float, String, Array[Byte])].head()
    assert(back.copy(_7 = null) === ((42L, -7, true, 2.0, -1.5f, "héllo", null)))
    assert(back._7.toSeq === Seq[Byte](9, 8))
    // double wire bytes are little-endian IEEE: 2.0 -> 00.. 40 after tag 0x21
    val d2 = enc(Seq(Tuple1(2.0)).toDF("d"), "4:double:d").head()
    assert(d2.toSeq === (Seq(0x21) ++ Seq(0, 0, 0, 0, 0, 0, 0, 0x40)).map(_.toByte))
  }

  test("spec validation: bad types, duplicate numbers, wire-type clash") {
    intercept[IllegalArgumentException] { ProtoSerde.parseSpec("1:uint128:x") }
    intercept[IllegalArgumentException] { ProtoSerde.parseSpec("1:int64:x,1:bool:y") }
    intercept[IllegalArgumentException] { ProtoSerde.parseSpec("0:int64:x") }
    // decoding field 1 as string when encoded as varint must fail loudly
    val bytes = enc(Seq((1L, "b")).toDF("a", "b")).head()
    val ex = intercept[Exception] {
      Seq(bytes).toDF("bin")
        .select(ProtoSerde.proto_decode(col("bin"), "1:string:a,2:string:b"))
        .collect()
    }
    assert(ex.toString.contains("wire type") ||
      Option(ex.getCause).exists(_.toString.contains("wire type")))
  }

  test("registered proto_roundtrip query decodes every envelope row") {
    val out = SparkEntry.queries("proto_roundtrip")(spark, "/root/testdata/sf0.001")
    assert(out.count() === 1000L)
    assert(out.filter(col("value").isNull).count() > 0)
  }
}
