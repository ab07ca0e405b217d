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

  test("nested message: golden wire bytes and round-trip") {
    val nested = "1:int64:a,2:message{1:string:lang,2:int32:n}:meta"
    val df = Seq((5L, "en", 2)).toDF("a", "lang", "n")
      .select(col("a"), struct(col("lang"), col("n")).as("meta"))
    val bytes = df.select(ProtoSerde.proto_encode(
      struct(col("a"), col("meta")), nested).as("bin")).as[Array[Byte]].head()
    // field 1 varint 5; field 2 length-delimited submessage {lang:"en", n:2}
    assert(bytes.toSeq === Seq(0x08, 0x05, 0x12, 0x06,
      0x0A, 0x02, 'e'.toInt, 'n'.toInt, 0x10, 0x02).map(_.toByte))
    val back = Seq(bytes).toDF("bin")
      .select(ProtoSerde.proto_decode(col("bin"), nested).as("r"))
      .select("r.a", "r.meta.lang", "r.meta.n").as[(Long, String, Int)].head()
    assert(back === ((5L, "en", 2)))
    // absent submessage decodes NULL (presence kept)
    val noMeta = Seq(Array[Byte](0x08, 0x07)).toDF("bin")
      .select(ProtoSerde.proto_decode(col("bin"), nested).as("r"))
    assert(noMeta.select("r.a").as[Long].head() === 7L)
    assert(noMeta.filter(col("r.meta").isNull).count() === 1L)
  }

  test("repeated numeric encodes packed; decoder accepts packed AND expanded") {
    val rspec = "1:repeated int64:xs"
    val bytes = Seq(Tuple1(Seq(1L, 2L, 300L))).toDF("xs")
      .select(ProtoSerde.proto_encode(struct(col("xs")), rspec).as("bin"))
      .as[Array[Byte]].head()
    // ONE length-delimited block: payloads 01, 02, AC 02 (proto3 packed)
    assert(bytes.toSeq === Seq(0x0A, 0x04, 0x01, 0x02, 0xAC, 0x02).map(_.toByte))
    def dec(b: Array[Byte]) = Seq(b).toDF("bin")
      .select(ProtoSerde.proto_decode(col("bin"), rspec).as("r"))
      .select("r.xs").as[Seq[Long]].head()
    assert(dec(bytes) === Seq(1L, 2L, 300L))
    // expanded form (one tag per element) must decode identically
    assert(dec(Array[Byte](0x08, 0x01, 0x08, 0x02, 0x08, 0xAC.toByte, 0x02)) ===
      Seq(1L, 2L, 300L))
    // empty repeated: omitted on encode, decodes EMPTY (never null)
    val empty = Seq(Tuple1(Seq.empty[Long])).toDF("xs")
      .select(ProtoSerde.proto_encode(struct(col("xs")), rspec).as("bin"))
      .as[Array[Byte]].head()
    assert(empty.isEmpty)
    assert(dec(Array.emptyByteArray) === Seq.empty[Long])
  }

  test("repeated strings and repeated messages: one tag per element") {
    val sBytes = Seq(Tuple1(Seq("ab", "c"))).toDF("ss")
      .select(ProtoSerde.proto_encode(struct(col("ss")), "1:repeated string:ss").as("bin"))
      .as[Array[Byte]].head()
    assert(sBytes.toSeq === Seq(0x0A, 0x02, 'a'.toInt, 'b'.toInt,
      0x0A, 0x01, 'c'.toInt).map(_.toByte))
    val mspec = "1:repeated message{1:int64:id,2:string:v}:es"
    val back = Seq(Tuple1(Seq((1L, "x"), (2L, "y")))).toDF("es")
      .select(transform(col("es"), e =>
        struct(e.getField("_1").as("id"), e.getField("_2").as("v"))).as("es"))
      .select(ProtoSerde.proto_encode(struct(col("es")), mspec).as("bin"))
      .select(ProtoSerde.proto_decode(col("bin"), mspec).as("r"))
      .select("r.es").as[Seq[(Long, String)]].head()
    assert(back === Seq((1L, "x"), (2L, "y")))
  }

  test("map fields: repeated key/value entry messages, proto3 entry defaults") {
    val mspec = "1:map{string,int64}:m"
    val bytes = Seq(Tuple1(Map("a" -> 1L, "bc" -> 2L))).toDF("m")
      .select(ProtoSerde.proto_encode(struct(col("m")), mspec).as("bin"))
      .as[Array[Byte]].head()
    assert(bytes.toSeq === Seq(
      0x0A, 0x05, 0x0A, 0x01, 'a'.toInt, 0x10, 0x01,
      0x0A, 0x06, 0x0A, 0x02, 'b'.toInt, 'c'.toInt, 0x10, 0x02).map(_.toByte))
    val back = Seq(bytes).toDF("bin")
      .select(ProtoSerde.proto_decode(col("bin"), mspec).as("r"))
      .select("r.m").as[Map[String, Long]].head()
    assert(back === Map("a" -> 1L, "bc" -> 2L))
    // entry with omitted value -> proto3 default (0), omitted key -> ""
    val sparseEntry = Array[Byte](0x0A, 0x03, 0x0A, 0x01, 'a'.toByte)
    val defaulted = Seq(sparseEntry).toDF("bin")
      .select(ProtoSerde.proto_decode(col("bin"), mspec).as("r"))
      .select("r.m").as[Map[String, Long]].head()
    assert(defaulted === Map("a" -> 0L))
    // absent map decodes EMPTY, never null
    val none = Seq(Array.emptyByteArray).toDF("bin")
      .select(ProtoSerde.proto_decode(col("bin"), mspec).as("r"))
      .select("r.m").as[Map[String, Long]].head()
    assert(none === Map.empty[String, Long])
  }

  test("map with message values: null-free decode, default instance, last-wins dup keys") {
    val mspec = "1:map{string,message{1:int64:n}}:m"
    // entry with only a key: the message value decodes to the DEFAULT
    // INSTANCE (empty message), never a null inside the map
    val keyOnly = Array[Byte](0x0A, 0x03, 0x0A, 0x01, 'a'.toByte)
    val r1 = Seq(keyOnly).toDF("bin")
      .select(ProtoSerde.proto_decode(col("bin"), mspec).as("r"))
      .select(map_values(col("r.m")).as("vs"))
    assert(r1.selectExpr("size(vs)").as[Int].head() === 1)
    assert(r1.selectExpr("vs[0].n").as[Option[Long]].head() === None) // empty message, present
    // duplicate map key: LAST wins, single entry survives
    def entry(k: Char, n: Int) =
      Seq(0x0A, 0x07, 0x0A, 0x01, k.toInt, 0x12, 0x02, 0x08, n).map(_.toByte)
    val dup = (entry('a', 1) ++ entry('a', 9)).toArray
    val r2 = Seq(dup).toDF("bin")
      .select(ProtoSerde.proto_decode(col("bin"), mspec).as("r"))
    assert(r2.selectExpr("size(r.m)").as[Int].head() === 1)
    assert(r2.selectExpr("r.m['a'].n").as[Long].head() === 9L)
  }

  test("length-delimited reads honor their CONTAINER boundary, not the buffer end") {
    // packed int64 block of declared len 1 whose varint continues past
    // the block end (0x80 needs another byte): must fail loudly, not
    // read into the next field's bytes
    val straddle = Array[Byte](0x0A, 0x01, 0x80.toByte, 0x01)
    val e1 = intercept[Exception] {
      Seq(straddle).toDF("bin")
        .select(ProtoSerde.proto_decode(col("bin"), "1:repeated int64:xs").as("r"))
        .select("r.xs").collect()
    }
    assert(e1.toString.contains("truncated") ||
      Option(e1.getCause).exists(_.toString.contains("truncated")))
    // submessage whose inner string extends past the submessage end
    val nested = "1:message{1:string:s}:m"
    val inner = Array[Byte](0x0A, 0x03, 0x0A, 0x05, 'a', 'b', 'c')
    val e2 = intercept[Exception] {
      Seq(inner).toDF("bin")
        .select(ProtoSerde.proto_decode(col("bin"), nested).as("r"))
        .select("r.m.s").collect()
    }
    assert(e2.toString.contains("truncated") ||
      Option(e2.getCause).exists(_.toString.contains("truncated")))
    // map entry whose key tag carries the wrong wire type fails loudly
    val badWt = Array[Byte](0x0A, 0x02, 0x0D, 0x00) // key tag wt=5 vs string
    val e3 = intercept[Exception] {
      Seq(badWt).toDF("bin")
        .select(ProtoSerde.proto_decode(col("bin"), "1:map{string,int64}:m").as("r"))
        .select("r.m").collect()
    }
    assert(e3.toString.contains("wire type") ||
      Option(e3.getCause).exists(_.toString.contains("wire type")))
  }

  test("composite spec validation: nested repeated, map keys, brace balance") {
    intercept[IllegalArgumentException] {
      ProtoSerde.parseSpec("1:repeated repeated int64:x")
    }
    intercept[IllegalArgumentException] {
      ProtoSerde.parseSpec("1:map{double,int64}:x") // float keys illegal
    }
    intercept[IllegalArgumentException] {
      ProtoSerde.parseSpec("1:message{1:int64:a:x") // unbalanced braces
    }
    intercept[IllegalArgumentException] {
      ProtoSerde.parseSpec("1:map{string,repeated int64}:x") // map value must be scalar/message
    }
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

  test("serde functions reachable from SQL: proto + avro roundtrip in pure SQL") {
    graft.functions.Registry.registerAll(spark)
    val got = spark.sql(
      """SELECT r.a, r.meta.lang, r.props['k'], r.ids
        |FROM (SELECT proto_decode(
        |  proto_encode(named_struct(
        |    'a', 7L, 'meta', named_struct('lang', 'en'),
        |    'props', map('k', 'v'), 'ids', array(1L, 2L)),
        |    '1:int64:a,2:message{1:string:lang}:meta,3:map{string,string}:props,4:repeated int64:ids'),
        |  '1:int64:a,2:message{1:string:lang}:meta,3:map{string,string}:props,4:repeated int64:ids') AS r)
        |""".stripMargin).as[(Long, String, String, Seq[Long])].head()
    assert(got === ((7L, "en", "v", Seq(1L, 2L))))
    val avro = spark.sql(
      """SELECT r.a, r.s FROM (SELECT avro_decode(avro_encode(
        |  named_struct('a', 5L, 's', 'x'),
        |  '{"type":"record","name":"t","fields":[{"name":"a","type":"long"},{"name":"s","type":"string"}]}'),
        |  '{"type":"record","name":"t","fields":[{"name":"a","type":"long"},{"name":"s","type":"string"}]}') AS r)
        |""".stripMargin).as[(Long, String)].head()
    assert(avro === ((5L, "x")))
  }

  test("registered proto_roundtrip query decodes every envelope row") {
    val out = SparkEntry.queries("proto_roundtrip")(spark, "/root/testdata/sf0.001")
    assert(out.count() === 1000L)
    assert(out.filter(col("value").isNull).count() > 0)
  }
}
