package graft

import graft.functions.AvroSerde
import org.apache.spark.sql.functions._

/** Avro binary SerDe: golden wire bytes (hand-assembled zigzag varints),
  * nullable-union round-trips, and the registered identity query. */
class AvroSerdeSpec extends SparkSpec {
  import spark.implicits._

  private val flatSchema =
    """{"type":"record","name":"t","fields":[
      |{"name":"a","type":"long"},
      |{"name":"b","type":"string"}]}""".stripMargin

  test("golden wire bytes: zigzag varint long + length-prefixed string") {
    val out = Seq((1L, "hi")).toDF("a", "b")
      .select(AvroSerde.avro_encode(struct(col("a"), col("b")), flatSchema).as("bin"))
      .as[Array[Byte]].head()
    // long 1 -> zigzag 2 -> 0x02; string "hi" -> len 2 -> 0x04 'h' 'i'
    assert(out.toSeq === Seq(0x02, 0x04, 'h'.toByte, 'i'.toByte).map(_.toByte))
    // negative long -150 -> zigzag 299 -> varint 0xab 0x02
    val neg = Seq((-150L, "")).toDF("a", "b")
      .select(AvroSerde.avro_encode(struct(col("a"), col("b")), flatSchema).as("bin"))
      .as[Array[Byte]].head()
    assert(neg.toSeq === Seq(0xab.toByte, 0x02.toByte, 0x00.toByte))
  }

  test("nullable union: index prefix 0x00 for null, 0x02 + value otherwise") {
    val schema =
      """{"type":"record","name":"t","fields":[
        |{"name":"v","type":["null","string"],"default":null}]}""".stripMargin
    val rows = Seq(Tuple1[String](null), Tuple1("x")).toDF("v")
      .select(AvroSerde.avro_encode(struct(col("v")), schema).as("bin"))
      .as[Array[Byte]].collect()
    assert(rows(0).toSeq === Seq(0x00.toByte))
    assert(rows(1).toSeq === Seq(0x02, 0x02, 'x'.toByte).map(_.toByte))
  }

  test("round-trip across every supported type incl. null branch") {
    val schema =
      """{"type":"record","name":"all","fields":[
        |{"name":"b","type":"boolean"},
        |{"name":"i","type":"int"},
        |{"name":"l","type":"long"},
        |{"name":"f","type":"float"},
        |{"name":"d","type":"double"},
        |{"name":"s","type":"string"},
        |{"name":"y","type":"bytes"},
        |{"name":"n","type":["null","long"],"default":null}]}""".stripMargin
    val df = Seq(
      (true, 7, 42L, 1.5f, 2.25, "héllo", Array[Byte](1, 2), Some(9L)),
      (false, -1, -42L, -0.5f, -2.25, "", Array.emptyByteArray, None)
    ).toDF("b", "i", "l", "f", "d", "s", "y", "n")
    val back = df.select(AvroSerde.avro_decode(
        AvroSerde.avro_encode(struct(df.columns.map(col): _*), schema),
        schema).as("r"))
      .select("r.*")
      .as[(Boolean, Int, Long, Float, Double, String, Array[Byte], Option[Long])]
      .collect()
    assert(back(0).copy(_7 = null) ===
      ((true, 7, 42L, 1.5f, 2.25, "héllo", null, Some(9L))))
    assert(back(0)._7.toSeq === Seq[Byte](1, 2))
    assert(back(1)._6 === "")
    assert(back(1)._7.toSeq === Seq.empty)
    assert(back(1)._8 === None)
  }

  test("struct fields match avro fields by NAME, not position") {
    val out = Seq(("hi", 1L)).toDF("b", "a") // reversed column order
      .select(AvroSerde.avro_decode(
        AvroSerde.avro_encode(struct(col("b"), col("a")), flatSchema),
        flatSchema).as("r"))
      .select("r.a", "r.b").as[(Long, String)].head()
    assert(out === ((1L, "hi")))
  }

  test("nested record: golden bytes and round-trip, name-matched per level") {
    val schema =
      """{"type":"record","name":"t","fields":[
        |{"name":"a","type":"long"},
        |{"name":"meta","type":{"type":"record","name":"m","fields":[
        |  {"name":"lang","type":"string"},
        |  {"name":"n","type":"int"}]}}]}""".stripMargin
    val df = Seq((5L, "en", 2)).toDF("a", "lang", "n")
      // nested struct deliberately field-REVERSED vs the avro schema:
      // encoding must match by name at every level
      .select(col("a"), struct(col("n"), col("lang")).as("meta"))
    val bytes = df.select(AvroSerde.avro_encode(
      struct(col("a"), col("meta")), schema).as("bin")).as[Array[Byte]].head()
    // long 5 -> zigzag 0x0A; then inline record: string "en" (len 2 ->
    // 0x04, 'e','n'), int 2 -> zigzag 0x04 — avro nesting has no length
    // prefix, the record is just its fields in schema order
    assert(bytes.toSeq === Seq(0x0A, 0x04, 'e'.toInt, 'n'.toInt, 0x04).map(_.toByte))
    val back = Seq(bytes).toDF("bin")
      .select(AvroSerde.avro_decode(col("bin"), schema).as("r"))
      .select("r.a", "r.meta.lang", "r.meta.n").as[(Long, String, Int)].head()
    assert(back === ((5L, "en", 2)))
  }

  test("arrays: golden bytes (block count + items + terminator) and round-trip") {
    val schema =
      """{"type":"record","name":"t","fields":[
        |{"name":"xs","type":{"type":"array","items":"long"}}]}""".stripMargin
    val bytes = Seq(Tuple1(Seq(1L, 2L, 300L))).toDF("xs")
      .select(AvroSerde.avro_encode(struct(col("xs")), schema).as("bin"))
      .as[Array[Byte]].head()
    // block count 3 -> zigzag 0x06; items 1,2,300 -> 0x02, 0x04, 0xD8 0x04;
    // then the 0x00 end-of-blocks marker
    assert(bytes.toSeq === Seq(0x06, 0x02, 0x04, 0xD8, 0x04, 0x00).map(_.toByte))
    val back = Seq(bytes).toDF("bin")
      .select(AvroSerde.avro_decode(col("bin"), schema).as("r"))
      .select("r.xs").as[Seq[Long]].head()
    assert(back === Seq(1L, 2L, 300L))
    // empty array: just the zero block count
    val empty = Seq(Tuple1(Seq.empty[Long])).toDF("xs")
      .select(AvroSerde.avro_encode(struct(col("xs")), schema).as("bin"))
      .as[Array[Byte]].head()
    assert(empty.toSeq === Seq(0x00.toByte))
  }

  test("maps and nested composites round-trip; nullable array elements") {
    val schema =
      """{"type":"record","name":"t","fields":[
        |{"name":"props","type":{"type":"map","values":"string"}},
        |{"name":"tags","type":{"type":"array","items":["null","string"]}},
        |{"name":"metas","type":{"type":"array","items":
        |  {"type":"record","name":"m","fields":[{"name":"k","type":"string"},
        |    {"name":"c","type":"long"}]}}}]}""".stripMargin
    val df = Seq(1).toDF("one").select(
      map(lit("a"), lit("1"), lit("b"), lit("2")).as("props"),
      array(lit("x"), lit(null).cast("string")).as("tags"),
      array(struct(lit("k1").as("k"), lit(7L).as("c")),
        struct(lit("k2").as("k"), lit(9L).as("c"))).as("metas"))
    val back = df.select(AvroSerde.avro_encode(
        struct(col("props"), col("tags"), col("metas")), schema).as("bin"))
      .select(AvroSerde.avro_decode(col("bin"), schema).as("r"))
      .select("r.props", "r.tags", "r.metas")
      .as[(Map[String, String], Seq[Option[String]], Seq[(String, Long)])].head()
    assert(back._1 === Map("a" -> "1", "b" -> "2"))
    assert(back._2 === Seq(Some("x"), None))
    assert(back._3 === Seq(("k1", 7L), ("k2", 9L)))
  }

  test("recursive avro schemas are rejected cleanly, not with a stack overflow") {
    val recursive =
      """{"type":"record","name":"node","fields":[
        |{"name":"v","type":"long"},
        |{"name":"next","type":["null","node"]}]}""".stripMargin
    val e = intercept[Exception] {
      Seq(Tuple1(1L)).toDF("v")
        .select(AvroSerde.avro_decode(lit(Array.emptyByteArray), recursive))
        .collect()
    }
    assert(e.toString.contains("recursive") ||
      Option(e.getCause).exists(_.toString.contains("recursive")))
  }

  test("null in a non-nullable field fails loudly") {
    val ex = intercept[Exception] {
      Seq(Tuple2[java.lang.Long, String](null, "x")).toDF("a", "b")
        .select(AvroSerde.avro_encode(struct(col("a"), col("b")), flatSchema))
        .collect()
    }
    assert(ex.toString.contains("non-nullable") ||
      Option(ex.getCause).exists(_.toString.contains("non-nullable")))
  }

  test("registered avro_roundtrip query decodes every envelope row") {
    val out = SparkEntry.queries("avro_roundtrip")(spark, "/root/testdata/sf0.001")
    assert(out.count() === 1000L)
    // tombstone rows survive the union null branch
    assert(out.filter(col("value").isNull).count() > 0)
  }
}
