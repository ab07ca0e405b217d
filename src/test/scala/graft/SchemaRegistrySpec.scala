package graft

import graft.model.SchemaRegistry
import graft.model.SchemaRegistry.Compat._
import org.apache.spark.sql.types._

/** Compatibility-strategy semantics per SchemaCompatibilityStrategy.java. */
class SchemaRegistrySpec extends SparkSpec {
  import spark.implicits._

  private val v1 = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true)))
  private val v2AddNullable = v1.add(StructField("email", StringType, nullable = true))
  private val v2AddRequired = v1.add(StructField("email", StringType, nullable = false))
  private val v2Removed = StructType(v1.fields.filter(_.name != "name"))
  private val v2Widened = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true)))

  test("BACKWARD accepts added-nullable field; rejects added-required") {
    assert(SchemaRegistry.isCompatible(v2AddNullable, Seq(v1), Backward))
    assert(!SchemaRegistry.isCompatible(v2AddRequired, Seq(v1), Backward))
  }

  test("FORWARD accepts removal of nullable field; rejects removal of required") {
    assert(SchemaRegistry.isCompatible(v2Removed, Seq(v1), Forward))
    val v1ReqName = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = false)))
    assert(!SchemaRegistry.isCompatible(StructType(v1ReqName.fields.take(1)),
      Seq(v1ReqName), Forward))
  }

  test("FULL requires both directions") {
    assert(SchemaRegistry.isCompatible(v2Widened, Seq(v1), Full))
    assert(!SchemaRegistry.isCompatible(v2AddRequired, Seq(v1), Full))
  }

  test("TRANSITIVE checks all prior versions") {
    val v3 = v2AddNullable.add(StructField("age", IntegerType, nullable = true))
    assert(SchemaRegistry.isCompatible(v3, Seq(v1, v2AddNullable), BackwardTransitive))
    // v3' incompatible with v1 even though compatible with v2
    val v3Bad = StructType(v2AddNullable.fields.map {
      case f if f.name == "id" => f.copy(dataType = StringType)
      case f => f
    })
    assert(!SchemaRegistry.isCompatible(v3Bad, Seq(v1, v2AddNullable), BackwardTransitive))
  }

  test("ALWAYS_COMPATIBLE / ALWAYS_INCOMPATIBLE") {
    assert(SchemaRegistry.isCompatible(v2AddRequired, Seq(v1), AlwaysCompatible))
    assert(!SchemaRegistry.isCompatible(v1, Seq(v1), AlwaysIncompatible))
  }

  test("int->long / float->double widening allowed, narrowing rejected") {
    val wInt = StructType(Seq(StructField("x", IntegerType)))
    val rLong = StructType(Seq(StructField("x", LongType)))
    assert(SchemaRegistry.isCompatible(rLong, Seq(wInt), Backward))
    assert(!SchemaRegistry.isCompatible(wInt, Seq(rLong), Backward))
  }

  test("AUTO_CONSUME union-read fills missing columns with null") {
    val f1 = Seq((1L, "a")).toDF("id", "name")
    val f2 = Seq((2L, "b@x.com")).toDF("id", "email")
    val u = SchemaRegistry.unionRead(Seq(f1, f2))
    assert(u.columns.toSet == Set("id", "name", "email"))
    assert(u.count() == 2)
    assert(u.filter(u("email").isNull).count() == 1)
  }

  test("KEY_VALUE decode: INLINE from payload, SEPARATED from envelope key") {
    val ks = StructType(Seq(StructField("uid", LongType)))
    val vs = StructType(Seq(StructField("amount", DoubleType)))
    val sep = Seq(("""{"uid": 7}""", """{"amount": 1.5}"""))
      .toDF("key", "value")
    val outSep = SchemaRegistry.decodeKeyValue(sep, ks, vs, separated = true)
      .select("kv.key.uid", "kv.value.amount").collect().head
    assert(outSep.getLong(0) == 7L && outSep.getDouble(1) == 1.5)
    val inl = Seq(("ignored", """{"key": {"uid": 9}, "value": {"amount": 2.5}}"""))
      .toDF("key", "value")
    val outInl = SchemaRegistry.decodeKeyValue(inl, ks, vs, separated = false)
      .select("kv.key.uid", "kv.value.amount").collect().head
    assert(outInl.getLong(0) == 9L && outInl.getDouble(1) == 2.5)
  }

  test("versioned JSON decode dispatches per schema_version") {
    val v1s = StructType(Seq(StructField("k", LongType)))
    val v2s = StructType(Seq(StructField("k", LongType), StructField("tag", StringType)))
    val df = Seq(
      ("""{"k": 1}""", 1), ("""{"k": 2, "tag": "x"}""", 2))
      .toDF("value", "schema_version")
    val out = SchemaRegistry.decodeVersioned(df, "value", Map(1 -> v1s, 2 -> v2s))
      .select("decoded.k", "decoded.tag").collect()
    assert(out(0).getLong(0) == 1L && out(0).isNullAt(1))
    assert(out(1).getLong(0) == 2L && out(1).getString(1) == "x")
  }
}
