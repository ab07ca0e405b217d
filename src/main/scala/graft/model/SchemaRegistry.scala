package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Versioned per-topic schema registry with compatibility checks —
 * behavioral parity with the reference's schema service
 * (SchemaRegistryServiceImpl.java; strategies
 * SchemaCompatibilityStrategy.java:39-70: ALWAYS_COMPATIBLE,
 * ALWAYS_INCOMPATIBLE, BACKWARD, FORWARD, FULL and *_TRANSITIVE).
 *
 * Schemas are Spark StructTypes serialized as JSON beside the topic log;
 * compatibility is structural:
 *  - BACKWARD: new schema can read data written with the previous schema
 *    (fields may be added only if nullable; removals allowed — readers
 *    project them as absent);
 *  - FORWARD: previous schema can read data written with the new schema
 *    (fields may be removed only if nullable in the old schema; additions
 *    allowed);
 *  - FULL: both.
 * TRANSITIVE variants check against every prior version, not just latest.
 */
object SchemaRegistry {

  sealed trait Compat
  object Compat {
    case object AlwaysCompatible extends Compat
    case object AlwaysIncompatible extends Compat
    case object Backward extends Compat
    case object Forward extends Compat
    case object Full extends Compat
    case object BackwardTransitive extends Compat
    case object ForwardTransitive extends Compat
    case object FullTransitive extends Compat
  }
  import Compat._

  /** Can `reader` consume rows written as `writer`? Every writer field the
    * reader requires must exist with a compatible type; reader-only fields
    * must be nullable (filled with null on read). */
  private[model] def canRead(reader: StructType, writer: StructType): Boolean = {
    val writerFields = writer.fields.map(f => f.name -> f).toMap
    reader.fields.forall { rf =>
      writerFields.get(rf.name) match {
        case Some(wf) => typeCompatible(rf.dataType, wf.dataType)
        case None     => rf.nullable // missing in data -> must be fillable
      }
    }
  }

  private def typeCompatible(r: DataType, w: DataType): Boolean = (r, w) match {
    case (a, b) if a == b => true
    // safe widenings (Avro-style promotion)
    case (LongType, IntegerType | ShortType | ByteType) => true
    case (IntegerType, ShortType | ByteType) => true
    case (DoubleType, FloatType) => true
    case (rs: StructType, ws: StructType) => canRead(rs, ws)
    case (ArrayType(re, _), ArrayType(we, _)) => typeCompatible(re, we)
    case (MapType(rk, rv, _), MapType(wk, wv, _)) =>
      typeCompatible(rk, wk) && typeCompatible(rv, wv)
    case _ => false
  }

  /** Check `candidate` against existing `versions` (oldest first) under
    * `strategy`; returns true when the upload is accepted. */
  def isCompatible(candidate: StructType, versions: Seq[StructType],
                   strategy: Compat): Boolean = {
    if (versions.isEmpty) return strategy != AlwaysIncompatible
    val against = strategy match {
      case BackwardTransitive | ForwardTransitive | FullTransitive => versions
      case _ => Seq(versions.last)
    }
    strategy match {
      case AlwaysCompatible => true
      case AlwaysIncompatible => false
      case Backward | BackwardTransitive =>
        against.forall(prev => canRead(candidate, prev))
      case Forward | ForwardTransitive =>
        against.forall(prev => canRead(prev, candidate))
      case Full | FullTransitive =>
        against.forall(prev => canRead(candidate, prev) && canRead(prev, candidate))
    }
  }

  /**
   * AUTO_CONSUME union-read (reference Schema.AUTO_CONSUME →
   * GenericRecord; SURVEY §7.4): decode heterogeneous schema versions in
   * one scan — per-version frames decoded with their own schema then
   * unioned by name with missing columns null-filled.
   */
  def unionRead(frames: Seq[DataFrame]): DataFrame = {
    require(frames.nonEmpty,
      "unionRead needs at least one schema version's frame (topic has " +
        "no registered schemas?)")
    frames.reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
  }

  /**
   * Decode a JSON `value` column with the registered schema for each row's
   * schema_version — versioned from_json dispatch.
   */
  def decodeVersioned(df: DataFrame, valueCol: String,
                      schemas: Map[Int, StructType]): DataFrame = {
    val wide = widest(schemas.values.toSeq)
    val decoded = schemas.toSeq.sortBy(_._1).map { case (v, st) =>
      val parsed = from_json(col(valueCol), st)
      // re-shape each version onto the widest struct (null-fill + widen)
      val asWide = struct(wide.fields.map { f =>
        (if (st.fieldNames.contains(f.name))
           parsed.getField(f.name).cast(f.dataType)
         else lit(null).cast(f.dataType)).as(f.name)
      }.toIndexedSeq: _*)
      when(col(Envelope.SchemaVersion) === v, asWide)
    }.reduce((a, b) => coalesce(a, b))
    df.withColumn("decoded", decoded)
  }

  /**
   * AUTO_PRODUCE write validation (reference Schema.AUTO_PRODUCE_BYTES →
   * `schema.validate` before send): a writer DataFrame may append only if
   * its schema can be read by the topic's latest registered schema.
   * Returns the rejected reason or None.
   */
  def validateProduce(writerSchema: StructType,
                      registered: Seq[StructType]): Option[String] =
    registered.lastOption match {
      case None => None // no schema registered -> schema-less topic
      case Some(latest) =>
        if (canRead(latest, writerSchema)) None
        else Some(s"writer schema $writerSchema incompatible with topic schema $latest")
    }

  /**
   * KEY_VALUE schema decode (reference SchemaType.KEY_VALUE:120 with
   * KeyValueEncodingType.java:33-38):
   *  - INLINE: both key and value travel in the payload → one struct;
   *  - SEPARATED: key bytes live in the envelope `key` field, value in
   *    the payload → key decoded from the envelope column.
   * JSON codecs here; binary AVRO payloads go through
   * [[decodeAvro]] / [[graft.functions.AvroSerde]] the same way.
   */
  def decodeKeyValue(df: DataFrame, keySchema: StructType, valueSchema: StructType,
                     separated: Boolean,
                     payloadCol: String = Envelope.Value): DataFrame =
    if (separated)
      df.withColumn("kv", struct(
        from_json(col(Envelope.Key), keySchema).as("key"),
        from_json(col(payloadCol), valueSchema).as("value")))
    else
      df.withColumn("kv",
        from_json(col(payloadCol), StructType(Seq(
          StructField("key", keySchema), StructField("value", valueSchema)))))

  /** AVRO schema decode (reference SchemaType.AVRO — single-record
    * binary payloads): a BINARY payload column decoded against the
    * topic's Avro writer schema via [[graft.functions.AvroSerde]]. */
  def decodeAvro(df: DataFrame, avroSchemaJson: String,
                 payloadCol: String = Envelope.Value): DataFrame =
    df.withColumn("decoded",
      graft.functions.AvroSerde.avro_decode(col(payloadCol), avroSchemaJson))

  /** Widest struct across versions: union of fields, all nullable; on a
    * per-field type conflict keep the type that can READ the other (long
    * beats int, double beats float) so later widened versions are never
    * narrowed-and-corrupted on decode. INCOMPARABLE same-name types
    * (int vs string) are rejected loudly: silently keeping one side
    * would cast the other version's values to null on decode — data
    * corruption with no error, the exact failure the widening rule
    * exists to prevent. The reference's compat checker likewise refuses
    * such version sets (an int→string change passes no strategy). */
  private def widest(versions: Seq[StructType]): StructType = {
    val fields = scala.collection.mutable.LinkedHashMap[String, StructField]()
    versions.foreach(_.fields.foreach { f =>
      fields.get(f.name) match {
        case None => fields(f.name) = f.copy(nullable = true)
        case Some(prev) =>
          if (prev.dataType == f.dataType) () // same type, keep
          else if (typeCompatible(f.dataType, prev.dataType))
            fields(f.name) = f.copy(nullable = true) // f is wider
          else if (typeCompatible(prev.dataType, f.dataType))
            () // prev already widest
          else throw new IllegalArgumentException(
            s"field '${f.name}' has incomparable types across schema " +
              s"versions (${prev.dataType.simpleString} vs " +
              s"${f.dataType.simpleString}) — decoding one version " +
              s"through the other's type would null its values silently")
      }
    })
    StructType(fields.values.toSeq)
  }
}
