package graft.cdc

import org.apache.avro.{Schema, SchemaNormalization}
import org.apache.spark.sql.types._
import java.util.Base64

/** Avro schema generation from a Catalyst StructType + CRC-64-AVRO Rabin
  * fingerprints — the Spark-native analogue of the reference's pg-catalog →
  * Avro schema generator and registry keys (creek pgtype-avro/schema.go,
  * pgtype-avro/type_map.go; fingerprints as in client.go:271 where the
  * 8-byte single-object header is base64-url encoded).
  *
  * Uses the public Apache Avro library (on the Spark classpath) for
  * canonical-form parsing fingerprints (Avro spec §"Schema Fingerprints").
  */
object AvroSchemaGen {

  /** JSON Avro type for one Catalyst type (nullable → ["null", T] union,
    * matching pgtype-avro's nullable unions).
    */
  def avroType(dt: DataType, nullable: Boolean, name: String, ns: String): String = {
    val base = dt match {
      case BooleanType => "\"boolean\""
      case IntegerType | ShortType | ByteType => "\"int\""
      case LongType => "\"long\""
      case FloatType => "\"float\""
      case DoubleType => "\"double\""
      case StringType => "\"string\""
      case BinaryType => "\"bytes\""
      case TimestampType =>
        """{"type":"long","logicalType":"timestamp-micros"}"""
      case TimestampNTZType =>
        """{"type":"long","logicalType":"local-timestamp-micros"}"""
      case DateType => """{"type":"int","logicalType":"date"}"""
      case _: DecimalType => "\"string\"" // decimal→string, conversion.go:121
      case ArrayType(et, containsNull) =>
        s"""{"type":"array","items":${avroType(et, containsNull, name + "_item", ns)}}"""
      case st: StructType => record(st, name, ns)
      case other => throw new IllegalArgumentException(s"unsupported type $other")
    }
    if (nullable) s"""["null",$base]""" else base
  }

  /** Avro record schema JSON for a StructType. */
  def record(st: StructType, name: String, namespace: String): String = {
    val fields = st.fields.map { f =>
      s"""{"name":"${f.name}","type":${avroType(f.dataType, f.nullable, f.name, namespace)}}"""
    }.mkString(",")
    s"""{"type":"record","name":"$name","namespace":"$namespace","fields":[$fields]}"""
  }

  def parse(json: String): Schema = new Schema.Parser().parse(json)

  /** CRC-64-AVRO Rabin fingerprint of the parsing canonical form. */
  def fingerprint64(schema: Schema): Long =
    SchemaNormalization.parsingFingerprint64(schema)

  def fingerprint64(st: StructType, name: String): Long =
    fingerprint64(parse(record(st, name, "graft")))

  /** Little-endian 8 bytes of the fingerprint — the byte order used in the
    * Avro single-object encoding header (and thus in creek's base64-url
    * fingerprint strings, client.go:271).
    */
  def fingerprintBytes(fp: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(fp).array()

  def fingerprintB64(fp: Long): String =
    Base64.getUrlEncoder.withoutPadding.encodeToString(fingerprintBytes(fp))

  def fingerprintHex(fp: Long): String = f"$fp%016x"
}
