package graft.cdc

import java.io.ByteArrayOutputStream
import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Flat WAL record as carried through the Avro binary codec. */
case class WalRecord(lsn_long: Long, op: String, pk: Long,
  value: Option[Double], tx_at_us: Long)

/** Decoded roundtrip result; fp_ok/magic_ok prove the framing held. */
case class WalDecoded(lsn_long: Long, op: String, pk: Long,
  value: Option[Double], tx_at_us: Long, magic_ok: Boolean, fp_ok: Boolean)

/** WAL Avro binary encode/decode with single-object framing: the 2-byte
  * magic 0xC3 0x01, the 8-byte little-endian CRC-64-AVRO fingerprint, then
  * the Avro binary body — exactly the wire format the reference client
  * checks before dispatching on fingerprint (creek client.go:264-291,
  * Avro spec "Single object encoding").
  *
  * Encoding runs per partition with one reusable encoder (mapPartitions is
  * justified here: a binary codec is genuine per-partition imperative
  * logic), so at scale it streams through executors with no driver hop.
  */
object AvroWal {
  val schemaJson: String =
    """{"type":"record","name":"wal_flat","namespace":"graft","fields":[
      |{"name":"lsn_long","type":"long"},
      |{"name":"op","type":"string"},
      |{"name":"pk","type":"long"},
      |{"name":"value","type":["null","double"]},
      |{"name":"tx_at_us","type":"long"}]}""".stripMargin.replace("\n", "")

  lazy val fingerprint: Long =
    AvroSchemaGen.fingerprint64(AvroSchemaGen.parse(schemaJson))

  /** Flat envelope → WalRecord rows (truncates carry no row payload). */
  def walRecords(flat: DataFrame)(implicit s: SparkSession): Dataset[WalRecord] = {
    import s.implicits._
    flat.filter(col("op") =!= "t")
      .select(col("lsn_long"), col("op"),
        coalesce(col("pk_after"), col("pk_before")).as("pk"),
        col("after_value").as("value"),
        unix_micros(col("tx_at")).as("tx_at_us"))
      .as[WalRecord]
  }

  def encodeOne(schema: Schema, fp: Long, r: WalRecord): Array[Byte] = {
    val out = new ByteArrayOutputStream(64)
    out.write(0xC3); out.write(0x01)
    out.write(AvroSchemaGen.fingerprintBytes(fp), 0, 8)
    val rec = new GenericData.Record(schema)
    rec.put("lsn_long", r.lsn_long)
    rec.put("op", r.op)
    rec.put("pk", r.pk)
    rec.put("value", r.value.map(java.lang.Double.valueOf).orNull)
    rec.put("tx_at_us", r.tx_at_us)
    val enc = EncoderFactory.get.binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  def decodeOne(schema: Schema, fp: Long, bytes: Array[Byte]): WalDecoded = {
    val magicOk = bytes.length > 10 &&
      (bytes(0) & 0xFF) == 0xC3 && (bytes(1) & 0xFF) == 0x01
    val gotFp = java.nio.ByteBuffer.wrap(bytes, 2, 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
    val dec = DecoderFactory.get.binaryDecoder(bytes, 10, bytes.length - 10, null)
    val rec = new GenericDatumReader[GenericRecord](schema).read(null, dec)
    WalDecoded(
      rec.get("lsn_long").asInstanceOf[Long],
      rec.get("op").toString,
      rec.get("pk").asInstanceOf[Long],
      Option(rec.get("value")).map(_.asInstanceOf[Double]),
      rec.get("tx_at_us").asInstanceOf[Long],
      magicOk, gotFp == fp)
  }

  /** Encode every change event to single-object bytes, decode back. */
  def roundtrip(flat: DataFrame)(implicit s: SparkSession): Dataset[WalDecoded] = {
    import s.implicits._
    val json = schemaJson
    val fp = fingerprint
    walRecords(flat).mapPartitions { it =>
      val schema = new Schema.Parser().parse(json)
      it.map(r => decodeOne(schema, fp, encodeOne(schema, fp, r)))
    }
  }
}
