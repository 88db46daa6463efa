package graft.sources

import java.io.File
import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.util.Utf8
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import graft.cdc.AvroSchemaGen

/** Avro OBJECT CONTAINER FILE sink + source for flat DataFrames — the
  * batch-file twin of the single-object wire codec (c14/c20): header
  * schema + sync-marked snappy blocks, so every file is self-describing
  * and a reader needs no registry. This is the interchange format the
  * reference's Avro ecosystem speaks when WAL/snapshot streams land in
  * files rather than NATS subjects.
  *
  * Scale shape: the ENCODE is fully distributed — one container file per
  * partition, per-partition DatumWriter (the Chunking/AvroEnvelope codec
  * discipline, no driver funnel); the READ is a `binaryFile` scan (Avro
  * blocks aren't byte-splittable without the sync-scan Hadoop input
  * format, so the parallel unit is the file — which is exactly the
  * per-partition unit the writer produced). Files land on whatever
  * filesystem the path names; production writes go through a commit
  * protocol (this sink writes directly — it exists to exercise the codec,
  * not to replace the parquet sink's committer).
  */
object AvroFiles {

  /** Avro schema for a flat Catalyst schema; a field is a null union iff
    * Catalyst says it's nullable (AvroSchemaGen.record's nullability is
    * keys-driven, so the non-nullable fields pose as keys).
    */
  def schemaFor(st: StructType, name: String): Schema =
    AvroSchemaGen.parse(AvroSchemaGen.record(st, name, "graftfile",
      keys = st.fields.filterNot(_.nullable).map(_.name).toSet))

  private def toAvro(v: Any, dt: DataType): AnyRef = v match {
    case null => null
    case t: java.sql.Timestamp => java.lang.Long.valueOf(
      t.getTime * 1000L + (t.getNanos / 1000L) % 1000L)
    case i: java.time.Instant => java.lang.Long.valueOf(
      i.getEpochSecond * 1000000L + i.getNano / 1000L)
    case b: Array[Byte] => java.nio.ByteBuffer.wrap(b) // avro bytes
    case d: java.sql.Date => java.lang.Integer.valueOf(
      d.toLocalDate.toEpochDay.toInt) // avro int/date
    case d: java.time.LocalDate => java.lang.Integer.valueOf(d.toEpochDay.toInt)
    case d: java.math.BigDecimal => d.toPlainString // decimal→string (pg map)
    case d: BigDecimal => d.bigDecimal.toPlainString
    case other => other.asInstanceOf[AnyRef] // Long/Int/Double/Boolean/String
  }

  private def fromAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (u: Utf8, dt) =>
      if (dt.isInstanceOf[DecimalType]) new java.math.BigDecimal(u.toString)
      else u.toString
    case (s: String, _: DecimalType) => new java.math.BigDecimal(s)
    case (l: java.lang.Long, TimestampType) =>
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        Math.floorDiv(l.longValue(), 1000000L),
        Math.floorMod(l.longValue(), 1000000L) * 1000L))
    case (i: java.lang.Integer, DateType) =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.longValue()))
    case (b: java.nio.ByteBuffer, BinaryType) =>
      val out = new Array[Byte](b.remaining()); b.duplicate().get(out); out
    case (other, _) => other
  }

  /** Write one Avro container file per partition under `dir`. */
  def write(df: DataFrame, dir: String, recordName: String): Unit = {
    val st = df.schema
    val json = schemaFor(st, recordName).toString
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val schema = new Schema.Parser().parse(json)
        val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
          .setCodec(CodecFactory.snappyCodec())
        w.create(schema, new File(dir, f"part-${TaskContext.getPartitionId()}%05d.avro"))
        try it.foreach { row =>
          val rec = new GenericData.Record(schema)
          var i = 0
          while (i < st.fields.length) {
            rec.put(st.fields(i).name, toAvro(row.get(i), st.fields(i).dataType))
            i += 1
          }
          w.append(rec)
        } finally w.close()
      }
    }
  }

  /** Read every container file under `dir` back into `st`-shaped rows,
    * decoding each file with the schema EMBEDDED in its header (fields
    * resolved by name — the reader needs nothing but the bytes).
    */
  def read(s: SparkSession, dir: String, st: StructType): DataFrame = {
    val rows = s.read.format("binaryFile")
      .option("pathGlobFilter", "*.avro").load(dir)
      .select("content").rdd.flatMap { r =>
        val rd = new DataFileReader[GenericRecord](
          new SeekableByteArrayInput(r.getAs[Array[Byte]](0)),
          new GenericDatumReader[GenericRecord]())
        // materialize before close — the reader's iterator is lazy
        val out = Vector.newBuilder[Row]
        try {
          while (rd.hasNext) {
            val rec = rd.next()
            out += Row.fromSeq(st.fields.toSeq.map(f =>
              fromAvro(rec.get(f.name), f.dataType)))
          }
        } finally rd.close()
        out.result()
      }
    s.createDataFrame(rows, st)
  }
}
