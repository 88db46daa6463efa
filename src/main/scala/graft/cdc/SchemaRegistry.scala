package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import scala.collection.mutable.ArrayBuffer

/** Schema registry: fingerprint → schema lookup and latest-schema-by-
  * subject (creek client.go:169-219, internal/dao/schemas.go). Entries are
  * driver-side metadata (schemas are tiny); lookups and the "latest per
  * subject" view are exposed as DataFrames so they compose with plans and
  * can be broadcast to executors for decode joins.
  */
case class RegistryEntry(subject: String, fingerprintHex: String,
  fingerprintB64: String, schemaJson: String, createdAtMicros: Long)

class SchemaRegistry(spark: SparkSession) {
  private val entries = ArrayBuffer.empty[RegistryEntry]

  /** Register a schema version; returns its Rabin fingerprint. */
  def register(subject: String, st: StructType, createdAtMicros: Long): Long = {
    val name = subject.substring(subject.lastIndexOf('.') + 1)
    val json = AvroSchemaGen.record(st, name, "graft")
    val fp = AvroSchemaGen.fingerprint64(AvroSchemaGen.parse(json))
    entries += RegistryEntry(subject, AvroSchemaGen.fingerprintHex(fp),
      AvroSchemaGen.fingerprintB64(fp), json, createdAtMicros)
    fp
  }

  def all(): DataFrame = {
    import spark.implicits._
    entries.toSeq.toDF()
  }

  /** Lookup by fingerprint (GetSchema by fingerprint in the reference). */
  def byFingerprint(hex: String): Option[String] =
    entries.find(_.fingerprintHex == hex).map(_.schemaJson)

  /** Latest registered schema per subject (GetLastSchema). */
  def latestBySubject(): DataFrame =
    all().groupBy(col("subject"))
      .agg(
        count(lit(1)).as("n_versions"),
        max_by(col("fingerprintHex"), col("createdAtMicros")).as("latest_fingerprint"),
        max_by(length(col("schemaJson")), col("createdAtMicros")).as("latest_schema_len"),
        max(col("createdAtMicros")).as("latest_created_at"))
}
