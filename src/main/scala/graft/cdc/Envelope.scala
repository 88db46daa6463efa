package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Lsn

/** WAL envelope over the testdata `events` table.
  *
  * Mirrors the reference envelope (creek messages.go:28-89): op codes
  * c/u/u_pk/d/t/r, source{name,tx_at,db,schema,table,tx_id,lsn},
  * nullable before/after table-shaped structs. The lift from `events`
  * is deterministic and SQL-expressible (SURVEY.md §3) so the DuckDB
  * oracle can verify apply/replay semantics on identical inputs:
  *   - event_type → op (signup→c, click→u, purchase→u_pk, error→d,
  *     view→r), overridden to t every 101st event_id;
  *   - lsn = event_id + 1 (monotonic WAL position);
  *   - pk = user_id; a u_pk event moves the row to pk user_id+100000.
  */
object Envelope {
  /** New primary key assigned by a u_pk (pk-changing) update. */
  val UpkShift = 100000L

  // Truncates are rare and land early in the stream at every sf
  // (5003 is prime; % == 1 avoids event_id 0) so a meaningful tail of
  // ops survives the last cut at sf0.001/0.01/0.1 alike.
  private val opCol: Column =
    when(col("event_id") % 5003 === 1, "t")
      .when(col("event_type") === "signup", "c")
      .when(col("event_type") === "click", "u")
      .when(col("event_type") === "purchase", "u_pk")
      .when(col("event_type") === "error", "d")
      .otherwise("r")

  /** Flat change-event form: one row per WAL entry with the columns every
    * downstream CDC operator consumes. Stays fully codegen'd.
    * Columns: lsn_long, tx_at, user_id, value, op, pk_before, pk_after,
    * after_value.
    */
  def flat(events: DataFrame): DataFrame =
    events
      .select(
        (col("event_id") + 1).as("lsn_long"),
        col("ts").as("tx_at"),
        col("user_id"),
        col("value"),
        opCol.as("op"))
      .withColumn("pk_before",
        when(col("op").isin("u", "u_pk", "d"), col("user_id")))
      .withColumn("pk_after",
        when(col("op").isin("c", "u", "r"), col("user_id"))
          .when(col("op") === "u_pk", col("user_id") + UpkShift))
      .withColumn("after_value",
        when(col("op").isin("c", "u", "r", "u_pk"), col("value")))

  /** Full nested WAL envelope (the user-facing schema, messages.go:38-45).
    * before/after are nullable structs shaped like the replicated row.
    */
  def envelope(events: DataFrame, fingerprint: String): DataFrame =
    flat(events).select(
      lit(fingerprint).as("fingerprint"),
      struct(
        lit("graft").as("name"),
        col("tx_at"),
        lit("testdb").as("db"),
        lit("public").as("schema"),
        lit("events").as("table"),
        col("lsn_long").as("tx_id"),
        Lsn.long_to_lsn(col("lsn_long")).as("lsn")).as("source"),
      col("op"),
      col("tx_at").as("sent_at"),
      when(col("pk_before").isNotNull,
        struct(col("pk_before").as("user_id"),
          lit(null).cast("double").as("value"))).as("before"),
      when(col("pk_after").isNotNull,
        struct(col("pk_after").as("user_id"),
          col("after_value").as("value"),
          col("tx_at").as("ts"))).as("after"),
      col("lsn_long"))

  // ---- DuckDB oracle fragments (kept adjacent so Spark/SQL can't drift) --

  /** `env` CTE: events → (lsn_long, tx_at, user_id, value, op). */
  val sqlEnv: String =
    """env AS (
      |  SELECT event_id + 1 AS lsn_long, ts::TIMESTAMP AS tx_at, user_id, value,
      |    CASE WHEN event_id % 5003 = 1 THEN 't'
      |         WHEN event_type = 'signup' THEN 'c'
      |         WHEN event_type = 'click' THEN 'u'
      |         WHEN event_type = 'purchase' THEN 'u_pk'
      |         WHEN event_type = 'error' THEN 'd'
      |         ELSE 'r' END AS op
      |  FROM events)""".stripMargin

  /** `flat` CTE: env + pk_before/pk_after/after_value. */
  val sqlFlat: String =
    """flat AS (
      |  SELECT lsn_long, tx_at, user_id, value, op,
      |    CASE WHEN op IN ('u','u_pk','d') THEN user_id END AS pk_before,
      |    CASE WHEN op IN ('c','u','r') THEN user_id
      |         WHEN op = 'u_pk' THEN user_id + 100000 END AS pk_after,
      |    CASE WHEN op IN ('c','u','r','u_pk') THEN value END AS after_value
      |  FROM env)""".stripMargin

  /** printf fragment for LSN text form of a BIGINT expression. */
  def sqlLsnStr(e: String): String =
    s"printf('%X/%X', ($e) >> 32, ($e) & 4294967295)"
}
