package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable.ArrayBuffer

/** Publication / table-allow-list orchestration — the daemon's config
  * surface (creek internal/config/config.go `Tables []string`,
  * cmd/creekd.go:93 StartReplication(cfg.Tables, ...)) plus the dynamic
  * membership protocol (internal/dao/init.go:91-116):
  *
  *   - the publication starts as the configured allow-list
  *     (ensurePublication, init.go:120-145);
  *   - `_creek.add_table` NOTIFYs payload `ADD <ns>.<table>` and
  *     `_creek.remove_table` NOTIFYs `REMOVE <table>` — note the
  *     reference's asymmetry: ADD carries the namespace, REMOVE the bare
  *     regclass name (init.go:96-98 vs 107-111);
  *   - the listener splits the payload on the FIRST space (api.go:76-92
  *     SplitN 2), persists the relation's schema on ADD
  *     (initRelationSchema) and moves the subscribed-tables gauge
  *     (metrics.IncSubscribedTables / Dec); malformed payloads are
  *     skipped, not fatal (api.go:78-81).
  *
  * A table's WAL only flows to its topic while the table is a member, so
  * membership intervals directly gate the data plane — which is what c27
  * verifies against the oracle.
  */
final class PublicationManager(val name: String, initial: Set[String],
    registry: SchemaRegistry, schemaFor: String => String) {

  private var members: Set[String] = initial
  /** (effective-after position, table, member?) change log; seeds at 0. */
  private[cdc] val changes = ArrayBuffer.empty[(Long, String, Boolean)]
  initial.toSeq.sorted.foreach(t => changes += ((0L, t, true)))
  /** Subscribed-tables gauge series (SetSubscribedTables then Inc/Dec). */
  val gauge = ArrayBuffer[Int](initial.size)
  var skipped: Int = 0

  /** Handle one pg_notify('creek', payload) observed at WAL position
    * `pos` (commands take effect for lsn > pos).
    */
  def handle(pos: Long, payload: String): Unit = {
    val split = payload.split(" ", 2)
    if (split.length != 2) { skipped += 1; return }
    split(0) match {
      case "ADD" =>
        val full = split(1) // "<ns>.<table>"
        val tbl = full.substring(full.lastIndexOf('.') + 1)
        if (!members.contains(tbl)) {
          members += tbl
          changes += ((pos, tbl, true))
          // initRelationSchema: persist the relation's schema on ADD
          registry.registerJson(s"testdb.$full", schemaFor(tbl), pos)
          gauge += members.size
        }
      case "REMOVE" =>
        val tbl = split(1) // bare table name
        if (members.contains(tbl)) {
          members -= tbl
          changes += ((pos, tbl, false))
          gauge += members.size
        }
      case _ => skipped += 1
    }
  }

  def isMember(tbl: String): Boolean = members.contains(tbl)

  /** Membership intervals (table, from_pos exclusive, to_pos inclusive):
    * an event at lsn L is published iff an interval with from < L <= to
    * exists for its table. Broadcastable — the table count is the config
    * allow-list size, never data-scale.
    */
  def subscribedIntervals(s: SparkSession): DataFrame = {
    import s.implicits._
    val byTable = changes.groupBy(_._2)
    val rows = byTable.toSeq.flatMap { case (tbl, cs) =>
      val sorted = cs.sortBy(_._1)
      sorted.zipWithIndex.collect {
        case ((from, _, true), i) =>
          val to = if (i + 1 < sorted.length) sorted(i + 1)._1 else Long.MaxValue
          (tbl, from, to)
      }
    }.sortBy(r => (r._1, r._2))
    rows.toDF("tbl", "from_pos", "to_pos")
  }
}

object Publication {

  /** c27: the events WAL fanned out to the c18 per-shard topics, GATED by
    * publication membership folded from a planted command log: t1 removed
    * after 1/4 of the WAL and re-added (schema re-persisted) after 1/2,
    * t2 removed after 3/4, one malformed payload skipped. Per-topic
    * published/suppressed stats + final membership — all recomputed by
    * the DuckDB oracle from the same thresholds.
    */
  def c27_publication_routing(s: SparkSession, d: String): DataFrame = {
    val flat = Envelope.flat(graft.Tables.events(s, d))
    val maxLsn = flat.agg(max("lsn_long")).head().getLong(0)
    val (l1, l2, l3) = (maxLsn / 4, maxLsn / 2, 3 * maxLsn / 4)
    val registry = new SchemaRegistry(s)
    val eventsSchema = graft.Tables.events(s, d).schema
    val pub = new PublicationManager("creek_pub", Set("t0", "t1", "t2", "t3"),
      registry, tbl => AvroSchemaGen.record(eventsSchema, tbl, "graft"))
    pub.handle(l1, "REMOVE t1")            // remove_table: bare name
    pub.handle(l2, "ADD public.t1")        // add_table: ns-qualified
    pub.handle(l2, "garbage-payload")      // malformed: skipped (api.go:78)
    pub.handle(l3, "REMOVE t2")
    val intervals = pub.subscribedIntervals(s)
    flat
      .withColumn("tbl", concat(lit("t"), (col("user_id") % 4).cast("string")))
      .join(broadcast(intervals), Seq("tbl"), "left")
      .withColumn("published",
        col("from_pos").isNotNull &&
          col("lsn_long") > col("from_pos") && col("lsn_long") <= col("to_pos"))
      .groupBy(col("tbl"))
      // the left join fans each event out over its table's intervals;
      // count each event once, published iff ANY interval covers it
      .agg(countDistinct(col("lsn_long")).as("n_total"),
        countDistinct(when(col("published"), col("lsn_long"))).as("n_published"),
        min(when(col("published"), col("lsn_long"))).as("first_pub_lsn"),
        max(when(col("published"), col("lsn_long"))).as("last_pub_lsn"))
      .withColumn("n_suppressed", col("n_total") - col("n_published"))
      .withColumn("topic", concat(lit("CREEK.testdb.wal.public."), col("tbl")))
      .withColumn("final_subscribed",
        col("tbl").isin(pub.changes.groupBy(_._2).collect {
          case (t, cs) if cs.maxBy(_._1)._3 => t
        }.toSeq: _*))
      .select("topic", "n_total", "n_published", "n_suppressed",
        "first_pub_lsn", "last_pub_lsn", "final_subscribed")
      .orderBy("topic")
  }

  val oracle: String =
    s"""WITH ${Envelope.sqlEnv},
       |m AS (SELECT max(lsn_long) AS mx FROM env),
       |e AS (
       |  SELECT 't' || (user_id % 4)::VARCHAR AS tbl, lsn_long,
       |    CASE 't' || (user_id % 4)::VARCHAR
       |      WHEN 't1' THEN lsn_long <= (SELECT mx // 4 FROM m)
       |                  OR lsn_long > (SELECT mx // 2 FROM m)
       |      WHEN 't2' THEN lsn_long <= (3 * (SELECT mx FROM m)) // 4
       |      ELSE true END AS published
       |  FROM env)
       |SELECT 'CREEK.testdb.wal.public.' || tbl AS topic,
       |  count(*)::BIGINT AS n_total,
       |  sum(CASE WHEN published THEN 1 ELSE 0 END)::BIGINT AS n_published,
       |  (count(*) - sum(CASE WHEN published THEN 1 ELSE 0 END))::BIGINT AS n_suppressed,
       |  min(CASE WHEN published THEN lsn_long END) AS first_pub_lsn,
       |  max(CASE WHEN published THEN lsn_long END) AS last_pub_lsn,
       |  tbl <> 't2' AS final_subscribed
       |FROM e GROUP BY tbl ORDER BY topic""".stripMargin
}
