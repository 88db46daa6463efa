package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed CDC "apply to replica" — materializes the latest row state
  * per key from a change stream (the creek-pg-client consumer contract:
  * upsert on c/u/r, delete on d, pk-change u_pk = delete old key + upsert
  * new key, t truncates the table).
  *
  * Scale design (SURVEY.md §4): shuffle-once-per-key. u_pk events are
  * exploded into two half-events (delete@before-key, insert@after-key)
  * BEFORE the shuffle, ordered by ord = 2*lsn(+1) so one max_by
  * aggregation materializes the final state — no per-key sort, no
  * row_number. Truncate is a tiny scalar aggregate broadcast to the scan,
  * pruning dead ops map-side (pre-shuffle). At 100 TB this is one hash
  * shuffle of the post-truncate half-events; partial max_by combines
  * map-side, so shuffle bytes ≈ one row per key per map partition.
  */
object Apply {

  /** Explode flat change events into upsert/delete half-events keyed by pk.
    * ord = lsn_long*2 for the primary half, +1 for the u_pk insert half.
    */
  def halfEvents(flat: DataFrame): DataFrame = {
    val primary = flat.filter(col("op") =!= "t").select(
      (col("lsn_long") * 2).as("ord"),
      when(col("op") === "u_pk", "d").otherwise(col("op")).as("eff_op"),
      when(col("op").isin("d", "u_pk"), col("pk_before"))
        .otherwise(col("pk_after")).as("pk"),
      when(col("op").isin("d", "u_pk"), lit(null).cast("double"))
        .otherwise(col("after_value")).as("value"))
    val upkInsert = flat.filter(col("op") === "u_pk").select(
      (col("lsn_long") * 2 + 1).as("ord"),
      lit("c").as("eff_op"),
      col("pk_after").as("pk"),
      col("after_value").as("value"))
    primary.union(upkInsert)
  }

  /** Half-events surviving the last truncate (ord > max truncate ord). */
  def liveEvents(flat: DataFrame): DataFrame = {
    val cut = flat.filter(col("op") === "t")
      .agg(coalesce(max(col("lsn_long") * 2 + 1), lit(-1L)).as("tmax"))
    halfEvents(flat).crossJoin(broadcast(cut)).filter(col("ord") > col("tmax"))
  }

  /** Latest state per key: (pk, last_ord, last_op, last_value). Keys whose
    * last half-event is a delete are still present (last_op = 'd') so
    * callers can distinguish tombstones; `latest` filters them.
    */
  def state(flat: DataFrame): DataFrame =
    liveEvents(flat)
      .groupBy(col("pk"))
      .agg(
        max("ord").as("last_ord"),
        max_by(col("eff_op"), col("ord")).as("last_op"),
        max_by(col("value"), col("ord")).as("last_value"))

  /** Materialized replica: live rows only. */
  def latest(flat: DataFrame): DataFrame =
    state(flat).filter(col("last_op") =!= "d")

  /** Snapshot ⊕ WAL consistency (SURVEY.md §4): state as of snapshot LSN S
    * enters the merge as pseudo-inserts at ord 2S+1, unioned with the
    * half-events after S — one aggregation total yields the same state as
    * a full replay.
    */
  def snapshotPlusWal(flat: DataFrame, snapLsnDf: DataFrame): DataFrame = {
    val withS = (df: DataFrame) => df.crossJoin(broadcast(snapLsnDf))
    val snapState = latest(withS(flat).filter(col("lsn_long") <= col("s")).drop("s"))
    val snapRows = withS(snapState).select(
      (col("s") * 2 + 1).as("ord"),
      lit("c").as("eff_op"),
      col("pk"),
      col("last_value").as("value"))
    val walFlat = withS(flat).filter(col("lsn_long") > col("s")).drop("s")
    val walCut = walFlat.filter(col("op") === "t")
      .agg(coalesce(max(col("lsn_long") * 2 + 1), lit(-1L)).as("tmax"))
    val merged = snapRows.union(halfEvents(walFlat))
      .crossJoin(broadcast(walCut)).filter(col("ord") > col("tmax"))
    merged.groupBy(col("pk"))
      .agg(
        max_by(col("eff_op"), col("ord")).as("last_op"),
        max_by(col("value"), col("ord")).as("last_value"))
      .filter(col("last_op") =!= "d")
  }

  // ---- DuckDB oracle fragments mirroring the pipeline above ------------

  /** CTE chain `<p>half, <p>cut, <p>live, <p>state` over a filtered view
    * of `flat` (pass "" for the full stream). `where` is ANDed inside.
    */
  def sqlApply(prefix: String, where: String): String = {
    val w = if (where.isEmpty) "" else s" AND ($where)"
    s"""${prefix}half AS (
       |  SELECT lsn_long * 2 AS ord,
       |         CASE WHEN op = 'u_pk' THEN 'd' ELSE op END AS eff_op,
       |         CASE WHEN op IN ('d','u_pk') THEN pk_before ELSE pk_after END AS pk,
       |         CASE WHEN op IN ('d','u_pk') THEN NULL ELSE after_value END AS value
       |  FROM flat WHERE op <> 't'$w
       |  UNION ALL
       |  SELECT lsn_long * 2 + 1, 'c', pk_after, after_value
       |  FROM flat WHERE op = 'u_pk'$w),
       |${prefix}cut AS (
       |  SELECT coalesce(max(lsn_long * 2 + 1), -1) AS tmax
       |  FROM flat WHERE op = 't'$w),
       |${prefix}live AS (
       |  SELECT * FROM ${prefix}half WHERE ord > (SELECT tmax FROM ${prefix}cut)),
       |${prefix}state AS (
       |  SELECT pk, max(ord) AS last_ord,
       |         max_by(eff_op, ord) AS last_op,
       |         max_by(value, ord) AS last_value
       |  FROM ${prefix}live GROUP BY pk)""".stripMargin
  }
}
