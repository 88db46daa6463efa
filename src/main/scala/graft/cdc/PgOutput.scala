package graft.cdc

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Lsn

/** One change event to plant into a pgoutput stream (producer side). */
case class PgoRow(lsn_long: Long, op: String, tx_at_us: Long, user_id: Long,
  pk_before: Option[Long], pk_after: Option[Long], after_value: Option[Double])

/** One decoded WAL envelope row (consumer side). `n_before_cols` counts the
  * NON-NULL columns of the before image — 1 for key-only images (u_pk/d old
  * tuples carry nulls in non-key slots; plain u derives before from the new
  * tuple's key columns), null when no before image exists.
  */
case class PgoDecoded(lsn_long: Long, lsn_str: String, op: String,
  tx_id: Long, tx_at_us: Long, schema_name: String, table_name: String,
  pk_before: Option[Long], n_before_cols: Option[Int], pk_after: Option[Long],
  after_value: Option[Double], after_ts_us: Option[Long])

/** One parsed Standby Status Update reply (client→server 'r' message). */
case class StandbyReply(wal_write: Long, wal_flush: Long, wal_apply: Long,
  lsn_str: String, reply_requested: Boolean)

/** pgoutput logical-replication BYTE-STREAM codec — the reference
  * producer's core message loop re-implemented from the public PostgreSQL
  * protocol ("Logical Replication Message Formats" + "Streaming Replication
  * Protocol"), matching the reference's dispatch and envelope semantics
  * branch for branch (/root/reference/internal/dao/replication.go:205-310
  * frame loop, :309-368 Begin/Relation, :369-519 Insert/Update/Delete/
  * Truncate, :520-558 getValues/getKeyValues, :559-565 text-column decode,
  * :567-583 baseMessage):
  *
  *   - each wire frame is a CopyData payload (here length-prefixed, the
  *     delimiting the pg wire protocol provides): 'k' primary keepalive
  *     (ServerWALEnd advances CurrentLSN) or 'w' XLogData (WALStart u64,
  *     ServerWALEnd u64, ServerTime i64, pgoutput body);
  *   - Begin 'B' (FinalLSN u64, CommitTime i64 in MICROSECONDS SINCE THE
  *     POSTGRES EPOCH 2000-01-01, Xid u32) sets the transaction context;
  *   - Relation 'R' (relid, namespace, name, replica identity, columns
  *     with key flags + type OIDs) registers the table — a stream is
  *     self-contained because Postgres re-sends Relation messages on every
  *     new connection;
  *   - Insert 'I' → op c with after = the new tuple; Update 'U' with an
  *     old tuple ('K'/'O') → op u_pk with before = the old tuple, without
  *     one → op u with before = the KEY COLUMNS OF THE NEW TUPLE
  *     (replication.go:434-441); Delete 'D' → op d with before = the old
  *     tuple; Truncate 'T' → one op t per relation id;
  *   - tuple cells are 'n' null (present, null value), 'u' unchanged
  *     TOAST (ABSENT from the value map — replication.go:527-530), or
  *     't' text, decoded by column OID like the reference's
  *     decodeTextColumnData (int8/float8/timestamptz here);
  *   - the envelope lsn is CurrentLSN = max WALStart seen
  *     (replication.go:243-245), tx_id/tx_at come from Begin.
  *
  * Scale shape: the WAL is segmented into contiguous LSN ranges, one
  * self-contained stream per segment (what a parallel backfill of archived
  * WAL segments sees); generate + decode run per group after ONE shuffle.
  */
object PgOutput {
  /** 2000-01-01T00:00:00Z in unix microseconds (the pg timestamp epoch). */
  val PgEpochMicros: Long = 946684800000000L

  val OidInt8 = 20
  val OidFloat8 = 701
  val OidTimestamptz = 1184

  /** LSNs per self-contained stream segment. */
  val SegSize = 2048L

  val RelId = 16385 // first user-table oid after the catalog range

  private val TsFmt =
    DateTimeFormatter.ofPattern("uuuu-MM-dd HH:mm:ss.SSSSSSx").withZone(ZoneOffset.UTC)

  def formatTsTz(us: Long): String =
    TsFmt.format(Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
      Math.floorMod(us, 1000000L) * 1000L))

  def parseTsTz(s: String): Long = {
    val i = Instant.from(TsFmt.parse(s))
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  // ------------------------------------------------------------------
  // byte-level writer/reader (network byte order, like the pg protocol)

  final class W {
    private val out = new ByteArrayOutputStream(256)
    def u8(v: Int): W = { out.write(v & 0xFF); this }
    def u16(v: Int): W = { u8(v >>> 8); u8(v) }
    def u32(v: Long): W = { u16((v >>> 16).toInt); u16(v.toInt) }
    def u64(v: Long): W = { u32(v >>> 32); u32(v & 0xFFFFFFFFL) }
    def cstr(s: String): W = {
      out.write(s.getBytes(StandardCharsets.UTF_8)); u8(0)
    }
    def bytes(b: Array[Byte]): W = { out.write(b, 0, b.length); this }
    def result(): Array[Byte] = out.toByteArray
  }

  final class R(buf: Array[Byte], var pos: Int = 0) {
    def u8(): Int = { val v = buf(pos) & 0xFF; pos += 1; v }
    def u16(): Int = (u8() << 8) | u8()
    def u32(): Long = (u16().toLong << 16) | u16()
    def u64(): Long = (u32() << 32) | u32()
    def i64(): Long = u64()
    def cstr(): String = {
      val start = pos
      while (buf(pos) != 0) pos += 1
      val s = new String(buf, start, pos - start, StandardCharsets.UTF_8)
      pos += 1
      s
    }
    def bytes(n: Int): Array[Byte] = {
      // copyOfRange zero-pads past the end — a truncated frame would parse
      // silently; fail loudly instead (consistent with c28's drain contract)
      require(n >= 0 && pos + n <= buf.length,
        s"truncated frame: need $n bytes at offset $pos of ${buf.length}")
      val b = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; b
    }
    def remaining: Int = buf.length - pos
  }

  // ------------------------------------------------------------------
  // producer: pgoutput message encoders

  /** One tuple cell: kind 'n' (null) / 'u' (unchanged toast) / 't' (text). */
  sealed trait Cell
  case object NullCell extends Cell
  case object ToastCell extends Cell
  case class TextCell(text: String) extends Cell

  def writeTuple(w: W, cells: Seq[Cell]): Unit = {
    w.u16(cells.length)
    cells.foreach {
      case NullCell => w.u8('n')
      case ToastCell => w.u8('u')
      case TextCell(t) =>
        val b = t.getBytes(StandardCharsets.UTF_8)
        w.u8('t'); w.u32(b.length.toLong); w.bytes(b)
    }
  }

  def beginMsg(finalLsn: Long, commitUs: Long, xid: Long): Array[Byte] =
    new W().u8('B').u64(finalLsn).u64(commitUs - PgEpochMicros)
      .u32(xid & 0xFFFFFFFFL).result()

  def commitMsg(commitLsn: Long, commitUs: Long): Array[Byte] =
    new W().u8('C').u8(0).u64(commitLsn).u64(commitLsn + 1)
      .u64(commitUs - PgEpochMicros).result()

  /** cols: (keyFlag, name, typeOid). Replica identity 'd' (default). */
  def relationMsg(relId: Int, ns: String, name: String,
      cols: Seq[(Int, String, Int)]): Array[Byte] = {
    val w = new W().u8('R').u32(relId.toLong).cstr(ns).cstr(name).u8('d')
      .u16(cols.length)
    cols.foreach { case (flags, n, oid) =>
      w.u8(flags).cstr(n).u32(oid.toLong).u32(-1L & 0xFFFFFFFFL)
    }
    w.result()
  }

  def insertMsg(relId: Int, newTuple: Seq[Cell]): Array[Byte] = {
    val w = new W().u8('I').u32(relId.toLong).u8('N')
    writeTuple(w, newTuple); w.result()
  }

  def updateMsg(relId: Int, old: Option[(Char, Seq[Cell])],
      newTuple: Seq[Cell]): Array[Byte] = {
    val w = new W().u8('U').u32(relId.toLong)
    old.foreach { case (kind, cells) => w.u8(kind); writeTuple(w, cells) }
    w.u8('N'); writeTuple(w, newTuple); w.result()
  }

  def deleteMsg(relId: Int, kind: Char, oldTuple: Seq[Cell]): Array[Byte] = {
    val w = new W().u8('D').u32(relId.toLong).u8(kind)
    writeTuple(w, oldTuple); w.result()
  }

  def truncateMsg(relIds: Seq[Int]): Array[Byte] = {
    val w = new W().u8('T').u32(relIds.length.toLong).u8(0)
    relIds.foreach(id => w.u32(id.toLong))
    w.result()
  }

  /** XLogData frame 'w': WALStart, ServerWALEnd, ServerTime, body. */
  def xlog(walStart: Long, body: Array[Byte]): Array[Byte] =
    new W().u8('w').u64(walStart).u64(walStart).u64(0L).bytes(body).result()

  /** Primary keepalive frame 'k': ServerWALEnd, ServerTime, ReplyRequested.
    * ServerTime is on the wire as micros since the pg epoch (like Begin/
    * Commit times); the default writes 0 — "time unknown" — for callers
    * that omit serverTimeUs. encodeStream deliberately passes the commit
    * clock (r.tx_at_us) instead, so its planted keepalives carry a real
    * ServerTime for the x14 lag gauges; decoders accept both.
    */
  def keepalive(serverWalEnd: Long, reply: Boolean,
      serverTimeUs: Long = PgEpochMicros): Array[Byte] =
    new W().u8('k').u64(serverWalEnd).u64(serverTimeUs - PgEpochMicros)
      .u8(if (reply) 1 else 0).result()

  /** Standby Status Update 'r' (client→server): WALWrite/Flush/Apply
    * positions, client time, reply-requested — the message the reference
    * sends on keepalive reply requests (replication.go:87-93 posts
    * CurrentLSN; pglogrepl defaults flush/apply to the write position).
    */
  def standbyStatus(walPos: Long, clientTimeUs: Long, reply: Boolean): Array[Byte] =
    new W().u8('r').u64(walPos).u64(walPos).u64(walPos).u64(clientTimeUs)
      .u8(if (reply) 1 else 0).result()

  /** Frame = 4-byte length + payload (the CopyData message boundary the
    * pg wire protocol provides around each replication frame).
    */
  private def frame(out: ByteArrayOutputStream, msg: Array[Byte]): Unit = {
    out.write((msg.length >>> 24) & 0xFF); out.write((msg.length >>> 16) & 0xFF)
    out.write((msg.length >>> 8) & 0xFF); out.write(msg.length & 0xFF)
    out.write(msg, 0, msg.length)
  }

  /** Frame a hand-assembled message sequence (spec helper). */
  def framed(msgs: Array[Byte]*): Array[Byte] = {
    val out = new ByteArrayOutputStream(256)
    msgs.foreach(frame(out, _))
    out.toByteArray
  }

  val eventsCols: Seq[(Int, String, Int)] = Seq(
    (1, "user_id", OidInt8), (0, "value", OidFloat8), (0, "ts", OidTimestamptz))

  /** Plant one self-contained stream for a sorted LSN segment: Relation
    * preamble, then Begin + change + Commit per transaction, keepalives
    * sprinkled every 97 messages (ServerWALEnd = last seen LSN).
    */
  def encodeStream(rows: Seq[PgoRow], keepaliveReply: Boolean = false): Array[Byte] = {
    val out = new ByteArrayOutputStream(rows.length * 96 + 256)
    if (rows.isEmpty) return out.toByteArray
    frame(out, xlog(rows.head.lsn_long, relationMsg(RelId, "public", "events", eventsCols)))
    var n = 0
    rows.foreach { r =>
      // the planted lift reuses lsn as the Begin Xid, but pgoutput xids
      // are u32 on the wire — fail loudly instead of silently truncating
      // (the decode side would diverge from the lsn-based oracle)
      require(r.lsn_long <= 0xFFFFFFFFL,
        s"planted xid = lsn ${r.lsn_long} exceeds the u32 pgoutput Xid")
      frame(out, xlog(r.lsn_long, beginMsg(r.lsn_long, r.tx_at_us, r.lsn_long)))
      frame(out, xlog(r.lsn_long, bodyFor(r, RelId)))
      frame(out, xlog(r.lsn_long, commitMsg(r.lsn_long, r.tx_at_us)))
      n += 1
      if (n % 97 == 0)
        frame(out, keepalive(r.lsn_long, reply = keepaliveReply,
          serverTimeUs = r.tx_at_us))
    }
    out.toByteArray
  }

  /** The pgoutput body for one planted change, against a given relation. */
  private def bodyFor(r: PgoRow, relId: Int): Array[Byte] = {
    val newTuple = r.pk_after.map { pk =>
      Seq[Cell](TextCell(pk.toString),
        r.after_value.map(v => TextCell(v.toString): Cell).getOrElse(NullCell),
        TextCell(formatTsTz(r.tx_at_us)))
    }
    r.op match {
      case "c" => insertMsg(relId, newTuple.get)
      case "u" => updateMsg(relId, None, newTuple.get)
      case "u_pk" =>
        val oldKey = Seq[Cell](TextCell(r.pk_before.get.toString), NullCell, NullCell)
        updateMsg(relId, Some(('K', oldKey)), newTuple.get)
      case "d" =>
        deleteMsg(relId, 'K', Seq(TextCell(r.pk_before.get.toString), NullCell, NullCell))
      case "t" => truncateMsg(Seq(relId))
      case other => throw new IllegalArgumentException(s"not a pgoutput op: $other")
    }
  }

  /** Plant a MULTI-TABLE stream: rows route to `t{user_id % 4}` (the c18/
    * c30 sharding); each table's Relation message is emitted lazily on
    * FIRST use, interleaved with data frames — exactly how a pg session
    * registers relations — so the consumer's relations map is exercised
    * with live dispatch, and a truncate cuts only its own relation.
    */
  def encodeMultiStream(rows: Seq[PgoRow],
      tableOf: Long => String = uid => s"t${(uid % 4).toInt}"): Array[Byte] = {
    val out = new ByteArrayOutputStream(rows.length * 96 + 1024)
    var registered = Map.empty[String, Int]
    var n = 0
    rows.foreach { r =>
      require(r.lsn_long <= 0xFFFFFFFFL,
        s"planted xid = lsn ${r.lsn_long} exceeds the u32 pgoutput Xid")
      val tname = tableOf(r.user_id)
      val relId = registered.getOrElse(tname, {
        val id = RelId + registered.size
        frame(out, xlog(r.lsn_long, relationMsg(id, "public", tname, eventsCols)))
        registered += tname -> id
        id
      })
      frame(out, xlog(r.lsn_long, beginMsg(r.lsn_long, r.tx_at_us, r.lsn_long)))
      frame(out, xlog(r.lsn_long, bodyFor(r, relId)))
      frame(out, xlog(r.lsn_long, commitMsg(r.lsn_long, r.tx_at_us)))
      n += 1
      if (n % 97 == 0)
        frame(out, keepalive(r.lsn_long, reply = false, serverTimeUs = r.tx_at_us))
    }
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // consumer: the decode loop (replication.go:205-583)

  private case class Rel(ns: String, name: String, cols: Seq[(Int, String, Int)])

  /** Decode one text cell by column OID (decodeTextColumnData analogue). */
  def decodeText(oid: Int, text: String): Any = oid match {
    case OidInt8 => text.toLong
    case OidFloat8 => text.toDouble
    case OidTimestamptz => parseTsTz(text)
    case _ => text
  }

  /** Tuple → column-name map: 'n' maps the name to null, 'u' leaves the
    * name ABSENT (unchanged toast), 't' decodes by OID — exactly
    * getValues (replication.go:520-538).
    */
  def readTuple(r: R, cols: Seq[(Int, String, Int)]): Map[String, Any] = {
    val n = r.u16()
    val m = Map.newBuilder[String, Any]
    var i = 0
    while (i < n) {
      val (_, name, oid) = cols(i)
      r.u8().toChar match {
        case 'n' => m += name -> null
        case 'u' => () // unchanged toast: absent from the map
        case 't' =>
          val len = r.u32().toInt
          m += name -> decodeText(oid, new String(r.bytes(len), StandardCharsets.UTF_8))
        case k => throw new IllegalArgumentException(s"unknown tuple kind $k")
      }
      i += 1
    }
    m.result()
  }

  /** Key columns of a tuple (flags==1), skipping non-key values — exactly
    * getKeyValues (replication.go:540-558); used to derive a plain
    * update's before image from its NEW tuple.
    */
  def readKeyTuple(tuple: Map[String, Any], cols: Seq[(Int, String, Int)]): Map[String, Any] =
    tuple.filter { case (name, _) => cols.exists(c => c._2 == name && c._1 == 1) }

  /** Run the consumer loop over one framed byte stream. Unknown relation
    * ids skip the message (the reference logs and continues,
    * replication.go:370-372) — never a task failure.
    */
  def decodeStream(bytes: Array[Byte]): Seq[PgoDecoded] = {
    val out = Seq.newBuilder[PgoDecoded]
    var relations = Map.empty[Long, Rel]
    var currentLsn = 0L
    var txid = 0L
    var commitUs = 0L
    val top = new R(bytes)
    while (top.remaining >= 4) {
      val len = top.u32().toInt
      val r = new R(top.bytes(len))
      r.u8().toChar match {
        case 'k' =>
          val serverWalEnd = r.u64()
          if (serverWalEnd > currentLsn) currentLsn = serverWalEnd
        case 'w' =>
          val walStart = r.u64()
          r.u64(); r.i64() // ServerWALEnd, ServerTime
          if (walStart > currentLsn) currentLsn = walStart
          decodeLogical(r, relations, currentLsn, txid, commitUs) match {
            case LBegin(xid, cUs) => txid = xid; commitUs = cUs
            case LRelation(id, rel) => relations += id -> rel
            case LRows(rows) => out ++= rows
            case LNoop => ()
          }
        case _ => () // unexpected frame type: log-and-continue in the
                     // reference (replication.go:199-203) — skip here
      }
    }
    out.result()
  }

  /** Parse one standby-status reply (the server-side read of 'r'). */
  def parseStandbyStatus(bytes: Array[Byte]): StandbyReply = {
    val r = new R(bytes)
    val tag = r.u8().toChar
    require(tag == 'r', s"not a standby status message: $tag")
    val w = r.u64(); val f = r.u64(); val a = r.u64()
    r.i64() // client time
    StandbyReply(w, f, a, Lsn.format(w).toString, r.u8() != 0)
  }

  /** The REPLY side of the keepalive protocol: walk a framed stream whose
    * keepalives request replies; each one makes the client send a
    * Standby Status Update carrying its current XLog position
    * (replication.go:230-233 zeroes the send deadline, :87-93 posts
    * CurrentLSN). Replies are emitted as wire bytes and re-parsed, so the
    * oracle pins the full 'r' roundtrip: position = last LSN received
    * before each reply-requested keepalive.
    */
  def decodeReplies(bytes: Array[Byte]): Seq[StandbyReply] = {
    val out = Seq.newBuilder[StandbyReply]
    var currentLsn = 0L
    val top = new R(bytes)
    while (top.remaining >= 4) {
      val len = top.u32().toInt
      val r = new R(top.bytes(len))
      r.u8().toChar match {
        case 'k' =>
          val serverWalEnd = r.u64()
          r.i64() // ServerTime
          val reply = r.u8() != 0
          if (serverWalEnd > currentLsn) currentLsn = serverWalEnd
          if (reply)
            out += parseStandbyStatus(standbyStatus(currentLsn, 0L, reply = false))
        case 'w' =>
          val walStart = r.u64()
          if (walStart > currentLsn) currentLsn = walStart
        case _ => ()
      }
    }
    out.result()
  }

  private sealed trait Logical
  private case class LBegin(xid: Long, commitUs: Long) extends Logical
  private case class LRelation(id: Long, rel: Rel) extends Logical
  private case class LRows(rows: Seq[PgoDecoded]) extends Logical
  private case object LNoop extends Logical

  private def decodeLogical(r: R, relations: Map[Long, Rel], lsn: Long,
      txid: Long, commitUs: Long): Logical = {

    def base(rel: Rel, op: String, before: Option[Map[String, Any]],
        after: Option[Map[String, Any]]): PgoDecoded = {
      def pkOf(m: Map[String, Any]) =
        m.get("user_id").collect { case l: Long => l }
      PgoDecoded(
        lsn_long = lsn, lsn_str = Lsn.format(lsn).toString, op = op,
        tx_id = txid, tx_at_us = commitUs,
        schema_name = rel.ns, table_name = rel.name,
        pk_before = before.flatMap(pkOf),
        n_before_cols = before.map(_.valuesIterator.count(_ != null)),
        pk_after = after.flatMap(pkOf),
        after_value = after.flatMap(_.get("value").collect { case d: Double => d }),
        after_ts_us = after.flatMap(_.get("ts").collect { case t: Long => t }))
    }

    r.u8().toChar match {
      case 'B' =>
        r.u64() // FinalLSN (AckedLSN bookkeeping; envelope lsn is CurrentLSN)
        val cUs = r.i64() + PgEpochMicros
        val xid = r.u32()
        LBegin(xid, cUs)
      case 'C' => LNoop // commit adds nothing the Begin didn't carry
      case 'Y' => LNoop // Type message: handled as no-op like the reference
      case 'R' =>
        val id = r.u32()
        val ns = r.cstr(); val name = r.cstr()
        r.u8() // replica identity
        val nCols = r.u16()
        val cols = (0 until nCols).map { _ =>
          val flags = r.u8(); val cname = r.cstr(); val oid = r.u32().toInt
          r.u32() // type modifier
          (flags, cname, oid)
        }
        LRelation(id, Rel(ns, name, cols))
      case 'I' =>
        val relId = r.u32()
        relations.get(relId) match {
          case None => LNoop
          case Some(rel) =>
            r.u8() // 'N'
            LRows(Seq(base(rel, "c", None, Some(readTuple(r, rel.cols)))))
        }
      case 'U' =>
        val relId = r.u32()
        relations.get(relId) match {
          case None => LNoop
          case Some(rel) =>
            var kind = r.u8()
            var old: Option[Map[String, Any]] = None
            if (kind == 'K' || kind == 'O') {
              old = Some(readTuple(r, rel.cols))
              kind = r.u8()
            }
            require(kind == 'N', s"expected new tuple, got $kind")
            val newTuple = readTuple(r, rel.cols)
            old match {
              case Some(o) => LRows(Seq(base(rel, "u_pk", Some(o), Some(newTuple))))
              case None =>
                LRows(Seq(base(rel, "u",
                  Some(readKeyTuple(newTuple, rel.cols)), Some(newTuple))))
            }
        }
      case 'D' =>
        val relId = r.u32()
        relations.get(relId) match {
          case None => LNoop
          case Some(rel) =>
            val kind = r.u8()
            val old =
              if (kind == 'K' || kind == 'O') Some(readTuple(r, rel.cols)) else None
            LRows(Seq(base(rel, "d", old, None)))
        }
      case 'T' =>
        val n = r.u32().toInt
        r.u8() // options
        val rows = (0 until n).flatMap { _ =>
          relations.get(r.u32()).map(rel => base(rel, "t", None, None))
        }
        LRows(rows)
      case _ => LNoop // Origin ('O'), logical Message ('M'), and any
        // future tag fall through the reference's type switch with no
        // case — ignored, never fatal (replication.go:257-301)
    }
  }

  // ------------------------------------------------------------------

  /** Plant + decode: the flat envelope (minus op 'r', which is a snapshot
    * op pgoutput never carries) segmented into contiguous LSN streams,
    * each generated and decoded independently after one shuffle.
    */
  /** Shared plant-side plumbing: the flat envelope (minus snapshot op
    * 'r') segmented into contiguous LSN streams, each handed to `f` as a
    * sorted row sequence after ONE shuffle.
    */
  private def segmented[T: org.apache.spark.sql.Encoder](flat: DataFrame)(
      f: Seq[PgoRow] => Iterator[T])(implicit s: SparkSession): Dataset[T] = {
    import s.implicits._
    flat.filter(col("op") =!= "r")
      .select(col("lsn_long"), col("op"), unix_micros(col("tx_at")).as("tx_at_us"),
        col("user_id"), col("pk_before"), col("pk_after"), col("after_value"))
      .as[PgoRow]
      .groupByKey(_.lsn_long / SegSize)
      .flatMapGroups((_, it) => f(it.toSeq.sortBy(_.lsn_long)))
  }

  def roundtrip(flat: DataFrame)(implicit s: SparkSession): Dataset[PgoDecoded] = {
    import s.implicits._
    segmented(flat)(rows => decodeStream(encodeStream(rows)).iterator)
  }

  /** Plant + decode the multi-table stream (one shuffle, per-segment
    * self-contained streams with interleaved relation registration).
    */
  def multiRoundtrip(flat: DataFrame)(implicit s: SparkSession): Dataset[PgoDecoded] = {
    import s.implicits._
    segmented(flat)(rows => decodeStream(encodeMultiStream(rows)).iterator)
  }

  /** multiRoundtrip with a caller-chosen user→table mapping (c38 plants
    * leaf-partition relation names through this).
    */
  def multiRoundtripAs(flat: DataFrame, tableOf: Long => String)(
      implicit s: SparkSession): Dataset[PgoDecoded] = {
    import s.implicits._
    segmented(flat)(rows => decodeStream(encodeMultiStream(rows, tableOf)).iterator)
  }

  /** Plant + reply: the same segmented streams with reply-requesting
    * keepalives, run through the reply loop — one shuffle, replies
    * generated and parsed per segment.
    */
  def standbyRoundtrip(flat: DataFrame)(implicit s: SparkSession): Dataset[StandbyReply] = {
    import s.implicits._
    segmented(flat)(rows =>
      decodeReplies(encodeStream(rows, keepaliveReply = true)).iterator)
  }

  /** One replication-lag observation — the three gauges the reference
    * exports per keepalive (metrics.go:71-85): wal_lsn (ServerWALEnd),
    * behind_lsn (server head − stream position, clamped ≥ 0) and
    * behind_time_ms (consumer clock − ServerTime).
    */
  case class LagGauge(wal_lsn: Long, wal_lsn_str: String, behind_lsn: Long,
    behind_time_ms: Long)

  /** Walk a framed stream and emit the gauge triple at every keepalive,
    * exactly as the keepalive arm of the consumer loop feeds metrics
    * (replication.go:219-237): SetWalLSN(ServerWALEnd),
    * SetBehindLSN(head, ServerWALEnd) with the negative diff clamped,
    * SetBehindTime(now − ServerTime) in millis. `headLsn`/`headTimeUs`
    * stand in for GetCurrLSN() / time.Now() — the server's WAL head and
    * the observation clock, which in the planted world are known exactly.
    */
  def lagObservations(bytes: Array[Byte], headLsn: Long,
      headTimeUs: Long): Seq[LagGauge] = {
    val out = Seq.newBuilder[LagGauge]
    val top = new R(bytes)
    while (top.remaining >= 4) {
      val len = top.u32().toInt
      val r = new R(top.bytes(len))
      r.u8().toChar match {
        case 'k' =>
          val serverWalEnd = r.u64()
          val serverTimeUs = r.i64() + PgEpochMicros
          out += LagGauge(
            wal_lsn = serverWalEnd,
            wal_lsn_str = Lsn.format(serverWalEnd).toString,
            behind_lsn = math.max(0L, headLsn - serverWalEnd),
            behind_time_ms = math.max(0L, (headTimeUs - serverTimeUs) / 1000))
        case _ => () // XLogData advances position but only keepalives
                     // drive the lag gauges in the reference loop
      }
    }
    out.result()
  }

  /** Plant + observe: segmented streams (keepalives every 97 messages,
    * ServerTime = the row's commit time) walked for lag gauges against
    * the global WAL head — one shuffle, gauges computed per segment.
    */
  def replicationLag(flat: DataFrame)(implicit s: SparkSession): Dataset[LagGauge] = {
    import s.implicits._
    val head = flat.filter(col("op") =!= "r")
      .agg(max("lsn_long"), unix_micros(max("tx_at"))).head()
    val (headLsn, headTimeUs) = (head.getLong(0), head.getLong(1))
    segmented(flat)(rows =>
      lagObservations(encodeStream(rows), headLsn, headTimeUs).iterator)
  }
}
