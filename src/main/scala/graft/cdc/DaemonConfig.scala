package graft.cdc

/** The daemon's configuration surface — creek's Config struct parsed from
  * its CLI-flag convention (internal/config/config.go: `cli:"..."` tags,
  * nested structs via `cli-prefix:"pg-"`/`"nats-"`/`"retention-"`,
  * Go-style durations). `creekd --tables a,b --pg-uri ... --nats-retention-
  * max-age 10m` is the whole deployment contract of the reference daemon;
  * c32 drives the c18/c27 topic gating from a parsed vector instead of
  * constants, so the config layer is exercised end to end.
  */
case class RetentionConfig(
  policy: String = "limits",
  maxAgeMs: Long = 0L,
  maxBytes: Long = -1L,
  maxMsgs: Long = -1L)

case class NatsConfig(
  uri: String = "nats://localhost:4222",
  timeoutMs: Long = 5000L,
  namespace: String = "CREEK",
  retention: RetentionConfig = RetentionConfig(),
  replicas: Int = 1)

case class PgConfig(
  uri: String = "",
  publicationName: String = "creek_publication",
  publicationSlot: String = "creek_replication_slot",
  messageTimeoutMs: Long = 30000L)

case class DaemonConfig(
  logLevel: String = "info",
  tables: Seq[String] = Nil,
  pg: PgConfig = PgConfig(),
  nats: NatsConfig = NatsConfig(),
  prometheusPort: Int = 7779)

object DaemonConfig {

  /** Go-style duration literal → millis. Matches time.ParseDuration's
    * grammar as the reference daemon's flags use it: an optional leading
    * sign ("-1.5h", "+2s"), a SEQUENCE of value+unit terms ("1h30m",
    * "2m45s500ms"), the full unit set ns/us(µs)/ms/s/m/h, fractional
    * values in Go's three decimal shapes ("1.5h", ".5s", "1.h"), and the
    * bare (signed) "0". The config stores millis, so sub-ms terms round
    * into the total.
    */
  def parseDuration(s: String): Long = {
    val t0 = s.trim
    val (sign, t) =
      if (t0.startsWith("-")) (-1L, t0.drop(1))
      else if (t0.startsWith("+")) (1L, t0.drop(1))
      else (1L, t0)
    if (t == "0") return 0L // Go: zero is the one unit-less literal
    val term = "([0-9]*\\.[0-9]+|[0-9]+(?:\\.[0-9]*)?)(ns|us|µs|μs|ms|s|m|h)".r
    val terms = term.findAllMatchIn(t).toSeq
    require(terms.nonEmpty && terms.map(_.matched).mkString == t,
      s"malformed duration: $s")
    val nanos = terms.map { m =>
      val v = m.group(1).toDouble
      val unit = m.group(2) match {
        case "ns" => 1L
        case "us" | "µs" | "μs" => 1000L
        case "ms" => 1000000L
        case "s" => 1000000000L
        case "m" => 60L * 1000000000L
        case "h" => 3600L * 1000000000L
      }
      v * unit
    }.sum
    // round, don't truncate: 4.35s is 4349.999…ms in binary fp, and Go's
    // time.ParseDuration yields exactly 4350ms
    sign * math.round(nanos / 1e6)
  }

  /** Parse a `--flag value` vector into the config, mirroring the
    * reference's tag scheme: top-level `cli` names, `pg-`/`nats-`
    * prefixes, the nested `nats-retention-` prefix, comma-split lists.
    * Unknown flags and missing values fail loudly (a daemon must not
    * start on a typo'd flag).
    */
  def parse(args: Seq[String]): DaemonConfig = {
    require(args.length % 2 == 0, s"dangling flag: ${args.lastOption.getOrElse("")}")
    args.grouped(2).foldLeft(DaemonConfig()) { case (c, Seq(flag, v)) =>
      require(flag.startsWith("--"), s"expected --flag, got: $flag")
      require(!v.startsWith("--"), s"flag $flag is missing its value (got $v)")
      flag.drop(2) match {
        case "log-level" => c.copy(logLevel = v)
        case "tables" => c.copy(tables = v.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        case "prometheus-port" => c.copy(prometheusPort = v.toInt)
        case "pg-uri" => c.copy(pg = c.pg.copy(uri = v))
        case "pg-publication-name" => c.copy(pg = c.pg.copy(publicationName = v))
        case "pg-publication-slot" => c.copy(pg = c.pg.copy(publicationSlot = v))
        case "pg-message-timeout" =>
          c.copy(pg = c.pg.copy(messageTimeoutMs = parseDuration(v)))
        case "nats-uri" => c.copy(nats = c.nats.copy(uri = v))
        case "nats-timeout" => c.copy(nats = c.nats.copy(timeoutMs = parseDuration(v)))
        case "nats-namespace" => c.copy(nats = c.nats.copy(namespace = v))
        case "nats-replicas" => c.copy(nats = c.nats.copy(replicas = v.toInt))
        case "nats-retention-policy" =>
          c.copy(nats = c.nats.copy(retention = c.nats.retention.copy(policy = v)))
        case "nats-retention-max-age" =>
          c.copy(nats = c.nats.copy(retention =
            c.nats.retention.copy(maxAgeMs = parseDuration(v))))
        case "nats-retention-max-bytes" =>
          c.copy(nats = c.nats.copy(retention =
            c.nats.retention.copy(maxBytes = v.toLong)))
        case "nats-retention-max-msgs" =>
          c.copy(nats = c.nats.copy(retention =
            c.nats.retention.copy(maxMsgs = v.toLong)))
        case other => throw new IllegalArgumentException(s"unknown flag: --$other")
      }
    }
  }
}
