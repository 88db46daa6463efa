package graft.cdc

import java.io.File
import java.nio.file.{Files, Path, Paths}
import java.sql.{Connection, DriverManager}
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Network JDBC fixture — the cross-JVM twin of the embedded-Derby
  * database behind c33/c39/s15.
  *
  * Why it exists: the embedded engine lives inside ONE JVM, so under a
  * `local-cluster[…]` master (separate executor processes — the
  * multi-JVM correctness gate) the executors' partitioned
  * `spark.read.jdbc` stripes cannot reach the driver's database and the
  * three JDBC lanes were the only non-passes of the full-surface gate
  * (SCALE_r08.md, 136/139). The round-8 verdict asked for a Derby
  * network-server or H2 TCP fixture; NEITHER ships in this sandbox
  * (no derbynet/derbyclient jars under the Spark distribution, zero
  * egress to fetch them) — but the full Spark Thrift JDBC/ODBC server
  * stack does. So the network fixture forks a SEPARATE server JVM
  * ([[JdbcServe]]) running the Thrift HiveServer2 endpoint over a tiny
  * local Spark, and every participant — the driver resolving the schema
  * AND each executor pulling its LSN stripe — opens its own TCP
  * connection with the stock `org.apache.hive.jdbc.HiveDriver`. That is
  * the same process topology as the reference daemon against live
  * Postgres (client.go:134-170: N connections to a server process that
  * is not us), expressed with only the jars the Spark distribution
  * provides.
  *
  * Mode selection ([[JdbcFixture.apply]]): `local-cluster` masters get
  * the network fixture automatically (embedded Derby CANNOT work
  * there); single-JVM masters keep embedded Derby (no server boot on
  * the driver's hot path). `graft.jdbc.mode` / `SPARK_GRAFT_JDBC`
  * override for testing either path anywhere.
  */
trait WalFixture {
  /** JDBC url the operator under test reads from. */
  def url: String
  /** Connection properties (driver class, credentials). */
  def props: Properties
  /** Create the WAL table from the v1-schema flat stream (UPPERCASE
    * columns, the fixture's landing contract). */
  def landV1(flatUpper: DataFrame): Unit
  /** The upstream `ALTER TABLE WAL ADD COLUMN SRC` (c39 mid-stream). */
  def evolve(): Unit
  /** Append post-evolution rows carrying the new SRC column. */
  def landV2(flatUpperWithSrc: DataFrame): Unit
  def close(): Unit
}

object JdbcFixture {
  /** Pick the fixture for this session: sys-prop / env override, else
    * network iff the master runs executors in separate JVMs.
    */
  def apply(s: SparkSession, scratch: Path): WalFixture = {
    val mode = sys.props.get("graft.jdbc.mode")
      .orElse(sys.env.get("SPARK_GRAFT_JDBC"))
      .getOrElse(if (s.sparkContext.master.startsWith("local-cluster")) "net"
                 else "embedded")
    mode match {
      case "net" => new NetWalFixture(s, scratch)
      case _     => new EmbeddedWalFixture(s, scratch)
    }
  }
}

/** The historical fixture: embedded Derby inside the driver JVM (ships
  * with the Spark distribution). Valid whenever driver and executors
  * share the JVM (`local[n]`).
  */
final class EmbeddedWalFixture(s: SparkSession, scratch: Path) extends WalFixture {
  System.setProperty("derby.stream.error.file", s"$scratch/derby.log")
  val url = s"jdbc:derby:$scratch/waldb;create=true"
  def props: Properties = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }
  def landV1(flatUpper: DataFrame): Unit =
    flatUpper.coalesce(1).write
      .option("createTableColumnTypes", "OP VARCHAR(8)") // default CLOB can't be compared
      .jdbc(url, "WAL", props)
  def evolve(): Unit = {
    // CLOB, not VARCHAR: Spark's Derby dialect maps StringType→CLOB, so
    // appended NULLs bind as setNull(Types.CLOB) — against a VARCHAR
    // column Derby rejects that (22005). The column is only selected,
    // never compared in pushed-down predicates, so CLOB costs nothing.
    val conn = DriverManager.getConnection(url)
    try conn.createStatement().execute("ALTER TABLE WAL ADD COLUMN SRC CLOB")
    finally conn.close()
  }
  def landV2(flatUpperWithSrc: DataFrame): Unit =
    flatUpperWithSrc.coalesce(1).write.mode("append").jdbc(url, "WAL", props)
  def close(): Unit =
    try DriverManager.getConnection(url.replace(";create=true", ";shutdown=true"))
    catch { case _: java.sql.SQLException => () } // 08006 = clean shutdown
}

/** Network fixture: one shared Thrift-server process per client JVM
  * (lazily forked, reaped by a shutdown hook), per-lane parquet landing
  * + `CREATE OR REPLACE TEMPORARY VIEW WAL` over a TCP connection. The
  * server runs single-session mode so the view registered here is the
  * one every executor's connection reads.
  */
final class NetWalFixture(s: SparkSession, scratch: Path) extends WalFixture {
  val url: String = JdbcNet.sharedUrl()
  def props: Properties = JdbcNet.props
  private def exec(sql: String): Unit = {
    val conn = JdbcNet.connect(url)
    try { conn.createStatement().execute(sql); () } finally conn.close()
  }
  private def land(sub: String, df: DataFrame): String = {
    val p = s"$scratch/$sub"
    df.write.mode("overwrite").parquet(p)
    p
  }
  def landV1(flatUpper: DataFrame): Unit = {
    // one lane owns the shared server's WAL view at a time: the lanes
    // are sequential today, but a future parallel gate must serialize
    // here rather than silently read another lane's rows
    JdbcNet.viewLock.lock()
    val p = land("gen1", flatUpper)
    exec(s"CREATE OR REPLACE TEMPORARY VIEW WAL AS SELECT * FROM parquet.`$p`")
  }
  // The ALTER swaps the view to the evolved 6-column shape immediately
  // (existing rows take the added column's NULL default, exactly Derby's
  // ADD COLUMN semantics) — a schema read between evolve() and landV2()
  // must see the new column in BOTH fixture modes.
  def evolve(): Unit =
    exec(s"""CREATE OR REPLACE TEMPORARY VIEW WAL AS
             |SELECT LSN_LONG, OP, PK_BEFORE, PK_AFTER, AFTER_VALUE,
             |       CAST(NULL AS STRING) AS SRC
             |FROM parquet.`$scratch/gen1`""".stripMargin)
  def landV2(flatUpperWithSrc: DataFrame): Unit = {
    val p2 = land("gen2", flatUpperWithSrc)
    exec(s"""CREATE OR REPLACE TEMPORARY VIEW WAL AS
             |SELECT LSN_LONG, OP, PK_BEFORE, PK_AFTER, AFTER_VALUE,
             |       CAST(NULL AS STRING) AS SRC
             |FROM parquet.`$scratch/gen1`
             |UNION ALL
             |SELECT * FROM parquet.`$p2`""".stripMargin)
  }
  // drop the view before the caller deletes `scratch` (a dangling view
  // over deleted parquet would FileNotFound until the next landV1),
  // then release the serializing lock; the server itself is shared
  def close(): Unit =
    try exec("DROP VIEW IF EXISTS WAL")
    finally if (JdbcNet.viewLock.isHeldByCurrentThread) JdbcNet.viewLock.unlock()
}

object JdbcNet {
  /** Serializes lanes over the shared server's single WAL view
    * (held landV1 → close by the owning fixture).
    */
  val viewLock = new java.util.concurrent.locks.ReentrantLock()

  /** hive-jdbc connection properties for `spark.read.jdbc`. */
  def props: Properties = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.hive.jdbc.HiveDriver")
    p.setProperty("user", "graft")
    p
  }

  def connect(url: String): Connection = {
    Class.forName("org.apache.hive.jdbc.HiveDriver")
    DriverManager.getConnection(url, "graft", "")
  }

  /** Reconstruct a classpath for the child JVM without hardcoding
    * install locations: `java.class.path` (complete under a forked test
    * JVM) merged with every URLClassLoader on our loader chain (sbt's
    * in-process runner scatters jars across per-job dirs that only the
    * loader knows about).
    */
  private def classpathEntries(): Seq[String] = {
    val fromProp = sys.props.getOrElse("java.class.path", "")
      .split(File.pathSeparatorChar).toSeq
    def urls(cl: ClassLoader): Seq[String] = cl match {
      case null => Nil
      case u: java.net.URLClassLoader =>
        u.getURLs.toSeq.flatMap(x =>
          scala.util.Try(Paths.get(x.toURI).toString).toOption) ++
          urls(cl.getParent)
      case other => urls(other.getParent)
    }
    (fromProp ++ urls(JdbcNet.getClass.getClassLoader))
      .filter(p => p.nonEmpty && Files.exists(Paths.get(p)))
      .distinct
  }

  @volatile private var shared: Option[(String, Process, Path)] = None

  /** Lazily fork the shared server JVM and return its JDBC url. */
  def sharedUrl(): String = synchronized {
    shared match {
      case Some((u, p, _)) if p.isAlive => u
      case _ =>
        val started = start()
        shared = Some(started)
        started._1
    }
  }

  private def freePort(): Int = {
    val ss = new java.net.ServerSocket(0)
    try ss.getLocalPort finally ss.close()
  }

  /** Fork [[JdbcServe]]; block until its Thrift endpoint accepts a JDBC
    * connection (the server needs a full Spark boot, ~15 s cold).
    */
  private def start(): (String, Process, Path) = {
    val port = freePort()
    val work = Files.createTempDirectory("graft_jdbcserve")
    val cp = classpathEntries().mkString(File.pathSeparator)
    val javaBin = Paths.get(sys.props("java.home"), "bin", "java").toString
    // heap is env-tunable (SPARK_GRAFT_JDBC_XMX) for big-sf gates, but
    // the load-bearing bound is incrementalCollect in JdbcServe below:
    // with it the server streams result partitions instead of
    // buffering whole result sets, so the default heap serves any sf
    val xmx = sys.env.getOrElse("SPARK_GRAFT_JDBC_XMX", "2g")
    val pb = new ProcessBuilder(javaBin, s"-Xmx$xmx", "-cp", cp,
      s"-Dderby.stream.error.file=$work/derby.log",
      "graft.cdc.JdbcServe", port.toString)
    pb.directory(work.toFile) // metastore/scratch junk lands here, not CWD
    pb.redirectErrorStream(true)
    pb.redirectOutput(work.resolve("server.log").toFile)
    val proc = pb.start()
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      try proc.getOutputStream.close() catch { case _: Throwable => () }
      proc.destroy()
      if (!proc.waitFor(5, java.util.concurrent.TimeUnit.SECONDS))
        proc.destroyForcibly()
      try graft.sources.SourceSinks.deleteDir(work)
      catch { case _: Throwable => () }
    }))
    val url = s"jdbc:hive2://localhost:$port"
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    var up = false
    var lastErr: Throwable = null
    def logTail: String = try {
      val lines = Files.readAllLines(work.resolve("server.log"))
      lines.subList(math.max(0, lines.size - 30), lines.size)
        .toArray.mkString("\n")
    } catch { case e: Throwable => s"<no log: $e>" }
    while (!up && System.nanoTime() < deadline) {
      if (!proc.isAlive) {
        val tail = logTail
        proc.destroyForcibly()
        throw new IllegalStateException(s"jdbc server died at boot; log tail:\n$tail")
      }
      try { connect(url).close(); up = true }
      catch { case e: Throwable => lastErr = e; Thread.sleep(500) }
    }
    if (!up) {
      // reap the wedged 2 GB server NOW, not at JVM exit
      val tail = logTail
      proc.destroyForcibly()
      throw new IllegalStateException(
        s"jdbc server not up after 120s ($lastErr); log tail:\n$tail")
    }
    (url, proc, work)
  }
}

/** The forked server main: a tiny local Spark owning the Thrift
  * HiveServer2 JDBC endpoint. Single-session mode makes the temp view
  * the fixture registers visible to every incoming connection; ANSI
  * double-quoted identifiers accept the `"COL"` quoting Spark's generic
  * JDBC dialect emits in pushed-down projections and partition
  * predicates. Parks on stdin: the parent's death (or close()) EOFs the
  * pipe and the server exits — no orphan JVMs.
  */
object JdbcServe {
  def main(args: Array[String]): Unit = {
    val port = args(0).toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-jdbc-serve")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.hive.thriftServer.singleSession", "true")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.sql.ansi.doubleQuotedIdentifiers", "true")
      // STREAM result partitions to the client instead of buffering the
      // whole result set in the server heap (the default materializes
      // every row of an operation before the first fetch): serving the
      // sf5 snapshot scan OOM'd the fixed-size server heap — r16
      // optimization, guide §5. Row-identical; the reference daemon
      // pages its snapshot reads the same way (chunked snapshot
      // semantics), so streaming is also the more faithful behavior.
      .config("spark.sql.thriftServer.incrementalCollect", "true")
      .config("spark.hive.server2.thrift.port", port.toString)
      .config("spark.hive.server2.thrift.bind.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.spark.sql.hive.thriftserver.HiveThriftServer2
      .startWithContext(spark.sqlContext)
    while (System.in.read() != -1) {} // park until the parent lets go
    spark.stop()
    sys.exit(0)
  }
}
