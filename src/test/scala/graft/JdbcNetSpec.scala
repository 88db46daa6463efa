package graft

import org.scalatest.funsuite.AnyFunSuite

/** The network JDBC fixture (forked Thrift-server process, TCP
  * connections from every participant — graft.cdc.JdbcNet) must be
  * result-identical to the embedded-Derby fixture on all three JDBC
  * lanes. Under `local-cluster` masters the network fixture is the only
  * one that CAN work (executor JVMs cannot open the driver's embedded
  * database), so this equivalence is what carries the lanes through the
  * multi-JVM gate.
  */
class JdbcNetSpec extends AnyFunSuite {
  import SparkTestSession._

  private def withNet[T](body: => T): T = {
    val prior = sys.props.get("graft.jdbc.mode")
    sys.props("graft.jdbc.mode") = "net"
    try body
    finally prior match {
      case Some(v) => sys.props("graft.jdbc.mode") = v
      case None => sys.props -= "graft.jdbc.mode"
    }
  }

  test("c33 over the network fixture equals the embedded-Derby result") {
    val emb = cdc.JdbcSource.c33_jdbc_source(spark, sf).collect().map(_.toSeq).toSeq
    val net = withNet {
      cdc.JdbcSource.c33_jdbc_source(spark, sf).collect().map(_.toSeq).toSeq
    }
    assert(emb.nonEmpty)
    assert(net == emb)
  }

  test("c39 schema evolution over the network fixture equals embedded") {
    val emb = cdc.JdbcEvolution.c39run(spark, sf)
    val embRows = emb._1.collect().map(_.toSeq).toSeq
    val (netRows, fpV1, fpV2, byWriter) = withNet {
      val r = cdc.JdbcEvolution.c39run(spark, sf)
      (r._1.collect().map(_.toSeq).toSeq, r._2, r._3, r._4)
    }
    assert(embRows.nonEmpty)
    assert(netRows == embRows)
    // evolution must still be DETECTED through the network edge
    assert(fpV1 != fpV2)
    assert(byWriter.keySet == Set(1, 2))
    assert(byWriter == emb._4)
  }

  test("s15 streaming JDBC tail over the network fixture equals embedded") {
    val emb = cdc.JdbcSource.s15_jdbc_stream(spark, sf).collect().map(_.toSeq).toSeq
    val net = withNet {
      cdc.JdbcSource.s15_jdbc_stream(spark, sf).collect().map(_.toSeq).toSeq
    }
    assert(emb.nonEmpty)
    assert(net == emb)
  }
}
