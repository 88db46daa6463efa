package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalatest.funsuite.AnyFunSuite

/** Property sweep for q54's degree-oriented triangle engine: on random
  * graphs, the oriented wedge-join enumeration must equal a naive
  * adjacency-set count exactly — nodes, edges, triangles, and the
  * clustering coefficient. This is the invariant the (deg, id) total
  * order earns: every triangle counted once from its ≺-smallest vertex,
  * none skipped when the closing edge's orientation disagrees with the
  * wedge order (the bug class the sf0.001 spec first caught: 28 ≠ 61).
  * Spark-backed, so samples are few but each is end-to-end through the
  * real plan.
  */
class GraphPropertySpec extends AnyFunSuite {
  import SparkTestSession._

  private def naive(edges: Set[(Long, Long)]): (Long, Long, Long) = {
    val adj = edges.groupBy(_._1).map { case (u, es) => u -> es.map(_._2) }
    val tri = edges.toSeq.map { case (u, v) =>
      (adj.getOrElse(u, Set.empty) & adj.getOrElse(v, Set.empty)).size.toLong
    }.sum
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).size.toLong
    (nodes, edges.size.toLong, tri)
  }

  test("oriented triangle count equals naive enumeration on random graphs") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(4, 25) // node count
      p <- Gen.choose(15, 60) // edge density %
      pairs = for { u <- 0L until n; v <- (u + 1) until n } yield (u, v)
      picks <- Gen.sequence[Seq[Boolean], Boolean](
        pairs.map(_ => Gen.choose(0, 99).map(_ < p)))
    } yield pairs.zip(picks).collect { case (e, true) => e }.toSet
    val prop = Prop.forAllNoShrink(gen) { edges =>
      if (edges.isEmpty) Prop.passed
      else {
        val df = edges.toSeq.sorted.toDF("u", "v")
        val row = ops.Relational.triangleStats(df).collect().head
        val (n, m, t) = naive(edges)
        val wedges = edges.toSeq.flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).map { case (_, v) => val d = v.size.toLong; d * (d - 1) / 2 }
          .sum.toDouble
        val cOk = if (wedges == 0) row.isNullAt(3)
          else row.getAs[Double]("clustering") ==
            java.math.BigDecimal.valueOf(3.0 * t / wedges)
              .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
        Prop.?=(
          (row.getAs[Long]("n_nodes"), row.getAs[Long]("n_edges"),
            row.getAs[Long]("n_triangles"), cOk),
          (n, m, t, true))
      }
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(result.passed, result.status.toString)
  }

  test("triangle engine handles the documented degenerate graph classes") {
    import spark.implicits._
    // (name, edges, expected (nodes, edges, triangles, clustering))
    val star = (1L to 5L).map(i => (0L, i)).toSet // 10 wedges, 0 triangles
    val k4 = (for { u <- 0L to 3L; v <- (u + 1) to 3L } yield (u, v)).toSet
    val cases: Seq[(String, Set[(Long, Long)], (Long, Long, Long, Option[Double]))] = Seq(
      ("single edge", Set((1L, 5L)), (2L, 1L, 0L, None)), // wedge-free → NULL clustering
      ("path of 2", Set((0L, 1L), (1L, 2L)), (3L, 2L, 0L, Some(0.0))),
      ("star K1,5", star, (6L, 5L, 0L, Some(0.0))),
      ("clique K4", k4, (4L, 6L, 4L, Some(1.0))))
    for ((name, edges, (n, m, t, c)) <- cases) {
      val row = ops.Relational.triangleStats(
        edges.toSeq.sorted.toDF("u", "v")).collect().head
      assert(row.getAs[Long]("n_nodes") === n, name)
      assert(row.getAs[Long]("n_edges") === m, name)
      assert(row.getAs[Long]("n_triangles") === t, name)
      c match {
        case None => assert(row.isNullAt(3), s"$name: clustering must be NULL")
        case Some(x) => assert(row.getAs[Double]("clustering") === x, name)
      }
    }
  }

  test("sessionizer equals a reference fold on random event streams") {
    import spark.implicits._
    val types = Seq("view", "click", "purchase")
    val gapUs = 1000L // tiny gap so random streams split richly
    val genEvents: Gen[List[(Long, Long, String, Long)]] = for {
      n <- Gen.choose(1, 60)
      rows <- Gen.listOfN(n, for {
        user <- Gen.choose(0L, 4L)
        us <- Gen.choose(0L, 20000L)
        t <- Gen.oneOf(types)
      } yield (user, us, t))
    } yield rows.zipWithIndex.map { case ((u, us, t), i) => (u, i.toLong, t, us) }
    val prop = Prop.forAllNoShrink(genEvents) { rows =>
      val df = rows.toDF("user_id", "event_id", "event_type", "us")
      val got = ops.Relational.sessionMetrics(df, gapUs).collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      // reference fold: sort per user by (us, event_id), split on gap
      val sessions = rows.groupBy(_._1).values.toSeq.flatMap { g =>
        val sorted = g.sortBy(e => (e._4, e._2))
        sorted.tail.foldLeft(List(List(sorted.head))) { (acc, e) =>
          if (e._4 - acc.head.head._4 > gapUs) List(e) :: acc
          else (e :: acc.head) :: acc.tail
        }.map(_.reverse).reverse
      }
      val expect = sessions.groupBy(_.minBy(e => (e._4, e._2))._3)
        .map { case (t, ss) => t -> ss.size.toLong }
      Prop.?=(got, expect)
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(result.passed, result.status.toString)
  }
}
