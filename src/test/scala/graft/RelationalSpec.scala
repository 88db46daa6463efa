package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query has an oracle or is rows-only and runs non-empty") {
    // queries that legitimately produce few/zero rows at sf0.001 are exempt
    val mayBeEmpty = Set("q02_filter_pushdown", "q10_antijoin", "q05_multijoin")
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("q01 aggregates are consistent") {
    val rows = ops.Relational.q01_pricing_agg(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("count_order")).sum > 0)
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_qty") >= r.getAs[Double]("avg_qty"))
    }
  }

  test("q08 topk is sorted descending") {
    val prices = ops.Relational.q08_topk(spark, sf)
      .collect().map(_.getAs[Double]("o_totalprice"))
    assert(prices.sameElements(prices.sorted(Ordering[Double].reverse)))
  }

  test("q32 approx count-distinct within 5% of exact per group") {
    ops.Relational.q32_approx_distinct(spark, sf).collect().foreach { r =>
      val exact = r.getAs[Long]("n_exact")
      val approx = r.getAs[Long]("n_approx")
      assert(math.abs(approx - exact).toDouble / exact <= 0.05,
        s"${r.getAs[String]("o_orderpriority")}: exact=$exact approx=$approx")
    }
  }

  test("q33 heap top-k equals the q07 window formulation") {
    val win = ops.Relational.q07_window_rank(spark, sf)
      .collect().map(_.toSeq).toSet
    val heap = ops.Relational.q33_topk_per_key(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(win.nonEmpty)
    assert(heap == win)
  }

  test("q07 rank bounded per partition") {
    val rns = ops.Relational.q07_window_rank(spark, sf)
      .collect().map(_.getAs[Int]("rn"))
    assert(rns.forall(r => r >= 1 && r <= 3))
  }
}
