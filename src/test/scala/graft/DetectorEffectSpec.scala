package graft

import org.scalatest.funsuite.AnyFunSuite

/** Both-sided DETECTION specs for the detector block (q55/s22 CUSUM
  * change-point, q90 KS drift, q91 Mann-Kendall trend, q104 runs test,
  * q53 MAD outlier flags, s18 hourly z-score anomaly, q69 STL anomaly)
  * — round 14 proved the planted-gate pattern on the inference block
  * (it caught four real cross-engine bugs on its first run); these
  * lanes ran on structurally null data and had never fired. The
  * planted side reads the seeded `tools/gen_sf.py --effect` fixture
  * (src/test/resources/effect_sf0.001, regenerable); the null side
  * reads the ordinary testdata dir. Every planted effect is a
  * DETERMINISTIC transform (no extra rng draws), so the round-14
  * planted streams are bit-unchanged. Thresholds are pinned from the
  * seeded fixture with wide margins (planted vs default signal ratios
  * of 2-10x — values recorded in SCALE_r15.md).
  */
class DetectorEffectSpec extends AnyFunSuite {
  import SparkTestSession._

  val eff: String = getClass.getResource("/effect_sf0.001").getPath

  test("q55 CUSUM finds the planted rate shift at the day-11/12 break and reads only noise on default data") {
    val planted = ops.Relational.q55_cusum_changepoint(spark, eff).collect()
    val flagged = planted.filter(_.getAs[Int]("is_changepoint") == 1)
    assert(flagged.nonEmpty &&
      flagged.forall(r => Set("2024-01-11", "2024-01-12")
        .contains(r.getAs[String]("day"))),
      s"planted change-point must land on the largest level break, got " +
        flagged.map(_.getAs[String]("day")).mkString(","))
    assert(flagged.head.getAs[Double]("cusum").abs >= 60.0,
      "the planted break must dominate the CUSUM excursion")
    val default = ops.Relational.q55_cusum_changepoint(spark, sf).collect()
    assert(default.map(_.getAs[Double]("cusum").abs).max < 50.0,
      "the uniform stream's CUSUM excursion must stay noise-sized")
  }

  test("s22 streaming CUSUM equals batch q55 on the PLANTED fixture (the monitor detects, not just agrees on null)") {
    val got = streaming.StreamingQueries.s22_stream_cusum(spark, eff)
      .collect().map(_.toSeq).toSeq
    val exp = ops.Relational.q55_cusum_changepoint(spark, eff)
      .collect().map(_.toSeq).toSeq
    assert(got.nonEmpty && got == exp)
  }

  test("q91 Mann-Kendall reads the planted +50% drift as increasing and no_trend on default data") {
    val planted = ops.Relational.q91_mann_kendall(spark, eff).head()
    assert(planted.getAs[String]("trend") == "increasing",
      s"planted drift must fire, got z=${planted.getAs[Double]("z")}")
    assert(planted.getAs[Double]("z") > 3.0)
    val default = ops.Relational.q91_mann_kendall(spark, sf).head()
    assert(default.getAs[String]("trend") == "no_trend",
      s"uniform daily revenue must be trendless, got " +
        s"z=${default.getAs[Double]("z")}")
  }

  test("q104 runs test reads the planted H2-1996 step as clustered (z << -2) and random on default data") {
    val planted = ops.Relational.q104_runs_test(spark, eff).head()
    assert(planted.getAs[Double]("z") < -3.0,
      s"two long runs must collapse R, got z=${planted.getAs[Double]("z")}")
    val default = ops.Relational.q104_runs_test(spark, sf).head()
    assert(math.abs(default.getAs[Double]("z")) < 2.0,
      s"the uniform sign sequence must look random, got " +
        s"z=${default.getAs[Double]("z")}")
  }

  test("q90 KS rejects on the planted +50 purchase-value shift and accepts on default data") {
    val planted = ops.Relational.q90_ks(spark, eff).head()
    assert(planted.getAs[Double]("ks_scaled") > 3.0,
      s"a 0.63-D location shift must reject at any n, got " +
        s"${planted.getAs[Double]("ks_scaled")}")
    val default = ops.Relational.q90_ks(spark, sf).head()
    assert(default.getAs[Double]("ks_scaled") < 1.36,
      s"identical distributions must sit under the 5% critical value, " +
        s"got ${default.getAs[Double]("ks_scaled")}")
  }

  test("q53 MAD flags every planted 2%-spend customer: outlier count jumps by at least the planted set") {
    import org.apache.spark.sql.functions._
    def totalOutliers(d: String): Long =
      ops.Relational.q53_mad_outliers(spark, d)
        .agg(sum("n_outliers")).head().getLong(0)
    val planted = totalOutliers(eff)
    val default = totalOutliers(sf)
    // 3 customers are planted at sf0.001 (custkey 0/59/118); the drift
    // also widens the natural tail, so >= default + 3 is the floor
    assert(planted >= default + 3,
      s"planted low-spend customers must flag: $planted vs $default")
  }

  test("q69 STL flags the planted day-12 spike and nothing on default data") {
    val planted = ops.Relational.q69_stl_anomaly(spark, eff).collect()
    val flagged = planted.filter(_.getAs[Int]("is_anomaly") == 1)
    assert(flagged.map(_.getAs[String]("day")).contains("2024-01-13"),
      s"the 12x spike day must flag, got " +
        flagged.map(_.getAs[String]("day")).mkString(","))
    // and the spike dominates: it carries the largest |residual|
    val top = planted.maxBy(r => math.abs(r.getAs[Double]("residual")))
    assert(top.getAs[String]("day") == "2024-01-13")
    val default = ops.Relational.q69_stl_anomaly(spark, sf).collect()
    assert(!default.exists(_.getAs[Int]("is_anomaly") == 1),
      "Poisson day noise must not breach the 3*1.4826*MAD fence")
  }

  test("s18 hourly z-score: the planted spike window carries the top |z| (>= 7); default max |z| stays under 6.5") {
    val planted = streaming.StreamingQueries.s18_stream_anomaly(spark, eff)
      .collect()
    val top = planted.maxBy(r => math.abs(r.getAs[Double]("z")))
    val spikeLo = java.time.Instant.parse("2024-01-13T00:00:00Z")
      .toEpochMilli * 1000L
    val spikeHi = java.time.Instant.parse("2024-01-13T02:00:00Z")
      .toEpochMilli * 1000L
    val ws = top.getAs[Long]("window_start_us")
    assert(ws >= spikeLo && ws < spikeHi,
      s"top anomaly must sit in the 2h spike window, got window $ws")
    assert(top.getAs[Double]("z") >= 7.0 &&
      top.getAs[Int]("is_anomaly") == 1)
    val default = streaming.StreamingQueries.s18_stream_anomaly(spark, sf)
      .collect()
    assert(default.map(r => math.abs(r.getAs[Double]("z"))).max < 6.5,
      "default hourly counts must never reach the planted magnitude")
  }
}
