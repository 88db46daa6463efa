package graft

import org.scalatest.funsuite.AnyFunSuite

/** Both-sided DETECTION specs for the statistical-inference block
  * (q116/q118/q119/q120 and their streaming twins s54/s56/s59): the
  * default uniform/independent testdata is structurally NULL for all of
  * them, so until round 14 their arithmetic was oracle-verified but
  * their detection path had never fired — the c43 planted-drift
  * discipline applied to inference. The planted side reads the seeded
  * `tools/gen_sf.py --effect` fixture (src/test/resources/effect_sf0.001,
  * regenerable); the null side reads the ordinary testdata dir. Each
  * test asserts BOTH: fires on planted, silent on default.
  */
class InferenceEffectSpec extends AnyFunSuite {
  import SparkTestSession._

  val eff: String = getClass.getResource("/effect_sf0.001").getPath

  test("q119 DiD detects the planted +15% treated-post shift and stays null on default data") {
    val planted = ops.Relational.q119_did(spark, eff).head()
    assert(planted.getAs[Int]("significant") == 1,
      s"planted DiD must read significant=1, got z=${planted.getAs[Double]("z")}")
    assert(planted.getAs[Double]("did") > 0.0)
    val default = ops.Relational.q119_did(spark, sf).head()
    assert(default.getAs[Int]("significant") == 0,
      s"uniform generator data must read null, got z=${default.getAs[Double]("z")}")
  }

  test("q120 placebo DiD stays null on the PLANTED data (shift is post-1997; placebo window is pre-period only)") {
    val placebo = ops.Relational.q120_placebo_did(spark, eff).head()
    assert(placebo.getAs[Int]("significant") == 0,
      "a 1997 treatment must not contaminate the 1995-vs-1996 placebo — " +
        s"got z=${placebo.getAs[Double]("z")}")
  }

  test("q116 odds ratio detects the planted p(R|discounted)=0.40 lift and spans 1 on default data") {
    val planted = ops.Relational.q116_odds_ratio(spark, eff).head()
    assert(planted.getAs[Double]("ci_lo") > 1.0,
      s"planted OR CI must exclude 1, got [${planted.getAs[Double]("ci_lo")}, " +
        s"${planted.getAs[Double]("ci_hi")}]")
    val default = ops.Relational.q116_odds_ratio(spark, sf).head()
    assert(default.getAs[Double]("ci_lo") <= 1.0 &&
      default.getAs[Double]("ci_hi") >= 1.0,
      "independent flags must give a CI spanning 1")
  }

  test("q118 SPRT accepts H1 on the planted 0.6 purchase share and never decides on default data") {
    val planted = ops.Relational.q118_sprt(spark, eff)
      .collect()
    assert(planted.last.getAs[String]("decision") == "accept_h1",
      "planted drift must cross the upper Wald boundary")
    // sticky: once crossed, every later day carries the decision
    val afterCross = planted.dropWhile(_.getAs[String]("decision") == "continue")
    assert(afterCross.nonEmpty &&
      afterCross.forall(_.getAs[String]("decision") == "accept_h1"))
    val default = ops.Relational.q118_sprt(spark, sf).collect()
    assert(default.last.getAs[String]("decision") == "continue",
      "the balanced default stream must never cross a boundary")
  }

  test("q121 DiD power: high power at the planted effect, near-α on default data, MDE published either way") {
    val planted = ops.Relational.q121_did_power(spark, eff).head()
    assert(planted.getAs[Double]("power_observed") > 0.5,
      s"planted shift must have meaningful detection power, got " +
        s"${planted.getAs[Double]("power_observed")}")
    assert(planted.getAs[Double]("did") > 0.0)
    val default = ops.Relational.q121_did_power(spark, sf).head()
    // a null z is noise in (−2, 2), so power lands anywhere below the
    // coin flip; the sharp claim is that the observed effect is NOT
    // powered (|z| < 2.8016) while the design's MDE is still published
    assert(default.getAs[Int]("powered") == 0 &&
      default.getAs[Double]("power_observed") < 0.5,
      "null data must read sub-coin-flip power — and still publish the MDE")
    // the design's detectability is reported even when nothing fired:
    // the MDE ladder is positive and ordered
    assert(default.getAs[Double]("mde_80") > 0.0 &&
      default.getAs[Double]("mde_90") > default.getAs[Double]("mde_80"))
  }

  test("streaming twins detect on the planted fixture exactly like their batch lanes") {
    // twin equality is the standing contract on ANY corpus; asserting it
    // on the planted one proves the streaming monitors DETECT, not just
    // agree on null data
    val s54 = streaming.StreamingQueries.s54_stream_sprt(spark, eff)
      .collect().map(_.toSeq).toSeq
    val q118 = ops.Relational.q118_sprt(spark, eff)
      .collect().map(_.toSeq).toSeq
    assert(s54 == q118 && s54.last.last == "accept_h1")

    val s56 = streaming.StreamingQueries.s56_stream_odds_ratio(spark, eff)
      .collect().map(_.toSeq).toSeq
    val q116 = ops.Relational.q116_odds_ratio(spark, eff)
      .collect().map(_.toSeq).toSeq
    assert(s56 == q116)

    val s59 = streaming.StreamingQueries.s59_stream_did(spark, eff)
      .collect().map(_.toSeq).toSeq
    val q119 = ops.Relational.q119_did(spark, eff)
      .collect().map(_.toSeq).toSeq
    assert(s59 == q119)
  }
}
