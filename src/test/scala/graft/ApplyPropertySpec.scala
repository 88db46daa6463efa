package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import graft.cdc.{Apply, Retention}

/** Property sweeps through the REAL distributed operators (not the pure
  * codec models of CodecPropertySpec): random WAL op streams run through
  * Spark's keyed apply and the retention-resume merge, compared against
  * an independent in-memory fold of the creek consumer contract. Fewer
  * cases than the pure suites (each case is a Spark job), but these pin
  * the distributed aggregation itself — ord discipline, u_pk half-event
  * explosion, truncate cuts, snapshot pseudo-insert merge — over inputs
  * the planted testdata never produces (dense key collisions, truncates
  * at every position, empty suffixes).
  */
case class FlatRow(lsn_long: Long, op: String, pk_before: Option[Long],
  pk_after: Option[Long], after_value: Option[Double])

object ApplyPropertySpec extends Properties("spark-apply") {
  import SparkTestSession.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  // dense key space (collisions on nearly every stream) and 2-dp-exact
  // values (n/100.0 survives Spark's round(x, 2) unchanged)
  private val genRows: Gen[Seq[FlatRow]] = for {
    n <- Gen.chooseNum(1, 60)
    specs <- Gen.listOfN(n, for {
      op <- Gen.frequency((5, "c"), (4, "u"), (3, "u_pk"), (3, "d"), (1, "t"))
      pk <- Gen.choose(0L, 12L)
      pkNew <- Gen.choose(0L, 12L)
      cents <- Gen.choose(-99999L, 99999L)
    } yield (op, pk, pkNew, cents / 100.0))
  } yield specs.zipWithIndex.map { case ((op, pk, pkNew, v), i) =>
    FlatRow((i + 1).toLong * 3, op,
      pk_before = if (op == "u_pk" || op == "d") Some(pk) else None,
      pk_after = op match {
        case "c" | "u" => Some(pk)
        case "u_pk" => Some(pkNew)
        case _ => None
      },
      after_value = if (op == "d" || op == "t") None else Some(v))
  }

  private def toDf(rows: Seq[FlatRow]): DataFrame = rows.toDF()

  /** The consumer contract as a pure fold (upsert c/u, u_pk = delete old
    * + upsert new, d deletes, t clears) — the replica ground truth.
    */
  private def fold(rows: Seq[FlatRow]): Map[Long, Double] =
    rows.sortBy(_.lsn_long).foldLeft(Map.empty[Long, Double]) { (st, r) =>
      r.op match {
        case "c" | "u" => st + (r.pk_after.get -> r.after_value.get)
        case "u_pk" => st - r.pk_before.get + (r.pk_after.get -> r.after_value.get)
        case "d" => st - r.pk_before.get
        case "t" => Map.empty
        case _ => st
      }
    }

  private def replica(df: DataFrame): Map[Long, Double] =
    df.collect().map(r => r.getAs[Long]("pk") -> r.getAs[Double]("value")).toMap

  property("Apply.latest ≡ consumer fold over random streams") =
    Prop.forAll(genRows) { rows =>
      val got = replica(Apply.latest(toDf(rows))
        .select(col("pk"), round(col("last_value"), 2).as("value")))
      got == fold(rows).map { case (k, v) => k -> (math.rint(v * 100) / 100) }
    }

  property("retention resume ≡ full replay for every gap-free cut") =
    Prop.forAll(genRows, Gen.chooseNum(0, 100), Gen.chooseNum(0, 100)) {
      (rows, floorPct, slackPct) =>
        val maxL = rows.map(_.lsn_long).max
        // any retention floor, and any consumer position at least
        // floor−1 (= no expiry gap between durable state and the
        // retained suffix; the gap case falls back to a snapshot cut,
        // which is the floor−1 bound again)
        val floor = 1L + (maxL * floorPct) / 100
        val from = math.min(maxL, floor - 1 + ((maxL - floor + 1).max(0) * slackPct) / 100)
        val flat = toDf(rows)
        val got = replica(Retention.resumeReplay(flat, floor, from))
        val want = replica(Apply.latest(flat)
          .select(col("pk"), round(col("last_value"), 2).as("value")))
        Prop.collect(s"floor≤${if (floor <= 1) "min" else "mid"}") {
          got == want
        }
    }
}
