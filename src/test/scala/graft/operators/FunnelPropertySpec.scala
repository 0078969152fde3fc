package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property test (seeded): random event streams through the exact
  * e_funnel_stages plan must match the greedy per-user simulation —
  * including timestamp collisions (ties broken by event_id, the plan's
  * total order) and stage events arriving out of order.
  */
class FunnelPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val rng = new scala.util.Random(2468)

  test("random event streams match the greedy funnel simulation") {
    import spark.implicits._
    val types = Vector("view", "click", "purchase", "signup", "error")
    for (trial <- 1 to 8) {
      val events = (0 until 150 + rng.nextInt(100)).map { i =>
        (1L + rng.nextInt(15), types(rng.nextInt(types.length)),
          // coarse µs values force frequent ts collisions
          (rng.nextInt(30) * 1000000L), i.toLong)
      }
      val df = events.toDF("user_id", "event_type", "us", "event_id")
        .select(col("user_id"), col("event_type"),
          timestamp_micros(col("us")).as("ts"), col("event_id"))

      val expected = events.groupBy(_._1).map { case (uid, evs) =>
        var stage = 0
        evs.sortBy(e => (e._3, e._4)).foreach { case (_, tpe, _, _) =>
          if (stage == 0 && tpe == "view") stage = 1
          else if (stage == 1 && tpe == "click") stage = 2
          else if (stage == 2 && tpe == "purchase") stage = 3
        }
        uid -> stage
      }
      val got = Events.funnelStages(df)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == expected, s"trial $trial: funnel diverges from simulation")
    }
  }
}
