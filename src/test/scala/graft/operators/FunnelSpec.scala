package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

/** Funnel chain resolution: earliest strictly-increasing stage chain,
  * break propagation, and the out-of-order/backwards cases that a naive
  * per-stage min (without the after-previous-stage condition) gets wrong.
  */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(m * 60000L)

  private val stages = Seq("view", "click", "purchase")

  private def run(rows: (Long, Timestamp, String)*) =
    Funnel.resolve(rows.toSeq.toDF("user_id", "ts", "event_type"),
        "user_id", "ts", "event_type", stages)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getTimestamp(1)), Option(r.getTimestamp(2)),
          Option(r.getTimestamp(3)), r.getInt(4)))).toMap

  test("full chain resolves to the earliest valid times") {
    val got = run(
      (1L, ts(10), "view"), (1L, ts(5), "click"),      // click BEFORE view: ignored
      (1L, ts(20), "click"), (1L, ts(15), "purchase"), // purchase before click: ignored
      (1L, ts(30), "purchase"), (1L, ts(40), "click")) // later click loses to ts(20)
    assert(got(1L) === ((Some(ts(10)), Some(ts(20)), Some(ts(30)), 3)))
  }

  test("a broken chain nulls the remaining stages and reached counts the prefix") {
    val got = run(
      (1L, ts(10), "view"), (1L, ts(20), "purchase"),  // no click -> purchase can't count
      (2L, ts(10), "view"), (2L, ts(20), "click"),
      (3L, ts(10), "click"), (3L, ts(20), "purchase")) // never viewed -> no row
    assert(got(1L) === ((Some(ts(10)), None, None, 1)))
    assert(got(2L) === ((Some(ts(10)), Some(ts(20)), None, 2)))
    assert(!got.contains(3L))
  }

  test("equal timestamps do NOT advance the chain (strictly increasing)") {
    val got = run((1L, ts(10), "view"), (1L, ts(10), "click"))
    assert(got(1L) === ((Some(ts(10)), None, None, 1)))
  }

  test("the earliest chain is not greedy-shortest: a later view never steals") {
    // views at 10 and 25; clicks at 30. t_view=10 (earliest), click=30.
    val got = run((1L, ts(25), "view"), (1L, ts(10), "view"), (1L, ts(30), "click"))
    assert(got(1L) === ((Some(ts(10)), Some(ts(30)), None, 2)))
  }
}
