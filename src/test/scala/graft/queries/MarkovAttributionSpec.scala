package graft.queries

import graft.SparkSpec

/** Pins the q269 removal-effect pipeline on hand-built paths where the
  * absorbing-chain solution is exact by inspection:
  *
  *   4 users, all events 1 s apart (one session each):
  *     u0: click → purchase        u1: click → purchase
  *     u2: view  → purchase        u3: view  → error  (no purchase)
  *
  * Chain: START → click (2/4) | view (2/4); click → CONV (2/2);
  * view → CONV (1/2) | error (1/2); error → NULL (1/1).
  * Base p(CONV|START) = 1/2·1 + 1/2·1/2 = 3/4.
  * Remove click → its mass goes NULL: p = 1/2·1/2 = 1/4 ⇒ effect 2/3.
  * Remove view  → p = 1/2 ⇒ effect 1/3.
  * Remove error → paths through error never converted: effect 0.
  * Shares: 2/3 : 1/3 : 0 over Σ=1 ⇒ 2/3 and 1/3 exactly.
  */
class MarkovAttributionSpec extends SparkSpec {
  import spark.implicits._

  test("hand-solvable chain: exact removal effects and shares") {
    val base = 1700000000000L
    def path(u: Long, types: Seq[String]): Seq[(Long, Long, String, Long)] =
      types.zipWithIndex.map { case (t, i) =>
        (u * 100 + i, u, t, base + i * 1000L)
      }
    val rows =
      path(0, Seq("click", "purchase")) ++ path(1, Seq("click", "purchase")) ++
        path(2, Seq("view", "purchase")) ++ path(3, Seq("view", "error"))
    val ev = rows.toDF("event_id", "user_id", "event_type", "ts_ms")
    val out = EventWindows.removalEffectsOf(ev)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val S = 1048576L
    // base conversion 3/4 exactly (every division in the fixture is
    // exact in 2^20 fixed point: denominators 2 and 4)
    val (b, remClick, effClick, shareClick) = out("click")
    assert(b == 3 * S / 4, s"base $b")
    assert(remClick == S / 4)
    // effect = (3/4 − 1/4)/(3/4) = 2/3 — truncating DIV
    assert(effClick == (b - S / 4) * S / b)
    val (_, remView, effView, shareView) = out("view")
    assert(remView == S / 2)
    assert(effView == (b - S / 2) * S / b)
    val (_, remErr, effErr, shareErr) = out("error")
    assert(remErr == b && effErr == 0L && shareErr == 0L)
    // shares split 2:1 over the total observed effect
    val tot = effClick + effView
    assert(shareClick == effClick * S / tot)
    assert(shareView == effView * S / tot)
    // signup never appears: its removal changes nothing
    val (_, remSign, effSign, _) = out("signup")
    assert(remSign == b && effSign == 0L)
  }
}
