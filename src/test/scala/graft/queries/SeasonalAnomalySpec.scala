package graft.queries

import graft.SparkSpec

/** Behavioral pins for q184's dense-grid anomaly scoring: a SILENT
  * hour in a normally-busy cell must rank as an anomaly (the outage
  * case a sparse-only join is blind to), and quiet-but-normal cells
  * must not.
  */
class SeasonalAnomalySpec extends SparkSpec {
  import spark.implicits._

  private val hr = 3600000L
  private val wk = 168L * hr

  test("a silent hour in a busy cell outranks normal variation; quiet cells stay quiet") {
    // Cell A (hour-of-week 10): 12 events in weeks 0,1,3 — week 2 is
    // SILENT (the outage). Cell B (hour-of-week 50): exactly 1 event
    // every week (perfectly seasonal). Plus a spike cell C (how 90):
    // 1,1,1,25.
    val rows: Seq[Long] =
      (0 until 4).filter(_ != 2).flatMap(w =>
        Seq.fill(12)(w * wk + 10 * hr + 5)) ++
      (0 until 4).map(w => w * wk + 50 * hr + 9) ++
      Seq(0L * wk + 90 * hr, 1L * wk + 90 * hr, 2L * wk + 90 * hr) ++
      Seq.fill(25)(3L * wk + 90 * hr + 1)
    val out = Signals.seasonalAnomaliesOf(rows.toDF("ts_ms")).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5)))
    // top two anomalies: the spike (|25 - 7| = 18) and the outage
    // (|0 - 9| = 9); the silent hour APPEARS even though no event
    // row exists for it
    val silentHour = 2L * wk / hr + 10
    val spikeHour = 3L * wk / hr + 90
    val top2 = out.sortBy(-_._4).take(2).map(_._1).toSet
    assert(top2 == Set(silentHour, spikeHour), s"top2 $top2\nall ${out.toSeq}")
    val silent = out.find(_._1 == silentHour).get
    assert(silent._2 == 0L, "silent hour must report zero events")
    assert(silent._4 == silent._3, "silent-hour score = its full expected mass")
    // perfectly seasonal cell B scores 0 in every week
    val bHours = (0 until 4).map(w => w * 168L + 50).toSet
    out.filter(o => bHours.contains(o._1)).foreach { o =>
      assert(o._4 == 0L, s"seasonal hour ${o._1} scored ${o._4}")
    }
  }
}
