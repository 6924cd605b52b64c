package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Window-assignment math fixtures ported from the reference's
  * window_test.go:40-152 (FIXTURES.md F6), plus properties the formula
  * must satisfy on a deterministic randomized sweep.
  */
class FixedWindowsSpec extends AnyFunSuite {

  test("sliding size 5 slide 1: ts 7 in [3,8)..[7,12)") {
    assert(FixedWindows.assign(7, 5, 1) == Seq(3L, 4L, 5L, 6L, 7L))
  }

  test("tumbling 3/3") {
    assert(FixedWindows.assign(0, 3, 3) == Seq(0L))
    assert(FixedWindows.assign(2, 3, 3) == Seq(0L))
    assert(FixedWindows.assign(3, 3, 3) == Seq(3L))
  }

  test("slide > size leaves gaps: size 5 slide 6") {
    assert(FixedWindows.assign(5, 5, 6).isEmpty) // ts 5 in no window
    assert(FixedWindows.assign(42, 5, 6) == Seq(42L)) // [42,47)
    assert(FixedWindows.assign(4, 5, 6) == Seq(0L))
  }

  test("clamped at zero: early ts joins fewer windows") {
    assert(FixedWindows.assign(1, 5, 2) == Seq(0L))
    assert(FixedWindows.assign(2, 5, 2) == Seq(0L, 2L))
  }

  test("properties: every assigned window contains ts; starts on slide grid") {
    val rnd = new scala.util.Random(42)
    (1 to 2000).foreach { _ =>
      val ts = rnd.nextInt(10000).toLong
      val size = 1L + rnd.nextInt(50)
      val slide = 1L + rnd.nextInt(50)
      val starts = FixedWindows.assign(ts, size, slide)
      assert(starts.forall(st => st <= ts && ts < st + size), s"($ts,$size,$slide)")
      assert(starts.forall(st => st % slide == 0 && st >= 0), s"($ts,$size,$slide)")
      assert(starts == starts.sorted && starts.distinct == starts)
      // completeness: any non-negative slide-multiple window containing ts is in the list
      val all = (0L to ts by slide).filter(st => ts < st + size)
      assert(starts == all, s"($ts,$size,$slide)")
    }
  }

  test("manager: closes on watermark, late records reopen") {
    val m = new FixedWindowManager[Int](5, 2, () => 0)
    m.add(1)(_ + 1) // [0,5)
    m.add(2)(_ + 1) // [0,5), [2,7)
    assert(m.advance(4).isEmpty) // wm 4 < stop 5
    val c1 = m.advance(5)
    assert(c1 == Seq(WindowSlice(0L, 5L, 2)))
    // late record: reopens [0,5) ad hoc
    m.add(2)(_ + 1)
    val c2 = m.advance(7)
    assert(c2.map(w => (w.start, w.stop, w.state)) == Seq((0L, 5L, 1), (2L, 7L, 2)))
    // watermark is monotone: lower wm ignored
    m.add(8)(_ + 1)
    assert(m.advance(3).isEmpty)
    assert(m.watermark == 7L)
  }
}
