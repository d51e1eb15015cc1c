package graft.geom

import org.scalatest.funsuite.AnyFunSuite

class HilbertSpec extends AnyFunSuite {

  test("bits=2 curve is the classic 4x4 Hilbert walk: consecutive cells are adjacent") {
    val byD = (for (x <- 0L to 3L; y <- 0L to 3L) yield Hilbert.cell(x, y, 2) -> (x, y)).toMap
    assert(byD.keySet === (0L to 15L).toSet) // a bijection onto 0..15
    for (d <- 0L to 14L) {
      val (x0, y0) = byD(d); val (x1, y1) = byD(d + 1)
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) === 1,
        s"jump at d=$d: ($x0,$y0) -> ($x1,$y1)") // Hilbert never jumps; Morton does
    }
    assert(byD(0L) === ((0L, 0L)))
  }

  test("depth-d cell index is the exact prefix of the full-depth key") {
    val rnd = new scala.util.Random(3)
    for (_ <- 1 to 200) {
      val x = rnd.nextInt(1 << 16).toLong; val y = rnd.nextInt(1 << 16).toLong
      val full = Hilbert.cell(x, y, 16)
      for (d <- Seq(4, 8, 12)) {
        val prefix = Hilbert.cell(x >> (16 - d), y >> (16 - d), d)
        assert(full >> (2 * (16 - d)) === prefix, s"(x=$x y=$y d=$d)")
      }
    }
  }

  test("cover is a superset and never wider than the Morton cover in ranges") {
    val (lo0, la0, lo1, la1) = (-10.0, -10.0, 5.0, 5.0)
    val ranges = Hilbert.cover(lo0, la0, lo1, la1, 16)
    assert(ranges.length <= 32)
    val rnd = new scala.util.Random(17)
    for (_ <- 1 to 500) {
      val lon = lo0 + rnd.nextDouble() * (lo1 - lo0)
      val lat = la0 + rnd.nextDouble() * (la1 - la0)
      val h = Hilbert.encode(lon, lat, 16)
      assert(ranges.exists(r => h >= r._1 && h <= r._2), s"($lon,$lat) h=$h uncovered")
    }
    // locality claim: before budget-merging kicks in, the continuous curve
    // needs no more ranges than Morton for the same box at the same depth
    val hRaw = Hilbert.cover(lo0, la0, lo1, la1, 16, maxRanges = 10000)
    val zRaw = ZOrder.cover(lo0, la0, lo1, la1, 16, maxRanges = 10000)
    assert(hRaw.length <= zRaw.length,
      s"hilbert ${hRaw.length} ranges vs morton ${zRaw.length}")
  }

  test("encode clamps like the Morton encode") {
    assert(Hilbert.encode(-180.0, -90.0, 16) === Hilbert.cell(0, 0, 16))
    assert(Hilbert.encode(999.0, 999.0, 16) === Hilbert.cell(65535, 65535, 16))
  }
}
