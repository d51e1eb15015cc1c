package graft.geom

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests: random geometries survive WKT / WKB / GeoJSON round-trips
  * bit-exactly, and derived invariants (bbox, area sign, length) agree across
  * representations.
  */
class CodecPropertySpec extends AnyFunSuite {

  /** Deterministic sampling loop (scalatestplus bridge isn't in the offline
    * cache; raw scalacheck generators drive the same property checks).
    */
  private def forAll[T](gen: Gen[T], n: Int = 200)(check: T => Unit): Unit = {
    var seed = Seed(42L)
    var produced = 0
    while (produced < n) {
      gen.apply(Gen.Parameters.default, seed).foreach { v => check(v); produced += 1 }
      seed = seed.next
    }
  }

  private val coord = Gen.chooseNum(-179.0, 179.0)
  private val pair = for { x <- coord; y <- Gen.chooseNum(-85.0, 85.0) } yield (x, y)

  private def packed(min: Int, max: Int): Gen[Array[Double]] =
    Gen.chooseNum(min, max).flatMap { n =>
      Gen.listOfN(n, pair).map(ps => ps.flatMap(p => Seq(p._1, p._2)).toArray)
    }

  private val genPoint: Gen[Geom] = pair.map { case (x, y) => Point(x, y) }
  private val genMultiPoint: Gen[Geom] = packed(1, 6).map(MultiPoint.apply)
  private val genLine: Gen[Geom] = packed(2, 8).map(LineString.apply)
  private val genMultiLine: Gen[Geom] =
    Gen.listOfN(2, packed(2, 5)).map(ps => MultiLineString(ps.toArray))
  private val genRing: Gen[Array[Double]] = for {
    (cx, cy) <- pair
    n <- Gen.chooseNum(3, 8)
    r <- Gen.chooseNum(0.001, 0.9)
  } yield {
    val cs = new Array[Double]((n + 1) * 2)
    for (k <- 0 to n) {
      val a = 2 * math.Pi * k / n
      cs(k * 2) = cx + r * math.cos(a)
      cs(k * 2 + 1) = cy + r * math.sin(a)
    }
    cs
  }
  private val genPolygon: Gen[Geom] = genRing.map(r => Polygon(Array(r)))
  private val genMultiPolygon: Gen[Geom] =
    Gen.listOfN(2, genRing).map(rs => MultiPolygon(rs.map(Array(_)).toArray))

  private val genGeom: Gen[Geom] = Gen.oneOf(
    genPoint, genMultiPoint, genLine, genMultiLine, genPolygon, genMultiPolygon)

  test("WKB round-trip is bit-exact for random geometries") {
    forAll(genGeom) { g =>
      val back = WKB.read(WKB.write(g))
      assert(WKT.write(back) == WKT.write(g))
      assert(back.bbox == g.bbox)
      assert(Algos.area(back) == Algos.area(g))
      assert(Algos.length(back) == Algos.length(g))
    }
  }

  test("EWKB SRID stamp (PostGIS st_setsrid shape) reads back to the same geometry") {
    forAll(genGeom, n = 100) { g =>
      val plain = WKB.write(g)
      // stamp the 0x20000000 flag + 4-byte SRID after the type word, exactly
      // what a PostGIS read-back delivers after st_setsrid
      val buf = java.nio.ByteBuffer.wrap(plain, 1, 4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val rawType = buf.getInt
      val out = java.nio.ByteBuffer.allocate(plain.length + 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put(plain(0)).putInt(rawType | 0x20000000).putInt(4326)
        .put(plain, 5, plain.length - 5)
      val back = WKB.read(out.array())
      assert(WKT.write(back) == WKT.write(g))
    }
  }

  test("WKT round-trip is value-exact for random geometries") {
    forAll(genGeom) { g =>
      val back = WKT.read(WKT.write(g))
      assert(WKT.write(back) == WKT.write(g)) // shortest-repr doubles round-trip
      assert(back.bbox == g.bbox)
    }
  }

  test("GeoJSON geometry round-trip is value-exact") {
    forAll(genGeom) { g =>
      val back = GeoJson.readGeometry(GeoJson.writeGeometry(g))
      assert(WKT.write(back) == WKT.write(g))
    }
  }

  test("union area of one polygon equals its area; of disjoint copies, the sum") {
    forAll(genPolygon, n = 100) { case p @ Polygon(rings) =>
      val a = Algos.area(p)
      val ua = UnionOps.unionArea(IndexedSeq(rings))
      assert(math.abs(ua - a) <= 1e-9 * math.max(1.0, a))
      // shifted far away: areas add
      val shifted = Geom.mapCoords(p)((x, y) => (x + 400.0, y)) match {
        case Polygon(rs) => rs
        case _ => throw new AssertionError("shift changed type")
      }
      val both = UnionOps.unionArea(IndexedSeq(rings, shifted))
      assert(math.abs(both - 2 * a) <= 1e-8 * math.max(1.0, a))
    }
  }
}
