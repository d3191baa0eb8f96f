package graft.geo

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters, Passed}

/** Property tests for the tile math (SURVEY.md §5.4): inverse round-trips
  * and bounds, mirroring the reference formulas
  * (reference: geo/LongitudeToTile.go:14-16, geo/TileToBoundingBox.go:10-16). */
class TileMathSpec extends AnyFunSuite {

  private val lonGen = Gen.chooseNum(-179.999, 179.999)
  private val latGen = Gen.chooseNum(-84.999, 84.999)
  private val zGen = Gen.chooseNum(0, 18)

  private def holds(p: Prop): Unit = {
    val res = check(Parameters.default.withMinSuccessfulTests(500), p)
    assert(res.status == Passed, res.status.toString)
  }

  test("tile index within [0, 2^z)") {
    holds(Prop.forAll(lonGen, latGen, zGen) { (lon, lat, z) =>
      val x = TileMath.lonToTile(lon, z)
      val y = TileMath.latToTile(lat, z)
      x >= 0 && x < (1L << z) && y >= 0 && y < (1L << z)
    })
  }

  test("lon→tile→lon round trip brackets the input") {
    holds(Prop.forAll(lonGen, zGen) { (lon, z) =>
      val x = TileMath.lonToTile(lon, z)
      TileMath.tileToLon(x, z) <= lon && lon < TileMath.tileToLon(x + 1, z) + 1e-9
    })
  }

  test("lat→tile→lat round trip brackets the input (y grows southward)") {
    holds(Prop.forAll(latGen, zGen) { (lat, z) =>
      val y = TileMath.latToTile(lat, z)
      val n = TileMath.tileToLat(y, z)
      val s = TileMath.tileToLat(y + 1, z)
      s - 1e-9 <= lat && lat <= n + 1e-9
    })
  }

  test("flipY is an involution") {
    holds(Prop.forAll(zGen) { z =>
      val ys = Seq(0L, 1L, (1L << z) / 2, math.max(0L, (1L << z) - 1))
      ys.forall(y => TileMath.flipY(TileMath.flipY(y, z), z) == y)
    })
  }

  test("bbox w<e and s<n, and contains the generating point") {
    holds(Prop.forAll(lonGen, latGen, zGen) { (lon, lat, z) =>
      val x = TileMath.lonToTile(lon, z)
      val y = TileMath.latToTile(lat, z)
      val (w, s, e, n) = TileMath.tileToBoundingBox(z, x, y)
      w < e && s < n &&
        w <= lon && lon <= e + 1e-9 && s - 1e-9 <= lat && lat <= n + 1e-9
    })
  }

  test("buffered bbox contains the unbuffered bbox") {
    holds(Prop.forAll(lonGen, latGen, Gen.chooseNum(1, 16)) { (lon, lat, z) =>
      val x = TileMath.lonToTile(lon, z)
      val y = TileMath.latToTile(lat, z)
      val (w, s, e, n) = TileMath.tileToBoundingBox(z, x, y)
      val (bw, bs, be, bn) = TileMath.bufferedTileBoundingBox(z, x, y, 1)
      bw <= w && bs <= s && be >= e && bn >= n
    })
  }
}
