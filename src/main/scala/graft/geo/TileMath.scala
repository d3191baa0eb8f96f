package graft.geo

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Web-Mercator slippy-tile math.
  *
  * Semantics match the reference's pure functions
  * (reference: geo/LongitudeToTile.go:14-16, geo/LatitudeToTile.go:14-17,
  * geo/TileToLongitude.go:14-16, geo/TileToLatitude.go:16-19,
  * geo/TileToBoundingBox.go:10-16, geo/FlipY.go:14-43), but the column
  * forms are COMPOSED FROM BUILT-IN Catalyst functions rather than a custom
  * `Expression`: every formula below is floor/log/tan/pow arithmetic, so
  * whole-stage codegen and constant folding apply for free, and the
  * expressions stay pushdown-friendly. Scalar Scala forms are provided for
  * driver-side predicate construction (extent pruning, bbox math).
  */
object TileMath {

  // ---- driver-side scalar forms ----

  def lonToTile(lon: Double, z: Int): Long =
    math.floor((lon + 180.0) / 360.0 * (1L << z)).toLong

  def latToTile(lat: Double, z: Int): Long = {
    val rad = math.toRadians(lat)
    math.floor((1.0 - math.log(math.tan(rad) + 1.0 / math.cos(rad)) / math.Pi) / 2.0 * (1L << z)).toLong
  }

  def tileToLon(x: Long, z: Int): Double = x.toDouble / (1L << z) * 360.0 - 180.0

  def tileToLat(y: Long, z: Int): Double = {
    val n = math.Pi - 2.0 * math.Pi * y.toDouble / (1L << z)
    math.toDegrees(math.atan(math.sinh(n)))
  }

  /** Tile → `[w, s, e, n]` bounding box (reference: geo/TileToBoundingBox.go:10-16). */
  def tileToBoundingBox(z: Int, x: Long, y: Long): (Double, Double, Double, Double) =
    (tileToLon(x, z), tileToLat(y + 1, z), tileToLon(x + 1, z), tileToLat(y, z))

  /** TMS y-axis flip (reference: geo/FlipY.go:14-43). */
  def flipY(y: Long, z: Int): Long = (1L << z) - 1L - y

  /** Expand a tile bbox by `buffer` tiles on each side, clamped to the
    * world extent (reference: handlers/LayerTileHandler.go:239-244). */
  def bufferedTileBoundingBox(z: Int, x: Long, y: Long, buffer: Long): (Double, Double, Double, Double) = {
    val maxIdx = (1L << z) - 1
    val x0 = math.max(0L, x - buffer); val x1 = math.min(maxIdx, x + buffer)
    val y0 = math.max(0L, y - buffer); val y1 = math.min(maxIdx, y + buffer)
    (tileToLon(x0, z), tileToLat(y1 + 1, z), tileToLon(x1 + 1, z), tileToLat(y0, z))
  }

  // ---- Catalyst column forms (codegen-friendly built-in composition) ----

  /** `tileX(lon, z)` — slippy x index. */
  def tileX(lon: Column, z: Column): Column =
    floor((lon.cast(DoubleType) + 180.0) / 360.0 * pow(lit(2.0), z.cast(DoubleType)))
      .cast(LongType)

  /** `tileY(lat, z)` — slippy y index (ln/tan form). */
  def tileY(lat: Column, z: Column): Column = {
    val rad = radians(lat.cast(DoubleType))
    floor((lit(1.0) - log(tan(rad) + lit(1.0) / cos(rad)) / math.Pi) / 2.0
      * pow(lit(2.0), z.cast(DoubleType))).cast(LongType)
  }

  def tileToLongitude(x: Column, z: Column): Column =
    x.cast(DoubleType) / pow(lit(2.0), z.cast(DoubleType)) * 360.0 - 180.0

  def tileToLatitude(y: Column, z: Column): Column = {
    val n = lit(math.Pi) - lit(2.0 * math.Pi) * y.cast(DoubleType) / pow(lit(2.0), z.cast(DoubleType))
    degrees(atan(sinh(n)))
  }

  def flipYCol(y: Column, z: Column): Column =
    (pow(lit(2.0), z.cast(DoubleType)).cast(LongType) - 1L) - y.cast(LongType)
}
