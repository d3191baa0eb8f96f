package graft.dfl

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import java.nio.file.{Files, Paths}

/** Golden checks: the reference's named pipelines (named/named.go:14-22)
  * over a GeoJSON-lines fixture. */
class NamedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val fixture: String = {
    val dir = Files.createTempDirectory("graft-named").toString
    Files.writeString(Paths.get(s"$dir/features.jsonl"), Seq(
      """{"type":"Feature","properties":{"name":"dc","_tile_x":73,"_tile_y":97,"_tile_z":8},"geometry":{"type":"Point","coordinates":[-77.03,38.9]}}""",
      """{"type":"Feature","properties":{"name":"nyc","_tile_x":75,"_tile_y":96,"_tile_z":8},"geometry":{"type":"Point","coordinates":[-74.0,40.7]}}""",
      """{"type":"Feature","properties":{"name":"london","_tile_x":127,"_tile_y":85,"_tile_z":8},"geometry":{"type":"Point","coordinates":[-0.1,51.5]}}""",
      """{"type":"Feature","properties":{"name":"nullgeo"},"geometry":{"type":"Point"}}""",
    ).mkString("\n"))
    s"$dir/features.jsonl"
  }

  test("GeometryFilter keeps only in-bbox features and drops null geometry") {
    val df = spark.read.json(fixture)
    val out = Named(df, Named.geometryFilter,
      Map("bbox" -> Seq(-80.0, 35.0, -70.0, 45.0)))
    assert(out.select("properties.name").collect().map(_.getString(0)).toSet ==
      Set("dc", "nyc"))
  }

  test("Length and Limit") {
    val df = spark.read.json(fixture)
    assert(Named(df, Named.length).head().getLong(0) == 4L)
    assert(Named(df, Named.limit, Map("limit" -> 2L)).count() == 2L)
  }

  test("GeoJSONLinesToGeoJSON strips tile keys and wraps a FeatureCollection") {
    val df = spark.read.json(fixture).where("properties.name = 'dc'")
    val fc = Named(df, Named.geoJsonLinesToGeoJson)
    val row = fc.head()
    assert(row.getAs[String]("type") == "FeatureCollection")
    assert(row.getAs[Long]("numberOfFeatures") == 1L)
    val feature = row.getAs[Seq[org.apache.spark.sql.Row]]("features").head
    val props = feature.getAs[org.apache.spark.sql.Row]("properties")
    assert(props.schema.fieldNames.toSet == Set("name"))
    assert(props.getAs[String]("name") == "dc")
  }

  test("osm.sh gas-stations process: dataset var caching, conditional limit, FC") {
    // reference: examples/osm.sh:165 — the full service expression with
    // `$c := ($c ?: filter(...))`, `$c` substitution, driver-side
    // conditional limit, and FeatureCollection assembly
    val dir = Files.createTempDirectory("graft-osm").toString
    Files.writeString(Paths.get(s"$dir/f.jsonl"), Seq(
      """{"type":"Feature","properties":{"name":"shell","amenity":"fuel"},"geometry":{"type":"Point","coordinates":[-77.0,38.9]}}""",
      """{"type":"Feature","properties":{"name":"bp","amenity":"fuel"},"geometry":{"type":"Point","coordinates":[-76.9,38.8]}}""",
      """{"type":"Feature","properties":{"name":"cafe","amenity":"cafe"},"geometry":{"type":"Point","coordinates":[-77.1,38.7]}}""",
    ).mkString("\n"))
    val df = spark.read.json(s"$dir/f.jsonl")
    val src =
      """($c := ($c ?: filter(@, "(@properties?.amenity != null) and (@properties.amenity in [fuel])"))) |
        |$c |
        |(($limit > 0) ? limit(@, $limit) : @) |
        |{type: FeatureCollection, features: @, numberOfFeatures: len(@)}""".stripMargin
    // no limit (0) → both stations
    val (fc0, dsVars) = DflFrame.pipelineWithVars(df, src, Map("limit" -> 0L))
    assert(fc0.head().getAs[Long]("numberOfFeatures") == 2L)
    assert(dsVars.contains("c"))
    // limit 1 with the CACHED $c seeded back in (second exec skips the filter)
    val (fc1, _) = DflFrame.pipelineWithVars(df, src,
      Map("limit" -> 1L) ++ dsVars)
    assert(fc1.head().getAs[Long]("numberOfFeatures") == 1L)
  }

  test("GroupByTile groups by [tileY, tileX] at $z") {
    val df = spark.read.json(fixture).where("geometry.coordinates IS NOT NULL")
    val out = Named(df, Named.groupByTile, Map("z" -> 8L))
    val keys = out.select("key0", "key1").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // z=8: dc/nyc/london → (ty, tx) per LatitudeToTile/LongitudeToTile
    assert(keys == Set((97L, 73L), (96L, 75L), (85L, 127L)))
    assert(out.count() == 3)
  }
}
