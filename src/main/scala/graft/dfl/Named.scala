package graft.dfl

import org.apache.spark.sql.DataFrame

/** The reference's precompiled named pipelines (reference:
  * named/named.go:14-22), exposed verbatim as DFL sources. Each compiles
  * through the same front-end as user pipelines — these exist so server
  * and tile paths share one audited implementation of the hot queries.
  */
object Named {

  /** Keep features whose point coordinates fall inside `$bbox`
    * = [w, s, e, n] (reference: named/named.go:14 GeometryFilter). */
  val geometryFilter: String =
    "filter(@, '(@geometry?.coordinates != null) and " +
      "(@geometry.coordinates[0] within $bbox[0] and $bbox[2]) and " +
      "(@geometry.coordinates[1] within $bbox[1] and $bbox[3])')"

  /** Dataset length (reference: named/named.go:16 Length). */
  val length: String = "len(@)"

  /** First `$limit` rows (reference: named/named.go:18 Limit). */
  val limit: String = "limit(@, $limit)"

  /** Strip tile-shard bookkeeping keys and assemble a FeatureCollection
    * (reference: named/named.go:20 GeoJSONLinesToGeoJSON). */
  val geoJsonLinesToGeoJson: String =
    "map(@, '@properties -= {`_tile_x`, `_tile_y`, `_tile_z`}') | " +
      "{type: FeatureCollection, features: @, numberOfFeatures: len(@)}"

  /** Group features by [tileY, tileX] at zoom `$z`
    * (reference: named/named.go:22 GroupByTile). */
  val groupByTile: String =
    "group(@, '[tileY(@geometry.coordinates[1], $z), tileX(@geometry.coordinates[0], $z)]')"

  def apply(df: DataFrame, dflSrc: String, vars: Map[String, Any] = Map.empty): DataFrame =
    DflFrame.pipeline(df, dflSrc, vars)
}
