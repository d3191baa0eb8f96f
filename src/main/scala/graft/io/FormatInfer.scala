package graft.io

/** Filename → (basename, format, compression) inference.
  *
  * Same behavior as the reference's pure function
  * (reference: util/SplitNameFormatCompression.go:31-106): an optional
  * trailing `.enc` marker is stripped first, then one compression
  * extension (`.gz` `.sz` `.bz2` `.zip`), then the format extension.
  * `.geojson` folds to `json`, `.geojsonl` to `jsonl`, `.yml` to `yaml`,
  * `.props`/`.prop` to `properties`, `.tf` to `hcl`.
  */
object FormatInfer {

  final case class Inferred(base: String, format: String, compression: String)

  private def ext(p: String): String = {
    val slash = math.max(p.lastIndexOf('/'), p.lastIndexOf('\\'))
    val dot = p.lastIndexOf('.')
    if (dot > slash && dot >= 0) p.substring(dot) else ""
  }

  def split(path0: String): Inferred = {
    var p = path0
    var e = ext(p)
    if (e.isEmpty) return Inferred(p, "", "")

    if (e == ".enc") {
      p = p.dropRight(4)
      e = ext(p)
      if (e.isEmpty) return Inferred(p, "", "")
    }

    val compression = e match {
      case ".gz"  => p = p.dropRight(3); e = ext(p); "gzip"
      case ".sz"  => p = p.dropRight(3); e = ext(p); "snappy"
      case ".bz2" => p = p.dropRight(4); e = ext(p); "bzip2"
      case ".zip" => p = p.dropRight(4); e = ext(p); "zip"
      case _      => ""
    }
    if (e.isEmpty) return Inferred(p, "", compression)

    val base = p.dropRight(e.length)
    val format = e match {
      case ".csv"                         => "csv"
      case ".tsv"                         => "tsv"
      case ".geojson" | ".json"           => "json"
      case ".bson"                        => "bson"
      case ".jsonl" | ".geojsonl"         => "jsonl"
      case ".html"                        => "html"
      case ".yaml" | ".yml"               => "yaml"
      case ".properties" | ".props" | ".prop" => "properties"
      case ".tf" | ".hcl"                 => "hcl"
      case ".toml"                        => "toml"
      // not in the reference's table, but this engine's primary format —
      // DataStoreIO reads/writes it and Server.formats advertises it
      case ".parquet"                     => "parquet"
      case ".orc"                         => "orc"
      case _                              => ""
    }
    if (format.isEmpty) Inferred(base, "", compression)
    else Inferred(base, format, compression)
  }
}
