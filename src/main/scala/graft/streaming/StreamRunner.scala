package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import graft.dfl.DflFrame

/** Batch/stream parity on ONE logical plan.
  *
  * The reference's `--stream` flag switches the SAME DFL pipeline from
  * whole-dataset evaluation to record-at-a-time evaluation over a line
  * channel (reference: cli/process.go:656-851, shared processObject at
  * 114-127). The Spark-native analogue: the DFL source compiles once and
  * applies identically to a batch `DataFrame` or a Structured Streaming
  * `DataFrame` — parity holds by construction because both run the same
  * compiled Column plan.
  *
  * Streamable formats are csv/tsv/jsonl only, enforced like the reference
  * (config/Input.go:30-32). Dataset-level DFL stages that need global
  * state (sort, limit, set, len, bbox) are rejected in stream mode —
  * record-at-a-time semantics, same as the reference; hist/group become
  * windowless streaming aggregations in update mode if needed later.
  */
object StreamRunner {

  val streamableFormats: Set[String] = Set("csv", "tsv", "jsonl")

  private val unstreamableFns = Seq("sort(", "limit(", "set(", "len(", "bbox(")

  def validateStreamable(format: String, dflSrc: String): Unit = {
    require(streamableFormats(format),
      s"format '$format' is not streamable (streamable: ${streamableFormats.mkString(", ")})")
    unstreamableFns.find(f => dflSrc.contains(f)).foreach { f =>
      throw new IllegalArgumentException(
        s"dataset operator ${f.dropRight(1)} requires whole-dataset context; not valid with --stream")
    }
  }

  /** Open a streaming DataFrame over a directory of jsonl/csv files.
    * Schema comes from a one-off batch sample read (streams need explicit
    * schemas). */
  def readStream(spark: SparkSession, dir: String, format: String,
                 schema: Option[StructType] = None): DataFrame = {
    val sch = schema.getOrElse {
      format match {
        case "jsonl"       => spark.read.json(dir).schema
        case "csv" | "tsv" => spark.read.option("header", true)
          .option("sep", if (format == "tsv") "\t" else ",")
          .option("inferSchema", true).csv(dir).schema
      }
    }
    format match {
      case "jsonl" => spark.readStream.schema(sch).json(dir)
      case "csv" | "tsv" => spark.readStream.schema(sch)
        .option("header", true)
        .option("sep", if (format == "tsv") "\t" else ",").csv(dir)
    }
  }

  /** Apply a DFL pipeline to a streaming DataFrame (same compile path as
    * batch — DflFrame.pipeline). */
  def transform(stream: DataFrame, dflSrc: String,
                vars: Map[String, Any] = Map.empty): DataFrame =
    DflFrame.pipeline(stream, dflSrc, vars)

  /** Run the stream to completion over currently-available data and
    * return the collected output (test/CLI helper; long-running jobs use
    * writeStream directly). */
  def runOnce(spark: SparkSession, dir: String, format: String,
              dflSrc: String, vars: Map[String, Any] = Map.empty): DataFrame = {
    validateStreamable(format, dflSrc)
    val out = transform(readStream(spark, dir, format), dflSrc, vars)
    val name = s"graft_stream_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }
}
