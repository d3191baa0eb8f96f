package graft.tools

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** ServeStats reads back the serving/ingest telemetry sidecars the
  * streaming jobs write — the operator's tuning table. The serve rows
  * come from a REAL multi-batch serve-ann run (two --once launches over
  * one checkpoint → batch 0 and batch 1), so the spec pins the whole
  * loop: job writes sidecar → tool reads it → rollup says what the
  * probes did. */
class ServeStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("serve sidecars from a multi-batch run aggregate into per-op rollups; jsonl out; junk skipped") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val root = Files.createTempDirectory("graft-servestats").toString
    emb.write.parquet(s"$root/corpus")
    val qrows = emb.filter($"vec_id" < 3).orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toSeq).toSeq
    val qdir = s"$root/queries"; new java.io.File(qdir).mkdirs()
    def writeQueries(file: String, qs: Seq[(Long, Seq[Double])]): Unit =
      Files.writeString(java.nio.file.Paths.get(s"$qdir/$file"),
        qs.map { case (id, v) =>
          s"""{"qid":$id,"vec":[${v.mkString(",")}]}""" }.mkString("\n"))
    writeQueries("q1.jsonl", qrows.take(2))
    val cfg = graft.cli.ServeCli.parseArgs(Array(
      "--index-dir", s"$root/idx", "--method", "ivfpq", "--k", "5",
      "--refine", "4", "--keep-vectors",
      "--build-from", s"$root/corpus",
      "--queries-uri", qdir, "--output-uri", s"$root/answers",
      "--checkpoint", s"$root/ckpt", "--once"))
    graft.cli.ServeCli.run(spark, cfg)
    // second batch: a NEW query file under the same checkpoint
    writeQueries("q2.jsonl", qrows.drop(2))
    graft.cli.ServeCli.run(spark, cfg)
    val rows = ServeStats.readServe(s"$root/answers")
    assert(rows.map(_.batchId) == Seq(0L, 1L), rows.toString)
    assert(rows.map(_.served) == Seq(2L, 1L), rows.toString)
    assert(rows.forall(_.skipped == 0) && rows.forall(_.wallMs >= 0))
    // every batch probed through the refined leg, and the leg carries
    // the knob evidence (start width = the default nprobe 8)
    assert(rows.forall(_.legs.exists(_.op == "ivfpq_refined")), rows.toString)
    val ops = ServeStats.rollupOps(rows)
    val refined = ops.find(_.op == "ivfpq_refined").get
    assert(refined.calls == 2 && refined.queries == 3 &&
      refined.widthStart == 8, refined.toString)
    // a half-written sidecar is SKIPPED with a warning, never a crash —
    // the tool must be safe against a live serving job
    val junkDir = new java.io.File(s"$root/answers/batch-7")
    junkDir.mkdirs()
    Files.writeString(java.nio.file.Paths.get(
      s"$root/answers/batch-7/_metrics.json"), """{"batch_id":7,"quer""")
    // ...and so is VALID json that lacks the expected fields (schema
    // drift / a valid-JSON prefix of a concurrent write)
    val driftDir = new java.io.File(s"$root/answers/batch-8")
    driftDir.mkdirs()
    Files.writeString(java.nio.file.Paths.get(
      s"$root/answers/batch-8/_metrics.json"), """{"batch_id":8}""")
    assert(ServeStats.readServe(s"$root/answers").map(_.batchId) ==
      Seq(0L, 1L))
    // ingest maintenance rows: a null skew parses to None (the non-ivf
    // method shape), numbers come through
    val ck = s"$root/ickpt"; new java.io.File(s"$ck/maintenance").mkdirs()
    Files.writeString(java.nio.file.Paths.get(s"$ck/maintenance/batch-0.json"),
      """{"batch_id":0,"append_ms":120,"slot_opened":false,"skew":null,"action":"none","action_ms":0}""")
    Files.writeString(java.nio.file.Paths.get(s"$ck/maintenance/batch-1.json"),
      """{"batch_id":1,"append_ms":140,"slot_opened":true,"skew":4.4,"action":"retrain","action_ms":900}""")
    val maint = ServeStats.readMaintenance(ck)
    assert(maint.map(_.batchId) == Seq(0L, 1L))
    assert(maint.head.skew.isEmpty && maint(1).skew.contains(4.4))
    assert(maint(1).action == "retrain" && maint(1).actionMs == 900L)
    // the CLI drive end-to-end: table printed, jsonl written with one
    // row per batch + the rollups
    ServeStats.main(Array("--answers", s"$root/answers",
      "--checkpoint", ck, "--out", s"$root/stats.jsonl"))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val lines = Files.readAllLines(
      java.nio.file.Paths.get(s"$root/stats.jsonl"))
    import scala.jdk.CollectionConverters._
    val kinds = lines.asScala.map(l => mapper.readTree(l).get("kind").asText)
    assert(kinds.count(_ == "serve_batch") == 2, kinds.toString)
    assert(kinds.count(_ == "ingest_batch") == 2, kinds.toString)
    assert(kinds.contains("serve_rollup") && kinds.contains("op_rollup") &&
      kinds.contains("ingest_rollup"), kinds.toString)
    val rollup = lines.asScala.map(mapper.readTree)
      .find(_.get("kind").asText == "serve_rollup").get
    assert(rollup.get("queries_served").asLong == 3L, rollup.toString)
    // nearest-rank percentiles: with two batches the p50 is the LOWER
    // wall time (the ceil(q·n)-th order statistic, not an overshoot to
    // the max) and p95 the higher
    val walls = rows.map(_.wallMs).sorted
    assert(rollup.get("wall_ms_p50").asLong == walls.head, rollup.toString)
    assert(rollup.get("wall_ms_p95").asLong == walls.last, rollup.toString)
  }
}
