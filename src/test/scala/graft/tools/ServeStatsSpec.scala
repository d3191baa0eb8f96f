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

  test("suggest: chronic widening recommends the p95 reached width as the new start") {
    // 4 calls from start width 8: three widened (reached 16, 32, 64),
    // one served in-round — 75% widened, p95(reached)=64
    def leg(reached: Int, rounds: Int) =
      ServeStats.LegRow("ivfpq_filtered", 10L, 8, reached, rounds)
    val serve = Seq(
      ServeStats.ServeRow(0, 10, 10, 0, 100,
        Seq(leg(16, 1), leg(32, 2))),
      ServeStats.ServeRow(1, 10, 10, 0, 100,
        Seq(leg(64, 3), leg(8, 0))))
    val tips = ServeStats.suggest(serve, Nil)
    assert(tips.size == 1, tips.toString)
    assert(tips.head.contains("ivfpq_filtered") &&
      tips.head.contains("raise the start width") &&
      tips.head.contains("to 64"), tips.head)
    // a healthy op (no widening) gets no advice
    val healthy = Seq(ServeStats.ServeRow(0, 10, 10, 0, 50,
      Seq(ServeStats.LegRow("ivf", 10L, 8, 8, 0))))
    assert(ServeStats.suggest(healthy, Nil).isEmpty)
  }

  test("suggest: high-and-rising skew and a skipped-share breach each surface once") {
    def m(b: Long, skew: Option[Double]) =
      ServeStats.MaintRow(b, 10L, slotOpened = true, skew, "none", 0L)
    val rising = Seq(m(0, Some(1.2)), m(1, Some(1.6)), m(2, Some(1.9)))
    val skewTips = ServeStats.suggest(Nil, rising)
    assert(skewTips.size == 1 && skewTips.head.contains("skew") &&
      skewTips.head.contains("1.90"), skewTips.toString)
    // falling skew, even if high once, stays quiet
    assert(ServeStats.suggest(Nil,
      Seq(m(0, Some(1.9)), m(1, Some(1.2)))).isEmpty)
    // low skew stays quiet however it trends
    assert(ServeStats.suggest(Nil,
      Seq(m(0, Some(1.01)), m(1, Some(1.05)))).isEmpty)
    // skipped share > 5% points at the query stream
    val skippy = Seq(ServeStats.ServeRow(0, 100, 90, 10, 50, Nil))
    val st = ServeStats.suggest(skippy, Nil)
    assert(st.size == 1 && st.head.contains("skipped as malformed"), st.toString)
  }

  test("ingest sidecars carry tombstones_cleared; pre-delete-era sidecars read as zero") {
    val root = Files.createTempDirectory("graft-ssuggest").toString
    val md = new java.io.File(s"$root/maintenance"); md.mkdirs()
    Files.writeString(java.nio.file.Paths.get(s"$root/maintenance/batch-0.json"),
      """{"batch_id":0,"append_ms":5,"slot_opened":true,"skew":null,""" +
        """"action":"compact","action_ms":9,"tombstones_cleared":7}""")
    // an old-format sidecar without the field must still parse
    Files.writeString(java.nio.file.Paths.get(s"$root/maintenance/batch-1.json"),
      """{"batch_id":1,"append_ms":4,"slot_opened":false,"skew":null,""" +
        """"action":"none","action_ms":0}""")
    val rows = ServeStats.readMaintenance(root)
    assert(rows.size == 2)
    assert(rows.head.tombstonesCleared == 7L)
    assert(rows(1).tombstonesCleared == 0L)
  }
}
