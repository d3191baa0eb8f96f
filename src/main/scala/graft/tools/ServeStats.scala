package graft.tools

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.{FileSystem, Path}

/** Aggregate the serving/ingest telemetry sidecars into the table an
  * operator tunes probe knobs from.
  *
  * The serving jobs land `batch-N/_metrics.json` next to each answer
  * batch (queries seen/served/skipped, wall ms, per-probe legs with
  * width start/reached and widening rounds) and the ingest jobs land
  * `checkpoint/maintenance/batch-N.json` (append ms, slot opened, skew,
  * maintenance action + cost) — but nothing read them back. This tool
  * does: per-batch rows plus a rollup, printed as a table and optionally
  * written as jsonl, so a production operator can see directly whether
  * `nprobe`/`minCandidates` start-widths are chronically widening (raise
  * the knob), how much wall time the widening rounds cost, what share of
  * queries are skipped as malformed, and whether append skew is trending
  * toward the retrain threshold.
  *
  * Usage: runMain graft.tools.ServeStats --answers DIR [--checkpoint DIR]
  *          [--out FILE.jsonl]
  *
  * Pure filesystem + JSON reading (Hadoop FS, so shared-filesystem URIs
  * work) — no Spark session, safe to run against a LIVE serving job's
  * output (the sidecars are written after each batch's answers, and a
  * half-written sidecar is skipped with a warning, never a crash).
  */
object ServeStats {

  final case class LegRow(op: String, queries: Long, widthStart: Int,
                          widthReached: Int, widenedRounds: Int)
  final case class ServeRow(batchId: Long, seen: Long, served: Long,
                            skipped: Long, wallMs: Long, legs: Seq[LegRow])
  final case class MaintRow(batchId: Long, appendMs: Long,
                            slotOpened: Boolean, skew: Option[Double],
                            action: String, actionMs: Long,
                            tombstonesCleared: Long = 0L)

  private val mapper = new ObjectMapper()

  private def fs(dir: String): FileSystem =
    new Path(dir).getFileSystem(new org.apache.hadoop.conf.Configuration())

  private def readJson(f: FileSystem, p: Path): Option[JsonNode] =
    try {
      val in = f.open(p)
      try Some(mapper.readTree(in))
      finally in.close()
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[servestats] skipping unreadable $p: " +
          s"${e.getMessage}")
        None
    }

  /** Parse one sidecar node into a row, skipping (with a warning) nodes
    * that parse as JSON but lack the expected fields — schema drift from
    * an older/newer job, or a valid-JSON prefix of a concurrent write.
    * The 'safe against a live job' contract covers BOTH failure shapes,
    * not just unparseable bytes. */
  private def safeRow[A](p: Path)(parse: => A): Option[A] =
    try Some(parse)
    catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[servestats] skipping malformed $p: $e")
        None
    }

  /** Every `batch-N/_metrics.json` under an answers dir, batch-ordered. */
  def readServe(answersDir: String): Seq[ServeRow] = {
    val f = fs(answersDir)
    val base = new Path(answersDir)
    if (!f.exists(base)) return Nil
    import scala.jdk.CollectionConverters._
    f.listStatus(base).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch-"))
      .flatMap { s =>
        val mp = new Path(s.getPath, "_metrics.json")
        if (!f.exists(mp)) Nil
        else readJson(f, mp).flatMap(n => safeRow(mp) {
          val legs = Option(n.get("legs")).toSeq
            .flatMap(_.elements().asScala.toSeq)
            .map(l => LegRow(l.get("op").asText,
              l.get("queries").asLong,
              l.get("width_start").asInt, l.get("width_reached").asInt,
              l.get("widened_rounds").asInt))
          ServeRow(n.get("batch_id").asLong, n.get("queries_seen").asLong,
            n.get("queries_served").asLong, n.get("queries_skipped").asLong,
            n.get("wall_ms").asLong, legs)
        }).toSeq
      }
      .sortBy(_.batchId)
  }

  /** Every `maintenance/batch-N.json` under an ingest checkpoint,
    * batch-ordered. */
  def readMaintenance(checkpointDir: String): Seq[MaintRow] = {
    val f = fs(checkpointDir)
    val base = new Path(checkpointDir, "maintenance")
    if (!f.exists(base)) return Nil
    f.listStatus(base).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("batch-") &&
        s.getPath.getName.endsWith(".json"))
      .flatMap(s => readJson(f, s.getPath).flatMap(n => safeRow(s.getPath) {
        MaintRow(n.get("batch_id").asLong, n.get("append_ms").asLong,
          n.get("slot_opened").asBoolean,
          Option(n.get("skew")).filter(!_.isNull).map(_.asDouble),
          n.get("action").asText, n.get("action_ms").asLong,
          // absent in pre-delete-era sidecars — schema-drift-safe zero
          Option(n.get("tombstones_cleared")).map(_.asLong).getOrElse(0L))
      }).toSeq)
      .sortBy(_.batchId)
  }

  /** Per-op rollup across batches: calls, queries, the knob evidence
    * (start width, worst reached width, share of calls that widened). */
  final case class OpRollup(op: String, calls: Long, queries: Long,
                            widthStart: Int, maxWidthReached: Int,
                            widenedCalls: Long, widenedRounds: Long)

  def rollupOps(rows: Seq[ServeRow]): Seq[OpRollup] =
    rows.flatMap(_.legs).groupBy(_.op).map { case (op, legs) =>
      OpRollup(op, legs.size.toLong, legs.map(_.queries).sum,
        legs.map(_.widthStart).min, legs.map(_.widthReached).max,
        legs.count(_.widenedRounds > 0).toLong,
        legs.map(_.widenedRounds.toLong).sum)
    }.toSeq.sortBy(_.op)

  /** Nearest-rank percentile: the ceil(q·n)-th order statistic —
    * `(q*n).toInt` would overshoot by one (p50 of [10, 5000] must be
    * 10, not the max). */
  private def pct(sorted: Seq[Long], q: Double): Long =
    if (sorted.isEmpty) 0L
    else sorted(math.min(sorted.size - 1,
      math.max(0, math.ceil(q * sorted.size).toInt - 1)))

  /** Turn the rollup into KNOB ADVICE (`--suggest`): the table already
    * showed chronic widening and skew trend but left the arithmetic to
    * the operator — this does it. Pure over parsed rows so the spec
    * drives it with planted sidecars. Emits:
    *
    *  - per op, when more than [[widenShareThreshold]] of its calls
    *    widened: raise the start width to the P95 of the widths those
    *    calls actually REACHED — the smallest start that would have
    *    satisfied 95% of observed probes in one round
    *  - when the maintenance skew is both high (max ≥ 1.5, i.e. the
    *    hottest list holds 1.5× its fair share) and RISING across the
    *    observed batches: surface the trend against the retrain trigger
    *    (the threshold itself is a job arg the sidecars don't carry, so
    *    the advice names the observed trajectory, not a breach)
    *  - when the skipped share of served queries exceeds 5%: point at
    *    the malformed-query stream (a knob change can't fix that one)
    */
  private val widenShareThreshold = 0.25
  def suggest(serve: Seq[ServeRow], maint: Seq[MaintRow]): Seq[String] = {
    val out = Seq.newBuilder[String]
    rollupOps(serve).foreach { o =>
      if (o.calls > 0 && o.widenedCalls.toDouble / o.calls > widenShareThreshold) {
        val reached = serve.flatMap(_.legs).filter(_.op == o.op)
          .map(_.widthReached.toLong).sorted
        val p95 = pct(reached, 0.95)
        if (p95 > o.widthStart)
          out += s"${o.op}: ${o.widenedCalls}/${o.calls} calls widened from " +
            s"start width ${o.widthStart} — raise the start width " +
            s"(nprobe/minCandidates) to $p95 (p95 of reached widths) to " +
            "serve ~95% of probes in one round"
      }
    }
    val seen = rows2(serve)
    if (seen._1 > 0 && seen._2.toDouble / seen._1 > 0.05)
      out += f"${seen._2} of ${seen._1} queries (${100.0 * seen._2 / seen._1}%.1f%%) " +
        "were skipped as malformed — fix the query stream; no probe knob " +
        "recovers skipped queries"
    val skews = maint.flatMap(_.skew)
    if (skews.size >= 2 && skews.max >= 1.5 && skews.last > skews.head)
      out += f"append skew is high and rising (${skews.head}%.2f -> " +
        f"${skews.last}%.2f, max ${skews.max}%.2f) — the hottest list " +
        "holds that multiple of its fair share; if no retrain fired yet, " +
        "lower --retrain-skew toward the observed max or schedule a retrain"
    out.result()
  }

  /** (queries seen, queries skipped) totals — tiny helper for suggest. */
  private def rows2(serve: Seq[ServeRow]): (Long, Long) =
    (serve.map(_.seen).sum, serve.map(_.skipped).sum)

  def main(args: Array[String]): Unit = {
    var answers: Option[String] = None
    var checkpoint: Option[String] = None
    var out: Option[String] = None
    var doSuggest = false
    val it = args.iterator
    while (it.hasNext) it.next() match {
      case "--answers"    => answers = Some(it.next())
      case "--checkpoint" => checkpoint = Some(it.next())
      case "--out"        => out = Some(it.next())
      case "--suggest"    => doSuggest = true
      case other => sys.error(s"servestats: unknown arg $other — usage: " +
        "--answers DIR [--checkpoint DIR] [--out FILE.jsonl] [--suggest]")
    }
    require(answers.isDefined || checkpoint.isDefined,
      "servestats: pass --answers (serving sidecars) and/or " +
        "--checkpoint (ingest maintenance sidecars)")

    val jsonl = Seq.newBuilder[String]
    // parse each sidecar family ONCE — the tables and --suggest share
    // the rows (a second directory walk would double remote-FS I/O and
    // duplicate every half-written-sidecar warning)
    val serveRows = answers.map(readServe).getOrElse(Nil)
    val maintRows = checkpoint.map(readMaintenance).getOrElse(Nil)
    answers.foreach { dir =>
      val rows = serveRows
      println(s"== serving batches ($dir): ${rows.size} ==")
      println(f"${"batch"}%8s ${"seen"}%6s ${"served"}%6s ${"skip"}%5s " +
        f"${"wall_ms"}%8s  legs")
      rows.foreach { r =>
        val legs = r.legs.map(l => s"${l.op}(q=${l.queries}," +
          s"w=${l.widthStart}->${l.widthReached}" +
          (if (l.widenedRounds > 0) s",+${l.widenedRounds}r" else "") + ")")
          .mkString(" ")
        println(f"${r.batchId}%8d ${r.seen}%6d ${r.served}%6d " +
          f"${r.skipped}%5d ${r.wallMs}%8d  $legs")
        jsonl += mapper.writeValueAsString(mapper.createObjectNode()
          .put("kind", "serve_batch").put("batch_id", r.batchId)
          .put("queries_seen", r.seen).put("queries_served", r.served)
          .put("queries_skipped", r.skipped).put("wall_ms", r.wallMs)
          .set[JsonNode]("legs", mapper.valueToTree(r.legs.map(l =>
            mapper.createObjectNode().put("op", l.op)
              .put("queries", l.queries).put("width_start", l.widthStart)
              .put("width_reached", l.widthReached)
              .put("widened_rounds", l.widenedRounds)).toArray)))
      }
      if (rows.nonEmpty) {
        val walls = rows.map(_.wallMs).sorted
        println(f"rollup: served=${rows.map(_.served).sum} " +
          f"skipped=${rows.map(_.skipped).sum} " +
          f"wall_ms p50=${pct(walls, 0.5)} p95=${pct(walls, 0.95)} " +
          f"max=${walls.last}")
        val ops = rollupOps(rows)
        ops.foreach { o =>
          println(f"  ${o.op}%-22s calls=${o.calls}%-5d queries=${o.queries}%-7d " +
            f"width=${o.widthStart}->${o.maxWidthReached}%-4d " +
            f"widened=${o.widenedCalls}/${o.calls} (+${o.widenedRounds} rounds)")
          jsonl += mapper.writeValueAsString(mapper.createObjectNode()
            .put("kind", "op_rollup").put("op", o.op).put("calls", o.calls)
            .put("queries", o.queries).put("width_start", o.widthStart)
            .put("max_width_reached", o.maxWidthReached)
            .put("widened_calls", o.widenedCalls)
            .put("widened_rounds", o.widenedRounds))
        }
        jsonl += mapper.writeValueAsString(mapper.createObjectNode()
          .put("kind", "serve_rollup").put("batches", rows.size)
          .put("queries_served", rows.map(_.served).sum)
          .put("queries_skipped", rows.map(_.skipped).sum)
          .put("wall_ms_p50", pct(walls, 0.5))
          .put("wall_ms_p95", pct(walls, 0.95))
          .put("wall_ms_max", walls.last))
      }
    }
    checkpoint.foreach { dir =>
      val rows = maintRows
      println(s"== ingest maintenance ($dir): ${rows.size} batches ==")
      println(f"${"batch"}%8s ${"append_ms"}%10s ${"slot"}%5s ${"skew"}%8s " +
        f"${"action"}%-8s ${"action_ms"}%10s ${"tombs"}%6s")
      rows.foreach { r =>
        println(f"${r.batchId}%8d ${r.appendMs}%10d " +
          f"${if (r.slotOpened) "open" else "-"}%5s " +
          f"${r.skew.map(s => f"$s%.2f").getOrElse("-")}%8s " +
          f"${r.action}%-8s ${r.actionMs}%10d ${r.tombstonesCleared}%6d")
        val node = mapper.createObjectNode()
          .put("kind", "ingest_batch").put("batch_id", r.batchId)
          .put("append_ms", r.appendMs).put("slot_opened", r.slotOpened)
          .put("action", r.action).put("action_ms", r.actionMs)
          .put("tombstones_cleared", r.tombstonesCleared)
        r.skew.fold[Unit](node.putNull("skew"))(s => { node.put("skew", s); () })
        jsonl += mapper.writeValueAsString(node)
      }
      if (rows.nonEmpty) {
        val byAction = rows.groupBy(_.action).view.mapValues(_.size).toMap
        // floating-point mean — Long division truncated sub-ms detail in
        // both the table and the jsonl rollup
        val appendMsMean = rows.map(_.appendMs).sum.toDouble / rows.size
        println(s"rollup: appends=${rows.size} " +
          f"append_ms_mean=$appendMsMean%.1f " +
          f"max_skew=${rows.flatMap(_.skew).maxOption.map(s => f"$s%.2f").getOrElse("-")} " +
          s"actions=${byAction.toSeq.sortBy(_._1).map { case (a, n) => s"$a:$n" }.mkString(",")}")
        val node = mapper.createObjectNode()
          .put("kind", "ingest_rollup").put("batches", rows.size)
          .put("append_ms_mean", appendMsMean)
          .put("tombstones_cleared", rows.map(_.tombstonesCleared).sum)
        rows.flatMap(_.skew).maxOption
          .fold[Unit](node.putNull("max_skew"))(s => { node.put("max_skew", s); () })
        byAction.toSeq.sortBy(_._1).foreach { case (a, n) =>
          node.put(s"action_$a", n); ()
        }
        jsonl += mapper.writeValueAsString(node)
      }
    }
    if (doSuggest) {
      val tips = suggest(serveRows, maintRows)
      println(s"== suggestions: ${tips.size} ==")
      tips.foreach { t =>
        println(s"  * $t")
        jsonl += mapper.writeValueAsString(mapper.createObjectNode()
          .put("kind", "suggestion").put("text", t))
      }
      if (tips.isEmpty)
        println("  (none — no chronic widening, high skipped share, " +
          "or rising skew in the observed batches)")
    }
    out.foreach { path =>
      val p = new Path(path)
      val f = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
      val o = f.create(p, true)
      try o.write((jsonl.result().mkString("\n") + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally o.close()
      println(s"[servestats] wrote ${jsonl.result().size} jsonl rows to $path")
    }
  }
}
