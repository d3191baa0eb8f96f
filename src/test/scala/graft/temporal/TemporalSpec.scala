package graft.temporal

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class TemporalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val events = {
    val ev = spark.read.parquet(s"$sf/events.parquet")
    ev.withColumn("ts_us", ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case _ => expr("unix_micros(cast(ts as timestamp))")
    })
  }

  // ---- asofJoin ----

  test("asofJoin picks the latest right row at or before each left ts") {
    val left = Seq((1L, 10L, 100L), (1L, 25L, 101L), (2L, 5L, 102L))
      .toDF("k", "ts", "lid")
    val right = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"),
      (2L, 7L, "d")).toDF("k", "ts", "tag")
    val out = Temporal.asofJoin(left, right, Seq("k"), "ts", "ts")
      .select("lid", "asof_ts_us", "asof_tag")
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.getString(2)))).toSet
    assert(out == Set(
      (100L, Some(10L), Some("a")),   // exact-ts match is visible
      (101L, Some(20L), Some("b")),   // latest <= 25
      (102L, None, None)))            // right ts 7 > left ts 5 → no match
  }

  test("asofJoin equal-ts right duplicates resolve by payload order, " +
      "deterministically at any parallelism") {
    val left = Seq((1L, 10L, 900L)).toDF("k", "ts", "lid")
    val right = Seq((1L, 10L, 1L), (1L, 10L, 3L), (1L, 10L, 2L))
      .toDF("k", "ts", "rid")
    for (parts <- Seq(1, 7)) {
      val out = Temporal.asofJoin(left.repartition(parts),
        right.repartition(parts), Seq("k"), "ts", "ts")
      assert(out.select("asof_rid").head().getLong(0) == 3L)
    }
  }

  test("asofJoin tolerance voids matches older than the window") {
    val left = Seq((1L, 100L, 1L), (1L, 200L, 2L)).toDF("k", "ts", "lid")
    val right = Seq((1L, 95L, 7.0)).toDF("k", "ts", "v")
    val out = Temporal.asofJoin(left, right, Seq("k"), "ts", "ts",
        toleranceUs = Some(50L))
      .select("lid", "asof_v").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).contains(7.0))  // 100-95 = 5 <= 50
    assert(out(2L).isEmpty)        // 200-95 = 105 > 50 → voided
  }

  test("asofJoin on the events corpus matches a per-key reference scan") {
    val clicks = events.filter($"event_type" === "click")
      .select("event_id", "user_id", "ts_us")
    val purchases = events.filter($"event_type" === "purchase")
      .select("user_id", "ts_us", "event_id", "value")
    val got = Temporal.asofJoin(clicks, purchases, Seq("user_id"),
        "ts_us", "ts_us")
      .select("event_id", "asof_event_id").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    // reference: brute-force max-by-(ts, id) scan per click, driver-side
    val ps = purchases.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) // (user, ts, id)
      .groupBy(_._1)
    val want = clicks.collect().map { c =>
      val (id, u, ts) = (c.getLong(0), c.getLong(1), c.getLong(2))
      id -> ps.getOrElse(u, Array.empty).filter(_._2 <= ts)
        .sortBy(p => (p._2, p._3)).lastOption.map(_._3)
    }.toMap
    assert(got == want)
  }

  test("asofJoinForward picks the earliest right row at or after each left ts") {
    val left = Seq((1L, 10L, 100L), (1L, 25L, 101L), (2L, 50L, 102L))
      .toDF("k", "ts", "lid")
    val right = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"),
      (2L, 7L, "d")).toDF("k", "ts", "tag")
    val out = Temporal.asofJoinForward(left, right, Seq("k"), "ts", "ts")
      .select("lid", "asof_ts_us", "asof_tag").collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.getString(2)))).toSet
    assert(out == Set(
      (100L, Some(10L), Some("a")),   // exact-ts match is visible
      (101L, Some(30L), Some("c")),   // earliest >= 25
      (102L, None, None)))            // right ts 7 < left ts 50 → no match
    // tolerance: a match further than the window is voided
    val tol = Temporal.asofJoinForward(left, right, Seq("k"), "ts", "ts",
        toleranceUs = Some(3L))
      .select("lid", "asof_tag").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(tol(100L).contains("a")) // distance 0 <= 3
    assert(tol(101L).isEmpty)       // distance 5 > 3
  }

  test("asofJoinNearest picks min |Δts|, ties prefer backward, tolerance bounds both sides") {
    val left = Seq(
      (1L, 10L, 100L),   // backward at 8 (d=2) beats forward at 14 (d=4)
      (1L, 12L, 101L),   // forward at 14 (d=2) beats backward at 8 (d=4)
      (2L, 50L, 102L),   // forward-only key side
      (3L, 50L, 103L))   // no right rows at all
      .toDF("k", "ts", "lid")
    val right = Seq(
      (1L, 8L, "b8"), (1L, 14L, "f14"), (1L, 16L, "f16"),
      (2L, 60L, "f60")).toDF("k", "ts", "tag")
    val out = Temporal.asofJoinNearest(left, right, Seq("k"), "ts", "ts")
      .select("lid", "asof_ts_us", "asof_tag")
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]), Option(r.getString(2)))).toSet
    assert(out == Set(
      (100L, Some(8L), Some("b8")),    // 2 back beats 4 forward
      (101L, Some(14L), Some("f14")),  // 2 forward beats 4 back
      (102L, Some(60L), Some("f60")),  // backward empty → forward
      (103L, None, None)))
    // exact distance tie prefers the backward match
    val tieL = Seq((1L, 10L, 1L)).toDF("k", "ts", "lid")
    val tieR = Seq((1L, 7L, "back"), (1L, 13L, "fwd")).toDF("k", "ts", "tag")
    assert(Temporal.asofJoinNearest(tieL, tieR, Seq("k"), "ts", "ts")
      .select("asof_tag").head().getString(0) == "back")
    // tolerance voids BOTH directions past the bound
    val tol = Temporal.asofJoinNearest(tieL, tieR, Seq("k"), "ts", "ts",
      toleranceUs = Some(2L))
    assert(tol.select("asof_tag").head().get(0) == null)
    // and through the DFL dispatch
    val dfl = graft.dfl.DflFrame.pipeline(tieL,
      "asof(@, $r, '@k', '@ts', -1, 'nearest')", Map("r" -> tieR))
    assert(dfl.select("asof_tag").head().getString(0) == "back")
  }

  test("asofJoin NULL handling: null-ts left rows never match; null keys group together") {
    val left = Seq((Some(1L), Some(10L), 100L), (Some(1L), None, 101L),
      (None, Some(10L), 102L)).toDF("k", "ts", "lid")
    val right = Seq((Some(1L), Some(5L), "a"), (None, Some(5L), "n"))
      .toDF("k", "ts", "tag")
    val out = Temporal.asofJoin(left, right, Seq("k"), "ts", "ts")
      .select("lid", "asof_tag").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(100L).contains("a"))
    // a NULL-ts probe sorts before every right row: no match, by design
    assert(out(101L).isEmpty)
    // NULL keys form their own group (Spark window partition semantics)
    assert(out(102L).contains("n"))
  }

  // ---- sessionIds / sessionStats ----

  test("sessionIds breaks sessions on gaps strictly greater than gapUs") {
    val df = Seq((1L, 0L), (1L, 10L), (1L, 20L), (1L, 31L), (1L, 41L),
      (2L, 5L)).toDF("k", "ts")
    val out = Temporal.sessionIds(df, "k", "ts", gapUs = 10L)
      .select("k", "ts", "session_start_us").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // 20→31 is a gap of 11 > 10 → new session; 31→41 is exactly 10 → same
    assert(out == Map((1L, 0L) -> 0L, (1L, 10L) -> 0L, (1L, 20L) -> 0L,
      (1L, 31L) -> 31L, (1L, 41L) -> 31L, (2L, 5L) -> 5L))
  }

  test("sessionStats aggregates per (key, session) and is partition-stable") {
    val df = Seq((1L, 0L, 1.0), (1L, 5L, 2.0), (1L, 100L, 4.0))
      .toDF("k", "ts", "v")
    for (parts <- Seq(1, 5)) {
      val out = Temporal.sessionStats(df.repartition(parts), "k", "ts",
          gapUs = 10L, valueCol = "v")
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4))).toSet
      assert(out == Set((0L, 5L, 2L, 3.0), (100L, 100L, 1L, 4.0)))
    }
  }

  test("sessions partition the input: event count is conserved") {
    val n = events.count()
    val sessions = Temporal.sessionStats(
      events.select("user_id", "ts_us", "value"),
      "user_id", "ts_us", gapUs = 7200000000L, valueCol = "value")
    assert(sessions.agg(sum("n_events")).head().getLong(0) == n)
    // session bounds are sane and non-overlapping per user
    val rows = sessions.select("user_id", "session_start_us", "session_end_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.forall { case (_, s, e) => s <= e })
    rows.groupBy(_._1).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, _, e1), (_, s2, _)) => assert(e1 < s2)
        case _ =>
      }
    }
  }

  // ---- range join ----

  private lazy val bands = Seq((0L, 0.0, 50.0), (1L, 50.0, 150.0),
    (2L, 100.0, 300.0)).toDF("band_id", "lo", "hi")

  test("bucketized range join handles negative interval bounds") {
    val fact = Seq((1L, -30.0), (2L, -5.0), (3L, 10.0)).toDF("id", "v")
    val negBands = Seq((0L, -50.0, -10.0), (1L, -10.0, 20.0))
      .toDF("band_id", "lo", "hi")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "band_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bc = key(Temporal.rangeJoinBroadcast(fact, "v", negBands, "lo", "hi"))
    assert(bc == Set((1L, 0L), (2L, 1L), (3L, 1L)))
    // floor-based bucketing is correct for negatives (floor, not truncate)
    assert(key(Temporal.rangeJoinBucketed(fact, "v", negBands, "lo", "hi",
      bucketWidth = 7.0)) == bc)
  }

  test("rangeJoinBroadcast: inclusive bounds, multi-match, left-outer") {
    val fact = Seq((1L, 50.0), (2L, 120.0), (3L, 400.0)).toDF("id", "v")
    val out = Temporal.rangeJoinBroadcast(fact, "v", bands, "lo", "hi")
      .select("id", "band_id").collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toSeq
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(out(1L) == Set(Some(0L), Some(1L))) // boundary hits both bands
    assert(out(2L) == Set(Some(1L), Some(2L))) // overlap region
    assert(out(3L) == Set(None))               // outside every band
  }

  test("bucketized range join matches the broadcast path on events") {
    val fact = events.select("event_id", "value")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "band_id").collect()
        .map(r => (r.getLong(0), Option(r.get(1)))).toSeq.sorted(
          Ordering.by((t: (Long, Option[Any])) => (t._1, t._2.map(_.toString))))
    val bc = key(Temporal.rangeJoinBroadcast(fact, "value", bands, "lo", "hi"))
    // width near the typical span AND a deliberately poor width both agree
    for (w <- Seq(50.0, 7.0)) {
      val bk = key(Temporal.rangeJoinBucketed(fact, "value", bands,
        "lo", "hi", bucketWidth = w))
      assert(bk == bc)
    }
  }

  // ---- budgetCap (lives in llm.Sampling but is part of this tranche) ----

  test("budgetCap keeps a prefix of the hash order within budget, per domain") {
    val df = Seq((1L, "a", 600L), (2L, "a", 600L), (3L, "a", 600L),
      (4L, "a", 600L), (5L, "b", 5000L), (6L, "b", 100L))
      .toDF("id", "dom", "w")
    val out = graft.llm.Sampling.budgetCap(df, "id", "dom", "w",
        budget = 1500L, seed = 0L)
      .select("id").as[Long].collect().toSet
    // domain a: exactly 2 of the 4 600-weight rows fit (hash-order prefix);
    // domain b: the 5000 row busts the budget wherever it lands
    assert(out.count(Set(1L, 2L, 3L, 4L)) == 2)
    assert(!out.contains(5L))
    val capped = graft.llm.Sampling.budgetCap(df, "id", "dom", "w",
      budget = 0L, seed = 0L)
    assert(capped.count() == 0)
  }

  test("budgetCap kept set is stable when other rows arrive later in hash order") {
    val base = Seq((1L, "a", 10L), (2L, "a", 10L), (3L, "a", 10L))
      .toDF("id", "dom", "w")
    val kept1 = graft.llm.Sampling.budgetCap(base, "id", "dom", "w", 20L, 3L)
      .select("id").as[Long].collect().toSet
    // growing the corpus can push tail rows OUT but never reorders the
    // kept prefix: every id kept after growth that was present before
    // must have been kept before
    val grown = base.union(Seq((4L, "a", 10L), (5L, "a", 10L))
      .toDF("id", "dom", "w"))
    val kept2 = graft.llm.Sampling.budgetCap(grown, "id", "dom", "w", 20L, 3L)
      .select("id").as[Long].collect().toSet
    assert(kept2.filter(_ <= 3L).subsetOf(kept1))
    assert(kept1.size == 2 && kept2.size == 2)
  }
}
