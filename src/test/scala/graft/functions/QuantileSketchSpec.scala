package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.util.Sketches

class QuantileSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Exact ceil(q·n)-th order statistic — the sketch's target rule. */
  private def exactQ(xs: Seq[Double], q: Double): Double = {
    val s = xs.sorted
    s(math.max(1, math.ceil(q * s.length).toInt).min(s.length) - 1)
  }

  test("uncompacted regime is exact: quantiles are the ceil(q·n)-th order statistic") {
    val rnd = new scala.util.Random(42)
    val xs = Seq.fill(300)(rnd.nextDouble() * 1000)
    val sk = new QSketch(512)
    xs.foreach(sk.update)
    assert(sk.n == 300)
    for (q <- Seq(0.0, 0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0))
      assert(sk.quantile(q) == exactQ(xs, q), s"q=$q")
  }

  test("compaction preserves total weight exactly; rank error bounded at 50k rows") {
    val rnd = new scala.util.Random(7)
    val xs = Array.fill(50000)(rnd.nextDouble())
    val sk = new QSketch(512)
    xs.foreach(sk.update)
    assert(sk.n == 50000L) // exact through every cascade
    // retained items bounded by k per level
    assert(sk.levels.forall(_.length < 512))
    val sorted = xs.sorted
    for (q <- Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val est = sk.quantile(q)
      val rank = sorted.count(_ <= est).toDouble / xs.length
      assert(math.abs(rank - q) <= 0.02, s"q=$q rank=$rank")
    }
  }

  test("merge preserves weight and error; k mismatch throws") {
    val rnd = new scala.util.Random(11)
    val a = new QSketch(256); val b = new QSketch(256)
    val xsA = Array.fill(20000)(rnd.nextGaussian())
    val xsB = Array.fill(30000)(rnd.nextGaussian() + 0.5)
    xsA.foreach(a.update); xsB.foreach(b.update)
    a.mergeWith(b)
    assert(a.n == 50000L)
    val all = (xsA ++ xsB).sorted
    for (q <- Seq(0.25, 0.5, 0.9)) {
      val rank = all.count(_ <= a.quantile(q)).toDouble / all.length
      assert(math.abs(rank - q) <= 0.03, s"q=$q rank=$rank")
    }
    val c = new QSketch(128)
    intercept[IllegalArgumentException] { a.mergeWith(c) }
  }

  test("serialization round-trips the sketch bit-for-bit") {
    val sk = new QSketch(64)
    (1 to 1000).foreach(i => sk.update(i.toDouble))
    val back = QSketchOps.deserialize(sk.serialized)
    assert(back.n == sk.n)
    assert(back.levels.map(_.toSeq) == sk.levels.toSeq.map(_.toSeq))
    for (q <- Seq(0.1, 0.5, 0.9))
      assert(back.quantile(q) == sk.quantile(q))
  }

  test("nulls and NaNs are skipped; empty sketch answers NULL") {
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 3.0), (2L, null), (3L, Double.NaN), (4L, 1.0), (5L, 2.0))
      .toDF("id", "x")
    val sk = df.agg(QSketchF.quantileSketch(col("x"), 64).as("s"))
      .select(Sketches.qsCount(col("s")),
        Sketches.qsQuantile(col("s"), 0.5)).head()
    assert(sk.getLong(0) == 3L)
    assert(sk.getDouble(1) == 2.0)
    val empty = df.filter(col("id") < 0)
      .agg(QSketchF.quantileSketch(col("x"), 64).as("s"))
      .select(Sketches.qsQuantile(col("s"), 0.5)).head()
    assert(empty.isNullAt(0))
  }

  test("sketch TABLE: build per group in one pass, roll up without raw data, exact in-regime") {
    val rnd = new scala.util.Random(3)
    val rows = (1 to 900).map(i => (s"g${i % 3}", rnd.nextDouble() * 100))
    val df = rows.toDF("g", "x").repartition(7) // partition-order robust
    val per = Sketches.qsBuild(df, "g", "x", k = 4096)
    val got = per.select(col("g"),
        Sketches.qsQuantile(col("sketch"), 0.5).as("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = rows.groupBy(_._1).map { case (g, vs) =>
      g -> exactQ(vs.map(_._2), 0.5) }
    assert(got == want)
    val rolled = Sketches.qsRollup(per, lit("all"))
      .select(Sketches.qsQuantile(col("sketch"), 0.5),
        Sketches.qsCount(col("sketch"))).head()
    assert(rolled.getDouble(0) == exactQ(rows.map(_._2), 0.5))
    assert(rolled.getLong(1) == 900L)
  }

  test("property: quantile is monotone in q and always a retained data value") {
    val rnd = new scala.util.Random(21)
    for (trial <- 1 to 10) {
      val n = 1000 + rnd.nextInt(20000)
      val xs = Array.fill(n)(rnd.nextGaussian() * rnd.nextInt(100))
      val sk = new QSketch(64 + rnd.nextInt(512))
      xs.foreach(sk.update)
      val values = xs.toSet
      val qs = Seq(0.0, 0.05, 0.2, 0.5, 0.8, 0.95, 1.0)
      val ests = qs.map(sk.quantile)
      ests.zip(ests.tail).foreach { case (a, b) =>
        assert(a <= b, s"trial $trial: not monotone: $ests") }
      // a rank sketch can only ever answer with a value it actually saw
      ests.foreach(e => assert(values.contains(e), s"trial $trial: fabricated $e"))
    }
  }

  test("qsketch scalar expressions compile under CODEGEN_ONLY (no silent fallback)") {
    val factory = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(factory)
    try {
      spark.conf.set(factory, "CODEGEN_ONLY")
      val r = Seq(1.0, 2.0, 3.0).toDF("x")
        .agg(QSketchF.quantileSketch(col("x"), 64).as("s"))
        .select(Sketches.qsQuantile(col("s"), 0.5),
          Sketches.qsCount(col("s"))).head()
      assert(r.getDouble(0) == 2.0 && r.getLong(1) == 3L)
      // qsketchStats carries a double[] reference object into codegen —
      // regression guard for the "[D"-classname Janino failure
      val qs = Seq(0.25, 0.5, 0.9)
      val st = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
        .agg(QSketchF.quantileSketch(col("x"), 64).as("s"))
        .select((QSketchF.qsketchStats(col("s"), qs).as("st") +:
          qs.zipWithIndex.map { case (q, i) =>
            Sketches.qsQuantile(col("s"), q).as(s"q$i") }): _*)
        .select(col("st.n") +: col("st.q") +:
          qs.indices.map(i => col(s"q$i")): _*)
        .head()
      assert(st.getLong(0) == 4L)
      val fromStats = st.getSeq[Double](1)
      val fromScalars = (2 until 2 + qs.length).map(st.getDouble)
      assert(fromStats == fromScalars)
    } finally {
      prev.fold(spark.conf.unset(factory))(spark.conf.set(factory, _))
    }
  }
}
