package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., PAMI'11 — the FAISS-standard
  * ANN memory shape): split each vector into `m` subvectors, k-means
  * each subspace to `k` codewords, store one byte per subvector. A
  * 64-dim float vector becomes `m` bytes — 32× smaller at m=8 — and
  * query scoring never decodes: ADC (asymmetric distance computation)
  * precomputes the query's dot product against every codeword
  * (an m×k table, driver-side, microseconds) and scores a row as `m`
  * table lookups.
  *
  * Everything is built from the existing primitives — no new
  * expression: encoding is per-subspace `argmin` over codeword
  * distances (`slice` + native [[graft.functions.VectorF.dot]] against
  * codeword literals, `array_min` over (dist, k) structs — all
  * codegen'd), and ADC scoring is a sum of `element_at` lookups into
  * the flattened table literal. Training mirrors the
  * [[Embeddings.pcaFit]] posture: deterministic bounded sample,
  * seeded driver k-means per subspace, so the codebook is reproducible
  * at any parallelism.
  *
  * Accuracy contract: ADC is an approximation (quantization error per
  * subspace); the spec pins recall vs exact top-k on natural queries
  * and exactness on planted duplicate cliques (identical vectors share
  * codes, so their ADC scores tie at the top by construction). */
object Pq {

  /** codebooks(m)(k) = the k-th codeword of subspace m (subDim doubles). */
  final case class PqModel(m: Int, k: Int, subDim: Int,
                           codebooks: Array[Array[Array[Double]]]) {
    def compression(bytesPerFloat: Int = 4): Double =
      (subDim.toLong * m * bytesPerFloat).toDouble / m
  }

  /** Train an (m × k) codebook on a deterministic bounded sample. */
  def pqTrain(df: DataFrame, idCol: String, vecCol: String,
              m: Int, k: Int, trainSample: Int = 4096): PqModel = {
    require(m > 0 && k > 1 && k <= 256, "pqTrain: need m > 0, 1 < k <= 256")
    val sample = df.select(col(idCol), col(vecCol))
      .orderBy(col(idCol)).limit(trainSample)
      .collect().map(_.getSeq[Any](1).map {
        case f: Float => f.toDouble; case d: Double => d
        case n: Number => n.doubleValue()
      }.toArray)
    require(sample.nonEmpty, "pqTrain: empty training sample")
    val dim = sample.head.length
    require(dim % m == 0, s"pqTrain: dim $dim not divisible by m=$m")
    val subDim = dim / m
    // subspaces are independent — k-means them concurrently (driver-side
    // CPU work, ~m × iters × n × k × subDim flops; serial it dominated
    // pqTrain at the default m=8)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val books = Await.result(Future.sequence((0 until m).map { mi =>
      Future {
        val subs = sample.map(v => v.slice(mi * subDim, (mi + 1) * subDim))
        kmeansLocal(subs, k, seed = 42L + mi)
      }
    }), Duration.Inf).toArray
    PqModel(m, k, subDim, books)
  }

  /** Seeded Lloyd k-means on driver-resident subvectors (≤ trainSample ×
    * subDim doubles — bytes, not gigabytes). Init strides over VALUE-
    * distinct points and empty clusters re-seed from successive distinct
    * farthest points, so codewords stay distinct whenever the data has
    * ≥ k distinct values — duplicated training data (the common corpus
    * case) cannot collapse codebook capacity. */
  private def kmeansLocal(xs: Array[Array[Double]], k: Int,
                          seed: Long, iters: Int = 20): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    val n = xs.length
    // stride over the first occurrence of each distinct value (input
    // order, deterministic); duplicates in the sample would otherwise
    // seed identical centers that Lloyd can never separate
    var centers: Array[Array[Double]] = {
      val seen = scala.collection.mutable.LinkedHashSet.empty[Seq[Double]]
      xs.foreach(x => seen += x.toSeq)
      val distinct = seen.toArray
      val dn = distinct.length
      Array.tabulate(k)(i =>
        if (dn >= k) distinct((i.toLong * dn / k).toInt).toArray
        else if (i < dn) distinct(i).toArray
        else xs(rnd.nextInt(n)).clone())
    }
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val t = a(i) - b(i); s += t * t; i += 1 }
      s
    }
    var it = 0
    while (it < iters) {
      val assign = xs.map { x =>
        var best = 0; var bd = Double.MaxValue; var c = 0
        while (c < k) { val dd = d2(x, centers(c)); if (dd < bd) { bd = dd; best = c }; c += 1 }
        best
      }
      val byCluster = Array.fill(k)(scala.collection.mutable.ArrayBuffer.empty[Int])
      assign.zipWithIndex.foreach { case (c, i) => byCluster(c) += i }
      val next = new Array[Array[Double]](k)
      (0 until k).foreach { c =>
        val members = byCluster(c)
        if (members.nonEmpty) {
          val acc = new Array[Double](xs.head.length)
          members.foreach { i =>
            var j = 0; while (j < acc.length) { acc(j) += xs(i)(j); j += 1 }
          }
          next(c) = acc.map(_ / members.size)
        }
      }
      val empties = (0 until k).filter(next(_) == null)
      if (empties.nonEmpty) {
        // the i-th empty cluster takes the i-th farthest VALUE-distinct
        // point — re-seeding every empty from the same single farthest
        // point would just recreate the duplicate-codeword problem
        val ranked = xs.indices.sortBy(i => -d2(xs(i), centers(assign(i))))
        val used = scala.collection.mutable.Set.empty[Seq[Double]]
        val picks = ranked.iterator.filter(i => used.add(xs(i).toSeq))
        empties.foreach { c =>
          next(c) = if (picks.hasNext) xs(picks.next()).clone()
                    else xs(rnd.nextInt(n)).clone()
        }
      }
      centers = next
      it += 1
    }
    centers
  }

  /** The (row-local, codegen'd) PQ-codes expression for `vecCol`: the
    * whole m×k argmin runs as ONE native primitive loop per row
    * ([[graft.functions.PqEncode]]) — the previous composed form
    * (slice + dot + array_min over (dist, k) structs) allocated m·k
    * struct rows per vector and was the dominant cost of every PQ
    * query. Ties still break to the smaller codeword id. */
  def codesCol(vecCol: String, model: PqModel): Column = {
    val flat = new Array[Double](model.m * model.k * model.subDim)
    for (mi <- 0 until model.m; ki <- 0 until model.k) {
      System.arraycopy(model.codebooks(mi)(ki), 0, flat,
        (mi * model.k + ki) * model.subDim, model.subDim)
    }
    graft.functions.PqF.pqEncode(col(vecCol), flat, model.m, model.k, model.subDim)
  }

  /** (id, codes array<tinyint>): per-subspace nearest codeword. */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
               model: PqModel): DataFrame =
    df.select(col(idCol).as("id"), codesCol(vecCol, model).as("codes"))

  /** IVF+PQ index build — the compressed, pruned ANN shape (the FAISS
    * IVFPQ default at corpus scale): vectors assign to their nearest
    * coarse centroid's LIST ([[Similarity.ivfAssign]], the same coarse
    * quantizer the float IVF lifecycle uses), each list stores only the
    * m-byte PQ codes, and a probe reads `nprobe` lists PARTITION-PRUNED
    * and ADC-scores them — at 10⁹×64-dim that is ~8 GB of codes against
    * 256 GB of floats, probed at nprobe/kLists read amplification.
    * Codebooks/centroids persist as parquet sidecars, so the index is
    * self-describing.
    *
    * Same lifecycle contract as the float indexes: the whole layout
    * (vectors + both sidecars) lands through [[Similarity.stagedCommit]]
    * — a crash anywhere leaves the previous index untouched, and a
    * reader never sees a half-written dir — and the list partitions are
    * salt-clustered ([[Similarity.clusteredWrite]]) so [[Similarity
    * .compactIndex]] / [[Similarity.compactionDue]] (method "ivfpq")
    * bound the append-path read amplification. Grow it with
    * [[ivfPqAppend]]; retrain via a fresh build on drift cadence
    * (monitor [[Similarity.ivfListStats]]). */
  def ivfPqBuild(df: DataFrame, idCol: String, vecCol: String,
                 indexDir: String, kLists: Int = 64, m: Int = 8,
                 k: Int = 64, trainSample: Int = 4096,
                 metaCols: Seq[String] = Nil): Unit = {
    metaCols.foreach(c => require(!Set("id", "list", "codes")(c),
      s"ivfPqBuild: metadata column '$c' collides with a structural index column"))
    val spark = df.sparkSession
    val centroids = Similarity.trainCentroids(df, idCol, vecCol, kLists, trainSample)
    val model = pqTrain(df, idCol, vecCol, m, k, trainSample)
    Similarity.stagedCommit(spark, indexDir) { staging =>
      Similarity.clusteredWrite(
          Similarity.ivfAssign(df, idCol, vecCol, centroids, metaCols)
            .select(col("id") +: col("list") +:
              codesCol("v", model).as("codes") +: metaCols.map(col): _*),
          "list", kLists)
        .write.mode("overwrite").partitionBy("list").parquet(s"$staging/vectors")
      Similarity.writeCentroids(spark, s"$staging/centroids", centroids)
      writeCodebooks(spark, s"$staging/codebooks", model)
    }
  }

  private def writeCodebooks(spark: org.apache.spark.sql.SparkSession,
                             dir: String, model: PqModel): Unit = {
    import spark.implicits._
    (for { mi <- 0 until model.m; ki <- 0 until model.k }
      yield (mi, ki, model.codebooks(mi)(ki).toSeq)).toDF("m", "k", "vec")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** APPEND rows to a built IVF+PQ index WITHOUT retraining: encode the
    * new rows with the FROZEN codebooks, assign them to the FROZEN
    * coarse centroids, and move the m-byte code rows into the list
    * partitions via the same crash/retry-safe [[Similarity.stagedAppend]]
    * commit the float indexes use — a retried or replayed append of the
    * same file-backed batch (or the same explicit `appendId`) is a
    * no-op, never a double-append, and readers stay safe throughout (no
    * existing file is removed or rewritten). Cost is one pass over the
    * NEW rows only.
    *
    * DRIFT BOUND, compounded: beyond the frozen-centroid recall drift of
    * [[Similarity.ivfAppend]], the frozen CODEBOOKS quantize drifted
    * appends with growing reconstruction error — ADC scores degrade
    * before list assignment does. Rebuild on retrain cadence; the skew
    * monitor ([[Similarity.ivfListStats]] / [[Similarity.ivfSkew]])
    * reads this index's list column the same way. */
  def ivfPqAppend(df: DataFrame, idCol: String, vecCol: String,
                  indexDir: String, appendId: Option[String] = None): Unit = {
    val sess = df.sparkSession
    val (centroids, model, vectors) = ivfPqMeta(sess, indexDir)
    // carry the index's metadata columns (filtered-ANN layouts), as the
    // float appends do — re-derived from the live index schema
    val metaCols = vectors.schema.map(_.name)
      .filterNot(Set("id", "list", "codes"))
    val assigned = Similarity.ivfAssign(df, idCol, vecCol, centroids, metaCols)
      .select(col("id") +: col("list") +:
        codesCol("v", model).as("codes") +: metaCols.map(col): _*)
    // schema fence, as ivfAppend: a drifted id type would strand the
    // index with unmergeable parquet footers (codes are always
    // array<tinyint> by construction)
    require(assigned.schema("id").dataType.sql == vectors.schema("id").dataType.sql,
      s"ivfPqAppend: column 'id' type ${assigned.schema("id").dataType.sql} != " +
        s"index type ${vectors.schema("id").dataType.sql}")
    Similarity.healStrandedAppends(sess, indexDir)
    Similarity.stagedAppend(sess, indexDir,
        appendId.getOrElse(Similarity.appendBatchId(df))) { staging =>
      Similarity.clusteredWrite(assigned, "list", centroids.length)
        .write.mode("overwrite").partitionBy("list")
        .parquet(s"$staging/vectors")
    }
  }

  /** Driver-memoized IVFPQ index state (centroids + codebooks + resolved
    * vectors DataFrame) — the [[Similarity]] ivfMeta pattern: warm probe
    * planning touches no Spark job; the pure FS-metadata stamp over the
    * sidecars AND the vectors dir's top-level listing invalidates on any
    * rebuild, append (`_append-<id>` marker changes the path set), or
    * compaction. */
  private val ivfPqMetaCache = new java.util.concurrent.ConcurrentHashMap[
    String, (String, (Array[Array[Double]], PqModel, DataFrame))]()

  private def ivfPqMeta(spark: org.apache.spark.sql.SparkSession,
                        indexDir: String)
      : (Array[Array[Double]], PqModel, DataFrame) = {
    val key = s"${Similarity.sessionTag(spark)}|$indexDir"
    val stamp = Similarity.sidecarStamp(spark, indexDir,
      Seq("centroids", "codebooks", "vectors"))
    val cached = ivfPqMetaCache.get(key)
    if (cached != null && cached._1 == stamp) cached._2
    else {
      val cents = Similarity.readCentroids(spark, indexDir)
      val cb = spark.read.parquet(s"$indexDir/codebooks")
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
      val m = cb.map(_._1).max + 1
      val k = cb.map(_._2).max + 1
      val books = Array.ofDim[Array[Double]](m, k)
      cb.foreach { case (mi, ki, v) => books(mi)(ki) = v }
      val meta = (cents, PqModel(m, k, books(0)(0).length, books),
        spark.read.parquet(s"$indexDir/vectors"))
      Similarity.capCache(ivfPqMetaCache)
      ivfPqMetaCache.put(key, (stamp, meta))
      meta
    }
  }

  /** IVF+PQ probe: nearest `nprobe` lists chosen driver-side against
    * the centroid sidecar (memoized — zero Spark jobs warm), a
    * partition-pruned read of those lists, ADC scoring, bounded-heap
    * top-k. */
  def ivfPqQuery(spark: org.apache.spark.sql.SparkSession, indexDir: String,
                 query: Seq[Double], topK: Int, nprobe: Int = 8): DataFrame = {
    val (centroids, model, vectors) = ivfPqMeta(spark, indexDir)
    require(query.size == model.m * model.subDim,
      s"ivfPqQuery: query dim ${query.size} != index dim ${model.m * model.subDim}")
    val lists = Similarity.nearestLists(centroids, query.toArray, nprobe)
    val probe = vectors
      .filter(col("list").isin(lists.map(Integer.valueOf): _*))
    pqTopK(probe.select("id", "codes"), model, query, topK)
  }

  /** FILTERED ADC probe — the compressed member of the filtered-ANN
    * family ([[Similarity.ivfQueryFiltered]]'s shape at 32× smaller
    * reads): the predicate (over id + the metadata columns the build
    * carried) pushes into the list-pruned parquet read BEFORE ADC
    * scoring, and `nprobe` doubles until `topK` eligible candidates
    * survive or every list is probed — the widening answer to the
    * filtered-recall caveat, identical to the float probes'. At 100 TB
    * this is the serving shape: compressed codes, pruned lists, predicate
    * row groups skipped by parquet stats. */
  def ivfPqQueryFiltered(spark: org.apache.spark.sql.SparkSession,
                         indexDir: String, query: Seq[Double], topK: Int,
                         pred: Column, nprobe: Int = 8): DataFrame = {
    val (centroids, model, vectors) = ivfPqMeta(spark, indexDir)
    require(query.size == model.m * model.subDim,
      s"ivfPqQueryFiltered: query dim ${query.size} != index dim ${model.m * model.subDim}")
    val kLists = centroids.length
    var probe = math.min(math.max(1, nprobe), kLists)
    while (true) {
      val lists = Similarity.nearestLists(centroids, query.toArray, probe)
      val res = pqTopK(
        vectors.filter(col("list").isin(lists.map(Integer.valueOf): _*))
          .filter(pred).select("id", "codes"),
        model, query, topK)
      if (probe >= kLists || res.count() >= topK) return res
      probe = math.min(probe * 2, kLists)
    }
    throw new IllegalStateException("unreachable")
  }

  /** ADC top-k: score = Σ_m table[m][codes[m]] where table[m][k] =
    * query_m · codeword_{m,k} (computed once, driver-side). The scan is
    * a map-only projection of m `element_at` lookups into the flattened
    * table literal + the bounded-heap top-k aggregate — no decode, no
    * shuffle beyond the k-row result. */
  def pqTopK(codesDf: DataFrame, model: PqModel, query: Seq[Double],
             k: Int): DataFrame = {
    require(query.size == model.m * model.subDim,
      s"pqTopK: query dim ${query.size} != ${model.m * model.subDim}")
    val flat: Seq[Double] = for {
      mi <- 0 until model.m
      ki <- 0 until model.k
    } yield {
      val q = query.slice(mi * model.subDim, (mi + 1) * model.subDim)
      val cw = model.codebooks(mi)(ki)
      q.zip(cw).map { case (a, b) => a * b }.sum
    }
    val table = typedLit(flat)
    val score = (0 until model.m).map { mi =>
      // codes are stored as signed bytes, so codeword ids >= 128 (legal at
      // k in 129..256) wrap negative on read — decode unsigned, else the
      // negative index would silently resolve from the END of the table
      element_at(table,
        pmod(element_at(col("codes"), mi + 1).cast("int"), lit(256))
          + mi * model.k + 1)
    }.reduce(_ + _)
    codesDf
      .select(graft.functions.TopKF.topKByScore(
        round(score, 6), col("id"), k).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.id").as("id"), col("e.score").as("adc"))
  }
}
