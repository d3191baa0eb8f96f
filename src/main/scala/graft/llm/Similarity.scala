package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k — one scan, one
  *    `TakeOrderedAndProject`; the correctness baseline and fine whenever
  *    k·queries is small relative to the corpus.
  *  - [[lshTopK]]: random-hyperplane LSH — a deterministic 16-bit signature
  *    per vector (fixed seed), candidates restricted to the query's bucket
  *    and all buckets at Hamming distance ≤ 1. At 100 TB the signature is
  *    computed once at ingest and the bucket id becomes a partition
  *    column, so a query touches ~17/65536 of the data via partition
  *    pruning instead of a full scan.
  *
  * All math goes through [[graft.functions.VectorDot]], a native Catalyst
  * expression with codegen — Spark's higher-order array functions are
  * interpreted (CodegenFallback) and were ~50× slower on the hot paths.
  */
object Similarity {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** dot(a, b) over array columns, accumulated in double. */
  def dot(a: Column, b: Column): Column = graft.functions.VectorF.dot(a, b)

  def norm(a: Column): Column = graft.functions.VectorF.norm(a)

  def cosine(a: Column, b: Column): Column = graft.functions.VectorF.cosine(a, b)

  /** Exact cosine top-k for one query vector. Rows that cannot be scored
    * are excluded from the candidates, same as [[bruteForceTopKBatch]]:
    * wrong dimension / null element / zero norm give a NULL cosine
    * (Spark's Divide returns NULL for a zero divisor in non-ANSI mode),
    * caught by isNotNull; a NaN ELEMENT gives a NaN cosine (a NaN divisor
    * bypasses the zero check), and NaN ranks ABOVE every real value in
    * Spark's ordering, so without the explicit isnan guard a NaN-element
    * embedding would top every query. */
  /** Column-pruned, id-In-pruned read of a `(id, v, …)` vectors/sidecar
    * parquet dir for a DRIVER-COLLECTED candidate id set — the shared
    * fetch of every serving path that re-joins a pooled answer with its
    * float vectors (MMR diversification in DFL hybridProbe and
    * serve-hybrid). The In filter BEFORE any join is the load-bearing
    * part: a broadcast hash join does not prune the probe-side scan, so
    * without it the fetch reads the whole corpus-sized dir for ≤pool
    * rows; with it, parquet row-group min/max stats skip everything else
    * (the ivfpq `vectors_f32` sidecar lands sorted by (list, id) to keep
    * those stats tight). Callers join the result against their pool
    * frame (broadcast — the pool is serving-sized by construction). */
  def candidateVectors(spark: org.apache.spark.sql.SparkSession,
                       vecDir: String, ids: Seq[Long]): DataFrame =
    spark.read.parquet(vecDir)
      .select(col("id"), col("v"))
      .filter(col("id").isin(ids: _*))

  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
                     query: Seq[Double], k: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    df.select(col(idCol).as("id"),
        round(cosine(col(vecCol), q), 6).as("cos"))
      .filter(col("cos").isNotNull && !isnan(col("cos")))
      .orderBy(col("cos").desc, col("id").asc)
      .limit(k)
  }

  /** Exact cosine RANGE search: every id with `cos(v, query) >= minCos` —
    * the retrieval-filter sibling of [[bruteForceTopK]] (same native
    * scoring scan, same null/NaN exclusions), but threshold-bound
    * instead of count-bound, so the result needs NO ordering, no limit,
    * and therefore no driver merge at all: one map-only scan whose
    * output is the (rare) matching rows. The threshold compares against
    * the ROUNDED cosine, keeping the boundary identical to the SQL
    * oracle's. */
  def bruteForceRange(df: DataFrame, idCol: String, vecCol: String,
                      query: Seq[Double], minCos: Double): DataFrame = {
    val q = array(query.map(lit): _*)
    df.select(col(idCol).as("id"),
        round(cosine(col(vecCol), q), 6).as("cos"))
      .filter(col("cos").isNotNull && !isnan(col("cos")) &&
        col("cos") >= minCos)
  }

  /** Exact cosine top-k for a BATCH of query vectors in ONE corpus pass —
    * the serving shape: each corpus row scores against the whole query
    * matrix via the native [[graft.functions.MatVecDots]] (one expression,
    * vector read once), explodes to (qid, id, cos), and a bounded-heap
    * [[graft.functions.TopKByScore]] aggregate keeps the best k per query.
    * Map-side partial aggregation means the only shuffle carries at most
    * partitions × |queries| × k rows — a window `row_number() <= k` would
    * shuffle and sort all N·Q scored rows instead. Rounding to 6 happens
    * BEFORE ranking so tie-breaking (cos desc, id asc) matches the SQL
    * `QUALIFY` oracle formulation exactly. Corpus rows that cannot be
    * scored are excluded from every query's candidates BEFORE scoring
    * (the vnorm filter below), matching [[bruteForceTopK]]: wrong
    * dimension / null element → null norm, zero vector → vnorm 0 (its
    * cosine would be NULL — Divide by zero is NULL in non-ANSI mode —
    * so the `> 0` filter is what keeps the semantics aligned), NaN
    * element → NaN norm (NaN > 0 is TRUE in Spark comparisons, hence the
    * explicit isnan guard).
    *
    * `queries` carries each query's OWN id — results are keyed by it, so
    * the mapping stays robust however the caller selected the batch.
    * Returns (qid, id, cos).
    *
    * The query matrix lives in the PLAN as literals (that is what lets one
    * codegen'd expression score a row against every query with the vector
    * read once), so plan size grows with |queries|·dim. Batches beyond
    * `chunkSize` are transparently split into independent chunk plans and
    * unioned — results identical (each query's top-k depends only on its
    * own scores), compile time bounded. 256 queries × 64 dims ≈ 16 k
    * literals per chunk, comfortably inside Catalyst/Janino limits; a
    * 10⁴-query batch becomes ~40 chunk plans instead of one
    * 640 k-literal plan that would dominate wall-clock with compilation. */
  def bruteForceTopKBatch(df: DataFrame, idCol: String, vecCol: String,
                          queries: Seq[(Long, Seq[Double])], k: Int,
                          chunkSize: Int = 256): DataFrame = {
    import graft.functions.{MatVecF, TopKF, VectorF}
    require(chunkSize > 0, "bruteForceTopKBatch: chunkSize must be positive")
    if (queries.size > chunkSize)
      return queries.grouped(chunkSize)
        .map(c => bruteForceTopKBatch(df, idCol, vecCol, c, k, chunkSize))
        .reduce(_ unionByName _)
    val qNorms = queries.map { case (_, q) => math.sqrt(q.map(x => x * x).sum) }
    val qIds = queries.map(_._1)
    val scored = df
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("vnorm", VectorF.norm(col("v")))
      .filter(col("vnorm").isNotNull && !isnan(col("vnorm")) && col("vnorm") > 0)
      .select(col("id"), col("vnorm"),
        posexplode(MatVecF.dots(col("v"), queries.map(_._2))))
      .select(col("pos"),
        round(col("col") / (col("vnorm") *
          element_at(array(qNorms.map(lit): _*), col("pos") + 1)), 6).as("cos"),
        col("id"))
      // degenerate QUERY vectors (zero norm → NULL cos via divide-by-zero,
      // NaN element → NaN cos): drop before the top-k heap, which would
      // otherwise rank NaN first — keeps batch row-for-row identical to
      // the per-query paths' isNotNull/!isnan exclusion
      .filter(col("cos").isNotNull && !isnan(col("cos")))
    scored
      .groupBy("pos")
      .agg(TopKF.topKByScore(col("cos"), col("id"), k).as("topk"))
      .select(element_at(array(qIds.map(lit): _*), col("pos") + 1).as("qid"),
        explode(col("topk")).as("hit"))
      .select(col("qid"), col("hit.id").as("id"), col("hit.score").as("cos"))
  }

  /** Exact cosine RANGE search for a BATCH of queries in ONE corpus
    * pass: [[bruteForceTopKBatch]]'s scoring scan (native
    * [[graft.functions.MatVecDots]], vector read once per row, query
    * matrix as plan literals with the same `chunkSize` compile bound)
    * but threshold-bound like [[bruteForceRange]] — so after the
    * map-only filter there is NO aggregation at all: no heap, no
    * shuffle, the matching (qid, id, cos) rows stream straight out.
    * Returns (qid, id, cos), thresholded on the ROUNDED cosine. */
  def bruteForceRangeBatch(df: DataFrame, idCol: String, vecCol: String,
                           queries: Seq[(Long, Seq[Double])], minCos: Double,
                           chunkSize: Int = 256): DataFrame = {
    import graft.functions.{MatVecF, VectorF}
    require(chunkSize > 0, "bruteForceRangeBatch: chunkSize must be positive")
    require(queries.nonEmpty, "bruteForceRangeBatch: empty query batch")
    require(queries.map(_._2.size).distinct.size == 1,
      s"bruteForceRangeBatch: ragged query dims ${queries.map(_._2.size).distinct}")
    if (queries.size > chunkSize)
      return queries.grouped(chunkSize)
        .map(c => bruteForceRangeBatch(df, idCol, vecCol, c, minCos, chunkSize))
        .reduce(_ unionByName _)
    val qNorms = queries.map { case (_, q) => math.sqrt(q.map(x => x * x).sum) }
    val qIds = queries.map(_._1)
    df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("vnorm", VectorF.norm(col("v")))
      .filter(col("vnorm").isNotNull && !isnan(col("vnorm")) && col("vnorm") > 0)
      .select(col("id"), col("vnorm"),
        posexplode(MatVecF.dots(col("v"), queries.map(_._2))))
      .select(element_at(array(qIds.map(lit): _*), col("pos") + 1).as("qid"),
        col("id"),
        round(col("col") / (col("vnorm") *
          element_at(array(qNorms.map(lit): _*), col("pos") + 1)), 6).as("cos"))
      .filter(col("cos").isNotNull && !isnan(col("cos")) &&
        col("cos") >= minCos)
  }

  // Deterministic hyperplanes (fixed seed): nBits × dim sign projections.
  // private[graft]: the streaming embedding dedup signs with the same family.
  private[graft] def hyperplanes(nBits: Int, dim: Int): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(1234)
    Seq.fill(nBits)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Random-hyperplane signature: bit i = sign(v · plane_i). */
  def signature(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(vec, array(p.map(lit): _*)) > 0, shiftleft(lit(1L), i)).otherwise(0L)
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Assign each vector its LSH bucket (materialize this at ingest and
    * `partitionBy` on it for pruned reads at scale). Uses the one-pass
    * native [[graft.functions.HyperplaneBands]] signature — bit-identical
    * to [[signature]] for well-formed vectors, without the
    * nBits·dim-literal expression tree. Malformed vectors (dimension
    * mismatch, null element) get a NULL bucket and fall out of probe
    * scope, where the composed form lumped them into bucket 0; a vector
    * that can't be dotted can't be searched, so exclusion is the honest
    * semantic. */
  def lshBuckets(df: DataFrame, idCol: String, vecCol: String,
                 nBits: Int = 16, dim: Int = 64,
                 metaCols: Seq[String] = Nil): DataFrame = {
    val planes = hyperplanes(nBits, dim)
    df.select(col(idCol).as("id") +: col(vecCol).as("v") +:
        metaCols.map(col): _*)
      .withColumn("bucket",
        element_at(graft.functions.HyperplaneF.bands(col("v"), 1, nBits, planes), 1))
  }

  /** Columns an index carries beyond its structural ones — the metadata
    * a filtered probe predicates on; appends re-derive the set from the
    * live index so a metadata-carrying index stays append-able without
    * the caller restating the list. */
  private def indexMetaCols(vectors: DataFrame,
                            reserved: Set[String]): Seq[String] =
    vectors.schema.map(_.name).filterNot(reserved)

  private[llm] def requireValidMetaCols(metaCols: Seq[String],
                                   reserved: Set[String], what: String): Unit =
    metaCols.foreach(c => require(!reserved(c),
      s"$what: metadata column '$c' collides with a structural index column"))

  // ---------- IVF (inverted-file index) ----------

  /** Deterministic driver-side k-means (kmeans++-less simple init by
    * striding the sample) — the REFERENCE implementation that
    * [[kmeansDistributed]] is spec-pinned against; also handy for tests
    * and tiny corpora. */
  private[llm] def kmeans(sample: Array[Array[Double]], k: Int,
                          iters: Int = 8): Array[Array[Double]] = {
    require(sample.nonEmpty, "ivf: empty training sample")
    val dim = sample.head.length
    var centroids = Array.tabulate(math.min(k, sample.length))(i =>
      sample(i * sample.length / math.min(k, sample.length)).clone())
    (0 until iters).foreach { _ =>
      val sums = Array.fill(centroids.length)(new Array[Double](dim))
      val counts = new Array[Int](centroids.length)
      sample.foreach { v =>
        val c = nearestCentroid(v, centroids)
        counts(c) += 1
        var d = 0
        while (d < dim) { sums(c)(d) += v(d); d += 1 }
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c))
      }.toArray
    }
    centroids
  }

  /** DISTRIBUTED k-means for the IVF coarse quantizer: per iteration, ONE
    * `mapPartitions` pass over the (cached) training set computes partial
    * per-centroid sums/counts; only k×dim doubles per partition come back,
    * merged on the driver in partition order (deterministic), with the
    * centroids riding out as a broadcast. The training vectors themselves
    * NEVER collect to the driver — at 100 TB the sample can be billions of
    * rows and this is the one-pass-per-iteration shape that trains at
    * ingest. Init is the same strided selection as [[kmeans]]; the spec
    * pins the two implementations to matching centroids on one sample
    * (equal up to float summation order). */
  private[llm] def kmeansDistributed(sample: org.apache.spark.rdd.RDD[Array[Double]],
                                     k: Int, iters: Int = 8): Array[Array[Double]] = {
    sample.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = sample.count()
      require(n > 0, "ivf: empty training sample")
      val kk = math.min(k.toLong, n).toInt
      // same init as kmeans(): element i*n/kk of the sample in order
      val initIdx = (0 until kk).map(i => i.toLong * n / kk).toSet
      var centroids = sample.zipWithIndex()
        .filter { case (_, i) => initIdx(i) }
        .collect().sortBy(_._2).map(_._1)
      val dim = centroids.head.length
      val sc = sample.sparkContext
      (0 until iters).foreach { _ =>
        val bc = sc.broadcast(centroids)
        val partials = sample.mapPartitionsWithIndex { (pid, it) =>
          val cs = bc.value
          val sums = Array.fill(cs.length)(new Array[Double](dim))
          val counts = new Array[Long](cs.length)
          it.foreach { v =>
            val c = nearestCentroid(v, cs)
            counts(c) += 1
            var d = 0
            while (d < dim) { sums(c)(d) += v(d); d += 1 }
          }
          Iterator.single((pid, sums, counts))
        }.collect().sortBy(_._1) // merge in partition order: deterministic
        val sums = Array.fill(centroids.length)(new Array[Double](dim))
        val counts = new Array[Long](centroids.length)
        partials.foreach { case (_, s, c) =>
          var ci = 0
          while (ci < centroids.length) {
            counts(ci) += c(ci)
            var d = 0
            while (d < dim) { sums(ci)(d) += s(ci)(d); d += 1 }
            ci += 1
          }
        }
        centroids = centroids.indices.map { c =>
          if (counts(c) == 0) centroids(c) else sums(c).map(_ / counts(c))
        }.toArray
        bc.destroy()
      }
      centroids
    } finally sample.unpersist(blocking = false)
  }

  private[llm] def nearestCentroid(v: Array[Double], cs: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      var d = 0.0; var i = 0
      while (i < v.length) { val x = v(i) - cs(c)(i); d += x * x; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Assign each vector its IVF list (= nearest coarse centroid), as pure
    * column math: argmin over ‖v−c‖² = argmin(−2·v·c + ‖c‖²) via an
    * array-of-structs min (struct comparison is lexicographic). At scale
    * the list id is the partition column, exactly like the LSH bucket. */
  def ivfAssign(df: DataFrame, idCol: String, vecCol: String,
                centroids: Array[Array[Double]],
                metaCols: Seq[String] = Nil): DataFrame = {
    // one native argmin loop per row (graft.functions.NearestCentroid) —
    // the composed array_min-over-structs form allocated k struct rows
    // per vector; semantics identical (ties to the smaller list id).
    // `metaCols` ride along into the index layout so a filtered probe
    // can push its predicate into the pruned read.
    df.select(col(idCol).as("id") +: col(vecCol).as("v") +:
      metaCols.map(col) :+
      graft.functions.PqF.nearestCentroid(col(vecCol), centroids).as("list"): _*)
  }

  /** Train the IVF coarse quantizer over a DETERMINISTIC bounded sample:
    * `orderBy(id).limit(n)` — a bare `limit` is nondeterministic, and a
    * recomputed partition mid-training could feed DIFFERENT rows to later
    * k-means iterations, yielding inconsistent centroids. Training itself
    * is distributed ([[kmeansDistributed]] — vectors never collect). */
  /** The collision-geometry probe radius of the LSH RANGE family: two
    * vectors at cosine c disagree on each hyperplane bit with
    * probability acos(c)/π, so the expected Hamming distance at the
    * threshold is nBits·acos(minCos)/π; `slackBits` widens past the
    * expectation and the radius caps at nBits. ONE implementation — the
    * rule used to be copy-pasted at five probe sites. */
  private def rangeRadius(nBits: Int, minCos: Double, slackBits: Int): Int = {
    val expected = nBits * math.acos(math.max(-1.0, math.min(1.0, minCos))) / math.Pi
    math.min(nBits, math.ceil(expected).toInt + slackBits)
  }

  def trainCentroids(df: DataFrame, idCol: String, vecCol: String,
                     kLists: Int, trainSample: Int): Array[Array[Double]] = {
    // EXCLUDE malformed rows from training exactly as the assign/probe
    // paths exclude them from serving (null vectors, null elements,
    // ragged dims): one bad row in the sample otherwise kills the whole
    // build with an opaque executor NPE/AIOOBE
    val sampleRdd = df.select(col(idCol), col(vecCol))
      .filter(col(vecCol).isNotNull)
      .orderBy(col(idCol)).limit(trainSample)
      .select(col(vecCol)).rdd
      .flatMap { r =>
        val xs = r.getSeq[Any](0)
        if (xs == null || xs.contains(null)) None
        else Some(xs.map(_.asInstanceOf[Number].doubleValue()).toArray)
      }
    val dims = sampleRdd.map(_.length).distinct().collect()
    require(dims.nonEmpty,
      "trainCentroids: no well-formed vectors in the training sample")
    require(dims.length == 1,
      s"trainCentroids: ragged vector dims ${dims.toSeq.sorted} in the " +
        "training sample")
    kmeansDistributed(sampleRdd, kLists)
  }

  /** The `nprobe` lists whose centroids are nearest the query. */
  private[graft] def nearestLists(centroids: Array[Array[Double]],
                                q: Array[Double], nprobe: Int): Seq[Int] =
    centroids.indices
      .sortBy { c =>
        var d = 0.0; var i = 0
        while (i < q.length) { val x = q(i) - centroids(c)(i); d += x * x; i += 1 }
        d
      }
      .take(nprobe)

  private def rerank(cands: DataFrame, query: Seq[Double], k: Int): DataFrame = {
    val qLit = array(query.map(lit): _*)
    cands
      .select(col("id"), round(cosine(col("v"), qLit), 6).as("cos"))
      // same unscorable-row exclusion as bruteForceTopK (null or NaN cos)
      .filter(col("cos").isNotNull && !isnan(col("cos")))
      .orderBy(col("cos").desc, col("id").asc)
      .limit(k)
  }

  /** BUILD an IVF index once, at ingest: train the coarse quantizer
    * distributed, write the corpus `partitionBy("list")` so a probe reads
    * only its lists (partition pruning, spec-pinned), and persist the
    * centroids as a small sidecar table under the same directory. At
    * 100 TB this is the one full pass; every [[ivfQuery]] after it touches
    * `nprobe`/`kLists` of the data. Returns the trained centroids.
    *
    * The build COMMITS ATOMICALLY: vectors and centroids are written to a
    * sibling staging directory, then renamed into place (rename is atomic
    * on HDFS and local FS). A failure mid-build leaves any previous index
    * at `indexDir` untouched — never a half-built index where [[ivfQuery]]
    * would pair new vectors with old centroids. `indexDir` should be a
    * qualified URI on the cluster's shared filesystem in any non-local
    * deployment. */
  /** Cluster an index frame on its partition column BEFORE the
    * `partitionBy` write. Without this, every shuffle task holds a
    * slice of every partition value and writes its own tiny parquet
    * file per value — up to `tasks × values` files per build (measured:
    * thousands of ~10-row files for a 2^8-band LSH index, dominating
    * build AND probe time with open/footer overhead). Repartitioning on
    * (value, bounded salt) lands each partition value in as few tasks
    * as parallelism allows: `salt = shufflePartitions / numValues`
    * spreads a hot value across enough tasks to keep a large cluster
    * busy (at 32 local tasks over 256 bands the salt is 1 → exactly one
    * file per populated band; at 2000 shuffle partitions over 16 IVF
    * lists it is 125 → 125-way parallel write per list), while file
    * count stays `≈ max(values, shufflePartitions)` instead of their
    * product. The salt hashes the stable `id` column, keeping the write
    * deterministic under task retries. */
  private[llm] def clusteredWrite(df: DataFrame, partCol: String,
                             numValues: Int): DataFrame = {
    val tasks = df.sparkSession.sessionState.conf.numShufflePartitions
    val saltN = math.max(1, tasks / math.max(1, numValues))
    df.repartition(col(partCol), pmod(hash(col("id")), lit(saltN)))
  }

  /** Atomic index commit shared by [[ivfBuild]] and [[lshBuild]]: run
    * `write` against a sibling staging directory, then swap it into place
    * via renames (atomic on HDFS and local FS). The previous index is
    * RENAMED ASIDE (`.<name>.old`) before the staging rename and deleted
    * only after a successful swap — a failure anywhere during the write
    * phase leaves the previous index untouched at `indexDir`, and a
    * failure of the swap rename itself restores the previous index from
    * the aside copy. The unrecoverable window is the instant between the
    * two renames (previous index at `.old`, new one not yet in place) —
    * a crash there leaves the data recoverable by hand but no live dir.
    * Swapping a LIVE index also races in-flight readers (they can see
    * files vanish mid-swap); the `*TopKIndexed` cache avoids this
    * entirely by landing each rebuild in a fingerprint-stamped NEW
    * directory ([[newIndexDir]]) — explicit same-dir rebuilds via
    * [[ivfBuild]]/[[lshBuild]] are single-writer, reader-quiesced
    * operations by contract. */
  private[llm] def stagedCommit(spark: org.apache.spark.sql.SparkSession,
                           indexDir: String)(write: String => Unit): Unit = {
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val target = fs.makeQualified(new org.apache.hadoop.fs.Path(indexDir))
    val staging = new org.apache.hadoop.fs.Path(
      target.getParent, s".${target.getName}.staging")
    val aside = new org.apache.hadoop.fs.Path(
      target.getParent, s".${target.getName}.old")
    // self-heal first: a crash between the two swap renames of an earlier
    // commit leaves the only index copy at `aside` and nothing at
    // `target` — restore it before the delete below could destroy it
    if (!fs.exists(target) && fs.exists(aside)) fs.rename(aside, target)
    fs.delete(staging, true)
    write(staging.toString)
    fs.delete(aside, true)
    val hadPrevious = fs.exists(target)
    if (hadPrevious && !fs.rename(target, aside))
      throw new java.io.IOException(
        s"index commit rename-aside $target -> $aside failed")
    if (!fs.rename(staging, target)) {
      // restore the previous index; a failed restore must not pass
      // silently — the only live copy is then stranded at `aside`
      val restored = hadPrevious && fs.rename(aside, target)
      throw new java.io.IOException(
        s"index commit rename $staging -> $target failed" +
          (if (hadPrevious && !restored)
             s"; previous index stranded at $aside" else ""))
    }
    fs.delete(aside, true)
  }

  def ivfBuild(df: DataFrame, idCol: String, vecCol: String, indexDir: String,
               kLists: Int = 16, trainSample: Int = 2048,
               metaCols: Seq[String] = Nil): Array[Array[Double]] = {
    requireValidMetaCols(metaCols, Set("id", "v", "list"), "ivfBuild")
    val centroids = trainCentroids(df, idCol, vecCol, kLists, trainSample)
    val sess = df.sparkSession
    stagedCommit(sess, indexDir) { staging =>
      clusteredWrite(ivfAssign(df, idCol, vecCol, centroids, metaCols),
          "list", kLists)
        .write.mode("overwrite").partitionBy("list").parquet(s"$staging/vectors")
      writeCentroids(sess, s"$staging/centroids", centroids)
    }
    centroids
  }

  /** Replace ONE sidecar subdir of a live index (occupancy after an
    * append): write to a sibling staging dir, then delete + rename into
    * place. The unrecoverable window (between delete and rename) loses
    * only the sidecar — [[lshMeta]] falls back to the counting loop when
    * occupancy is missing, and the next append or rebuild restores it. */
  private[llm] def replaceSidecar(spark: org.apache.spark.sql.SparkSession,
                             indexDir: String, name: String)
                            (write: String => Unit): Unit = {
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val target = fs.makeQualified(
      new org.apache.hadoop.fs.Path(s"$indexDir/$name"))
    val staging = new org.apache.hadoop.fs.Path(
      target.getParent, s".$name.staging")
    fs.delete(staging, true)
    write(staging.toString)
    fs.delete(target, true)
    if (!fs.rename(staging, target))
      throw new java.io.IOException(
        s"sidecar replace rename $staging -> $target failed")
  }

  /** All leaves of `df`'s plan are file-backed scans — the shape where
    * the plan string + input-file metadata identify the ROWS. An
    * in-memory leaf (LocalRelation / LogicalRDD) renders only its schema
    * in the plan string, so its data is invisible to any plan-derived
    * fingerprint. */
  private[graft] def fileBackedCorpus(df: DataFrame): Boolean = {
    val leaves = df.queryExecution.analyzed.collectLeaves()
    leaves.nonEmpty && leaves.forall {
      case _: org.apache.spark.sql.execution.datasources.LogicalRelation => true
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
        r.table.isInstanceOf[org.apache.spark.sql.execution.datasources.v2.FileTable]
      case _ => false
    }
  }

  /** Deterministic id for one append batch: the canonicalized plan plus
    * every input file's (path, length, mtime). Two calls appending the
    * SAME rows from the SAME file state get the same id — which is what
    * makes a crashed-then-retried append idempotent ([[stagedAppend]])
    * — while a new or regenerated file, or a different filter/projection,
    * changes it. A batch with any non-file leaf (in-memory data, whose
    * ROWS the plan string cannot see) gets a RANDOM id instead: retry
    * idempotency honestly surrendered rather than risking two different
    * in-memory batches colliding on one id and the second silently
    * skipped. The cached lifecycle's appends are always file-backed
    * filters, so they always get the deterministic form. */
  private[llm] def appendBatchId(df: DataFrame): String =
    if (fileBackedCorpus(df))
      graft.util.Md5.hex(Iterator.single(
        df.queryExecution.analyzed.canonicalized.treeString(
          verbose = false, addSuffix = false,
          maxFields = Int.MaxValue, printOperatorId = false)) ++
        corpusFileMeta(df).iterator.map {
          case (f, (len, mtime)) => s"$f:$len:$mtime;"
        }).take(16)
    else java.util.UUID.randomUUID().toString.replace("-", "").take(16)

  /** The sidecar phase of a staged-append commit: given (spark, indexDir,
    * stagingPath, id), apply any staged sidecar delta to the live index.
    * MUST be idempotent across crashes — guard the apply with an
    * `_applied-<id>` marker written atomically WITH the merged sidecar
    * (the [[occupancyDeltaApply]] pattern). */
  private[llm] type SidecarApply =
    (org.apache.spark.sql.SparkSession, String,
      org.apache.hadoop.fs.Path, String) => Unit

  /** Crash/retry-safe append commit shared by [[ivfAppend]], [[lshAppend]],
    * and [[graft.llm.Retrieval.bm25Append]] — the append-path counterpart
    * of [[stagedCommit]]. A bare `mode("append")` into the live dir was
    * NOT retry-safe: the cached lifecycle retries a failed append (lazy
    * slot), and a retry after the vectors write had committed would append
    * every row TWICE (duplicate ids in the index, duplicate ids in top-k
    * answers). Here the new rows stage under `.append-<id>`, a
    * `_COMMITTING` flag marks the staging complete, and the commit phase
    * ([[commitStagedAppend]]) is a sequence of idempotent, resumable steps
    * fenced by a durable `<dataDirs.head>/_append-<id>` marker:
    *
    *  - marker exists → the append is fully applied; a retried append is
    *    a no-op (stale staging swept)
    *  - no `_COMMITTING` → staging may be partial; rewrite it from scratch
    *  - `_COMMITTING`, no marker → resume the commit where the crash
    *    stopped: part files already moved are gone from staging, and the
    *    sidecar merge is guarded by its own in-dir applied marker
    *
    * `dataDirs` names the partitioned data subdirs whose staged part
    * files move into the live layout (ANN: `vectors`; BM25: `postings`
    * and `df`); `applySidecar` runs the family's sidecar delta merge.
    * Appends remain single-writer operations per index dir (the same
    * contract as in-place rebuilds); readers stay safe throughout —
    * no existing file is removed or rewritten. */
  private[llm] def stagedAppend(spark: org.apache.spark.sql.SparkSession,
                           indexDir: String, id: String,
                           dataDirs: Seq[String] = Seq("vectors"),
                           applySidecar: SidecarApply = occupancyDeltaApply)
                          (stageWrite: String => Unit): Unit = {
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val root = fs.makeQualified(new org.apache.hadoop.fs.Path(indexDir))
    val staging = new org.apache.hadoop.fs.Path(root, s".append-$id")
    val applied =
      new org.apache.hadoop.fs.Path(root, s"${dataDirs.head}/_append-$id")
    if (fs.exists(applied)) { fs.delete(staging, true); return }
    val committing = new org.apache.hadoop.fs.Path(staging, "_COMMITTING")
    if (!fs.exists(committing)) {
      fs.delete(staging, true)
      stageWrite(staging.toString)
      fs.create(committing, true).close()
    }
    commitStagedAppend(spark, indexDir, staging, id, dataDirs, applySidecar)
  }

  /** The COMMIT phase of a staged append: move the staged part files into
    * the live partition directories (each rename atomic; files already
    * moved by an earlier crashed attempt are absent from staging, so the
    * walk resumes where it stopped), apply the staged occupancy delta if
    * one exists (guarded by an `_applied-<id>` marker written INSIDE the
    * swapped occupancy dir, so the merged histogram and its applied
    * record commit atomically with the sidecar rename and can never
    * double-apply), then durably mark the whole append done with a
    * `vectors/_append-<id>` marker. That marker is ALSO the nonce that
    * changes the vectors dir's top-level path LISTING — the memoized
    * index snapshots ([[ivfMeta]]/[[lshMeta]]) invalidate on the path
    * set, not on directory-mtime granularity (two appends inside one
    * mtime tick are still told apart). */
  private def commitStagedAppend(spark: org.apache.spark.sql.SparkSession,
                                 indexDir: String,
                                 staging: org.apache.hadoop.fs.Path,
                                 id: String,
                                 dataDirs: Seq[String] = Seq("vectors"),
                                 applySidecar: SidecarApply =
                                   occupancyDeltaApply): Unit = {
    val fs = staging.getFileSystem(spark.sessionState.newHadoopConf())
    val live = new org.apache.hadoop.fs.Path(s"$indexDir/${dataDirs.head}")
    dataDirs.foreach { d =>
      val liveD = new org.apache.hadoop.fs.Path(s"$indexDir/$d")
      val stagedD = new org.apache.hadoop.fs.Path(staging, d)
      if (fs.exists(stagedD)) {
        fs.listStatus(stagedD).foreach { part =>
          if (part.isDirectory && part.getPath.getName.contains("=")) {
            val dst = new org.apache.hadoop.fs.Path(liveD, part.getPath.getName)
            fs.mkdirs(dst)
            fs.listStatus(part.getPath).foreach { f =>
              val n = f.getPath.getName
              if (!n.startsWith("_") && !n.startsWith(".") &&
                  !fs.rename(f.getPath, new org.apache.hadoop.fs.Path(dst, n)))
                throw new java.io.IOException(
                  s"append move ${f.getPath} -> $dst failed")
            }
          }
        }
      }
    }
    applySidecar(spark, indexDir, staging, id)
    fs.create(new org.apache.hadoop.fs.Path(live, s"_append-$id"), true).close()
    // bound the marker population: a long-running ingest stream lands one
    // marker per micro-batch, and an unbounded pile would inflate every
    // probe's sidecar-stamp listing forever. Normally only the most
    // RECENT appends can replay (streaming replays the last uncommitted
    // batch; the cached lifecycle retries immediately) — but an operator
    // rolling a checkpoint back from backup replays every batch since
    // that backup, so the bound is sized generously: a rollback deeper
    // than [[appendMarkerKeep]] committed batches is the one shape whose
    // replays would re-append (rebuild the index after such a restore).
    // Older markers are spent and deleted here, oldest first.
    val markers = fs.listStatus(live)
      .filter(_.getPath.getName.startsWith("_append-"))
    if (markers.length > appendMarkerKeep)
      markers.sortBy(m => (m.getModificationTime, m.getPath.getName))
        .dropRight(appendMarkerKeep)
        .foreach(m => fs.delete(m.getPath, false))
    fs.delete(staging, true)
  }

  /** How many `_append-<id>` replay-fence markers each index retains —
    * see the pruning note in [[commitStagedAppend]]. 512 zero-byte files
    * cost nothing in the stamp listing while covering checkpoint
    * rollbacks of up to 512 committed batches. */
  private val appendMarkerKeep = 512

  // ── id-DELETE: the tombstone sidecar ─────────────────────────────
  //
  // The lifecycle verb a training-data operator needs most often after
  // build: a takedown (copyright / PII / GDPR removal) without a full
  // index rebuild. Deletes land as an APPEND-ONLY parquet dir of (id)
  // rows under `<indexDir>/tombstones/`; probes honor it through one
  // broadcast LEFT-ANTI join applied at the memoized meta chokepoints
  // (ivfMeta / lshMeta / ivfPqMeta / bm25Meta — every probe of every
  // family reads its vectors/postings through one of them), and the
  // next compaction or retrain physically drops the rows and clears
  // the tombstones (stagedCommit swaps in a staging dir that never
  // carried them). An index with NO tombstones pays exactly nothing —
  // the anti-join is only planned when the dir exists.

  /** The tombstone sidecar's dir name under an index root. */
  private[llm] val tombstonesName = "tombstones"

  /** The live tombstoned-id frame of an index, or None when the index
    * carries no tombstones (the overwhelmingly common case — the read
    * is one FS existence probe). */
  private[llm] def tombstoneDf(spark: org.apache.spark.sql.SparkSession,
                               indexDir: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/$tombstonesName")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) Some(spark.read.parquet(p.toString).select("id"))
    else None
  }

  /** Restrict an index data frame (carrying an `id` column) to rows NOT
    * tombstoned: a broadcast LEFT-ANTI join — map-side, no shuffle of
    * the index scan, and partition/row-group pruning of the scan stays
    * intact underneath (Catalyst pushes list/pband/predicate filters
    * below the join). Identity when the index has no tombstones. */
  private[llm] def antiTombstoned(spark: org.apache.spark.sql.SparkSession,
                                  indexDir: String,
                                  df: DataFrame): DataFrame =
    tombstoneDf(spark, indexDir).fold(df)(t =>
      df.join(broadcast(t.distinct()), Seq("id"), "left_anti"))

  /** (size, replay-fence id) of a delete batch in ONE aggregation pass:
    * the fence id hashes (count, order-insensitive hash sum) over the
    * distinct ids, computed distributedly (no driver collect, so a
    * takedown list the size of a shard is fine) — and since the count is
    * already in that aggregate, the callers' empty-batch check and
    * returned tally ride along instead of re-executing the
    * wanted-minus-tombstones join a second time. A RETRIED delete of
    * the same id set fences to the same identity and is a no-op. */
  private[llm] def deleteBatchInfo(ids: DataFrame): (Long, String) = {
    val r = ids.agg(count(lit(1)), sum(xxhash64(col("id")))).head()
    (r.getLong(0),
      graft.util.Md5.hex(s"del:${r.getLong(0)}:${r.get(1)}").take(16))
  }

  /** DELETE ids from a built ANN index (lsh | ivf | ivfpq — the layout
    * is self-describing, no method argument needed): stage a tombstone
    * batch through the [[stagedAppend]] crash/retry discipline
    * (`vectors/_append-del-<id>` fence: a replayed delete is a no-op),
    * move it into the append-only `tombstones/` sidecar, and — for
    * occupancy-carrying indexes (LSH) — fold the deleted rows' negative
    * per-bucket counts into the histogram the same way an append folds
    * positive ones. Probes honor the tombstones immediately (the meta
    * stamps include the tombstones listing); the rows are physically
    * dropped, and the tombstones cleared, by the next [[compactIndex]],
    * [[ivfRetrain]], or [[graft.llm.Pq.ivfPqRetrain]].
    *
    * Returns the number of NEWLY tombstoned ids (ids already tombstoned
    * are excluded up front — which is also what makes the LSH occupancy
    * subtraction immune to double-deletes). Ids absent from the index
    * tombstone harmlessly (the anti-join is a set filter). IVF list
    * stats ([[ivfListStats]]/[[ivfSkew]]) intentionally keep counting
    * tombstoned rows until a compaction/retrain drops them — the skew
    * trigger stays conservative. Same single-writer contract as appends.
    * Re-APPENDING a tombstoned id is unsupported while its tombstone
    * lives (the anti-join would hide the new row): compact first. */
  def annDelete(ids: DataFrame, idCol: String, indexDir: String): Long = {
    val spark = ids.sparkSession
    healStrandedAppends(spark, indexDir)
    val wanted = ids.select(col(idCol).cast("long").as("id")).distinct()
    val fresh = tombstoneDf(spark, indexDir)
      .fold(wanted)(t => wanted.join(t.distinct(), Seq("id"), "left_anti"))
    val (nFresh, fenceId) = deleteBatchInfo(fresh)
    if (nFresh == 0) return 0L
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val hasOccupancy =
      fs.exists(new org.apache.hadoop.fs.Path(s"$indexDir/occupancy"))
    stagedAppend(spark, indexDir, s"del-$fenceId") { staging =>
      fresh.coalesce(1).write.mode("overwrite")
        .parquet(s"$staging/$tombstonesName")
      if (hasOccupancy) {
        // negative per-bucket delta, read back from the staged write
        // (the lshAppend idiom — survives a crash after the move)
        val tomb = spark.read.schema("id LONG")
          .parquet(s"$staging/$tombstonesName")
        spark.read.parquet(s"$indexDir/vectors")
          .join(tomb, Seq("id"))
          .filter(col("bucket").isNotNull)
          .groupBy("bucket").agg((-count(lit(1))).as("count"))
          .coalesce(1).write.mode("overwrite").parquet(s"$staging/delta")
      }
    }
    nFresh
  }

  /** Convenience [[annDelete]] for a driver-side takedown list. */
  def annDelete(spark: org.apache.spark.sql.SparkSession,
                indexDir: String, ids: Seq[Long]): Long = {
    import spark.implicits._
    annDelete(ids.toDF("id"), "id", indexDir)
  }

  /** Move a staged tombstone batch (`staging/tombstones`, written by the
    * delete verbs) into the live append-only tombstones dir — the
    * sidecar-phase counterpart of the dataDirs part-file walk, for the
    * one sidecar that accumulates by FILE ADDITION rather than merge.
    * Idempotent across crash/retry: files land under batch-id-derived
    * names and a name already present is skipped (a duplicate tombstone
    * id would be harmless anyway — the anti-join is a set filter).
    * Folded into BOTH families' default [[SidecarApply]] so a stranded
    * delete staging heals through the same [[healStrandedAppends]] walk
    * as a stranded append. */
  private[llm] def applyStagedTombstones(
      spark: org.apache.spark.sql.SparkSession, indexDir: String,
      staging: org.apache.hadoop.fs.Path, id: String): Unit =
    applyStagedAddition(spark, indexDir, staging, id,
      tombstonesName, tombstonesName)

  /** The generic FILE-ADDITION sidecar apply behind
    * [[applyStagedTombstones]] (and BM25's empty-docs delta): move a
    * staged dir's part files into a live append-only sidecar under
    * batch-id-derived names. Idempotent across crash/retry — a name
    * already present is skipped (these sidecars are SET-valued, so a
    * duplicate row would be harmless anyway). */
  private[llm] def applyStagedAddition(
      spark: org.apache.spark.sql.SparkSession, indexDir: String,
      staging: org.apache.hadoop.fs.Path, id: String,
      stagedName: String, liveName: String): Unit = {
    val fs = staging.getFileSystem(spark.sessionState.newHadoopConf())
    val staged = new org.apache.hadoop.fs.Path(staging, stagedName)
    if (fs.exists(staged)) {
      val live = new org.apache.hadoop.fs.Path(s"$indexDir/$liveName")
      fs.mkdirs(live)
      fs.listStatus(staged).foreach { f =>
        val n = f.getPath.getName
        if (!n.startsWith("_") && !n.startsWith(".")) {
          val dst = new org.apache.hadoop.fs.Path(live, s"$id-$n")
          if (!fs.exists(dst) && !fs.rename(f.getPath, dst))
            throw new java.io.IOException(
              s"sidecar-addition move ${f.getPath} -> $dst failed")
        }
      }
    }
  }

  /** The ANN families' sidecar phase: merge a staged occupancy delta
    * (`staging/delta`, written by [[lshAppend]] — positive — and
    * [[annDelete]] — negative) into the live occupancy histogram,
    * guarded against double-apply by an `_applied-<id>` marker written
    * atomically with the merged sidecar; move any staged tombstone
    * batch first. The default [[SidecarApply]] of
    * [[stagedAppend]]/[[healStrandedAppends]]. */
  private val occupancyDeltaApply: SidecarApply =
    (spark, indexDir, staging, id) => {
      applyStagedTombstones(spark, indexDir, staging, id)
      val fs = staging.getFileSystem(spark.sessionState.newHadoopConf())
      val delta = new org.apache.hadoop.fs.Path(staging, "delta")
      if (fs.exists(delta)) {
        val occ = new org.apache.hadoop.fs.Path(s"$indexDir/occupancy")
        if (!fs.exists(new org.apache.hadoop.fs.Path(occ, s"_applied-$id"))) {
          val merged =
            if (fs.exists(occ))
              spark.read.parquet(occ.toString)
                .unionByName(spark.read.parquet(delta.toString))
                .groupBy("bucket").agg(sum("count").as("count"))
            else // legacy index, or occupancy lost to a crash mid-swap:
                 // recount from the index's bucket column (the moved rows
                 // are live already, so the recount includes this batch)
              spark.read.parquet(s"$indexDir/vectors")
                .filter(col("bucket").isNotNull).groupBy("bucket").count()
          replaceSidecar(spark, indexDir, "occupancy") { p =>
            merged.coalesce(1).write.mode("overwrite").parquet(p)
            fs.create(new org.apache.hadoop.fs.Path(p, s"_applied-$id"), true)
              .close()
          }
        }
      }
    }

  /** Snapshot a live vectors dir's `_append-<id>` replay fences and
    * return the action that recreates them inside a STAGED vectors dir —
    * shared by the in-place rewrites ([[compactIndex]], [[ivfRetrain]]),
    * whose rewritten index must keep fencing replays of batches it
    * already contains. Original mtimes are restored ([[commitStagedAppend]]
    * prunes oldest-first by mtime; recreating every fence at "now" would
    * make future pruning order arbitrary).
    *
    * DELETE fences (`_append-del-*`) are deliberately NOT carried: every
    * caller of this helper is a tombstone-CLEARING rewrite (compaction /
    * retrain — the point after which a deleted id may legitimately
    * re-appear), and a surviving del fence would silently no-op a
    * RE-ISSUED delete of the same id set (same order-insensitive fence
    * id) while annDelete/bm25Delete still report its ids as newly
    * tombstoned — a re-appended victim keeps serving. Post-commit
    * idempotence of a delete never needed the marker (the
    * wanted-minus-tombstones anti-join is a set filter); it only fences
    * one crash/retry window, which cannot span a compaction (both are
    * single-writer maintenance verbs). */
  private[llm] def carryAppendFences(fs: org.apache.hadoop.fs.FileSystem,
                                liveVec: org.apache.hadoop.fs.Path)
      : String => Unit = {
    val fences = fs.listStatus(liveVec)
      .filter(_.getPath.getName.startsWith("_append-"))
      .filterNot(_.getPath.getName.startsWith("_append-del-"))
      .map(st => (st.getPath.getName, st.getModificationTime))
    stagedVec => fences.foreach { case (n, mtime) =>
      val p = new org.apache.hadoop.fs.Path(s"$stagedVec/$n")
      fs.create(p, true).close()
      fs.setTimes(p, mtime, -1)
    }
  }

  /** The centroid sidecar write shared by [[ivfBuild]], [[ivfRetrain]],
    * and [[compactIndex]] — one place to evolve the format. */
  private[llm] def writeCentroids(spark: org.apache.spark.sql.SparkSession,
                             dir: String,
                             centroids: Array[Array[Double]]): Unit = {
    import spark.implicits._
    centroids.zipWithIndex.toSeq.map { case (c, i) => (i, c.toSeq) }
      .toDF("list", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** Finish any earlier append that crashed after its staging committed
    * (`_COMMITTING` present, `vectors/_append-<id>` marker absent) —
    * called by both append entry points before their own work, so an
    * ABANDONED crashed append (its caller never retried) cannot leave
    * the occupancy permanently missing that batch's delta once later
    * appends land. A staging without `_COMMITTING` wrote nothing live
    * and is left alone — its owner either retries (overwriting it) or a
    * retention sweep collects it with the index dir. */
  private[llm] def healStrandedAppends(spark: org.apache.spark.sql.SparkSession,
                                  indexDir: String,
                                  dataDirs: Seq[String] = Seq("vectors"),
                                  applySidecar: SidecarApply =
                                    occupancyDeltaApply): Unit = {
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val root = fs.makeQualified(new org.apache.hadoop.fs.Path(indexDir))
    val entries =
      try fs.listStatus(root)
      catch { case _: java.io.FileNotFoundException =>
        Array.empty[org.apache.hadoop.fs.FileStatus] }
    entries.foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n.startsWith(".append-")) {
        val id = n.stripPrefix(".append-")
        if (fs.exists(new org.apache.hadoop.fs.Path(root,
            s"${dataDirs.head}/_append-$id")))
          fs.delete(st.getPath, true) // applied; only the cleanup was lost
        else if (fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_COMMITTING"))) {
          log.warn(s"healing stranded append $id at $indexDir")
          commitStagedAppend(spark, indexDir, st.getPath, id, dataDirs,
            applySidecar)
        }
      }
    }
  }

  /** APPEND rows to a built IVF index WITHOUT retraining: assign the new
    * rows to the EXISTING centroids (standard IVF practice — the coarse
    * quantizer is fixed at build time) and move them into the list
    * partitions via the crash/retry-safe [[stagedAppend]] commit (a
    * retried or replayed append of the same file-backed batch is a
    * no-op, never a double-append). Cost is one pass over the NEW data
    * only — no training, no rewrite of the existing corpus — which is
    * what a daily-ingest pipeline needs at 100 TB. Readers are safe
    * throughout: append never removes or rewrites a file an in-flight
    * probe references.
    *
    * DRIFT BOUND: probes stay exact over whatever lands in the probed
    * lists — appended vectors are found exactly as built ones are — but
    * RECALL tracks how well the frozen centroids quantize the grown
    * distribution. Appends drawn from the build-time distribution leave
    * recall unchanged in expectation; drifted appends concentrate in few
    * lists, shrinking the effective probed fraction. Retrain (full
    * [[ivfBuild]]) once appended data is a significant fraction of the
    * corpus — the cached lifecycle does this automatically at
    * [[appendRebuildFactor]] growth; monitor [[ivfListStats]] for skew
    * when driving the explicit lifecycle. `appendId` as in
    * [[lshAppend]]: a stable caller-side batch identity that makes a
    * replayed append a no-op. */
  def ivfAppend(df: DataFrame, idCol: String, vecCol: String,
                indexDir: String, appendId: Option[String] = None): Unit = {
    val sess = df.sparkSession
    val idx = ivfMeta(sess, indexDir)
    // a metadata-carrying index (filtered-ANN builds) appends the same
    // metadata columns, re-derived from the live layout — a batch
    // missing one fails the select below loudly, never a silent
    // null-metadata append
    val metaCols = indexMetaCols(idx.vectors, Set("id", "v", "list"))
    val assigned = ivfAssign(df, idCol, vecCol, idx.centroids, metaCols)
    // schema fence: a mismatched id/vector type would strand the index
    // with unmergeable parquet footers
    ("id" +: "v" +: metaCols).foreach { c =>
      // `.sql` compares modulo nullability: an in-memory batch's
      // non-null array<float> appends safely into the index's nullable
      // one — the fence is against TYPE drift (float vs double), which
      // would strand the index with unmergeable footers
      require(assigned.schema(c).dataType.sql == idx.vectors.schema(c).dataType.sql,
        s"ivfAppend: column '$c' type ${assigned.schema(c).dataType.sql} != " +
          s"index type ${idx.vectors.schema(c).dataType.sql}")
    }
    healStrandedAppends(sess, indexDir)
    stagedAppend(sess, indexDir, appendId.getOrElse(appendBatchId(df))) { staging =>
      clusteredWrite(assigned, "list", idx.centroids.length)
        .write.mode("overwrite").partitionBy("list")
        .parquet(s"$staging/vectors")
    }
  }

  /** Rows per IVF list — the skew monitor for the append lifecycle: one
    * column-pruned aggregation over the list partition column. */
  def ivfListStats(spark: org.apache.spark.sql.SparkSession,
                   indexDir: String): DataFrame =
    spark.read.parquet(s"$indexDir/vectors").groupBy("list").count()

  /** [[ivfListStats]] reduced to one number: max(list rows) / mean(list
    * rows), the mean over ALL trained lists (an empty list counts — a
    * drifted corpus that starves lists is exactly what this flags). 1.0
    * is perfectly balanced; [[graft.streaming.StreamRunner.annIngestJob]]
    * compares it against `retrainSkewFactor` to decide when the frozen
    * centroids have drifted enough to be worth retraining. */
  def ivfSkew(spark: org.apache.spark.sql.SparkSession,
              indexDir: String): Double = {
    val counts = ivfListStats(spark, indexDir)
      .collect().map(_.getAs[Long]("count"))
    val k = readCentroids(spark, indexDir).length
    if (counts.isEmpty || k == 0) 1.0
    else counts.max.toDouble * k / counts.sum.toDouble
  }

  /** RETRAIN a drifted IVF index FROM ITS OWN ROWS: the index stores
    * (id, vector), so the full corpus needed for retraining is the index
    * itself — no access to the original source files, which a
    * long-running ingest job no longer has (its increments are spread
    * over an unbounded file history). New centroids are trained on a
    * deterministic HASH-SPREAD sample — the build's lowest-id sample
    * ([[trainCentroids]]) would systematically exclude appended rows
    * (appends usually carry the highest ids), i.e. exactly the drifted
    * data a retrain exists to absorb — then every row is reassigned and
    * the whole index rewritten through [[stagedCommit]]. The `_append`
    * replay fences are carried over, so a streaming replay of a batch
    * the retrain already absorbed stays a no-op. Cost is one training
    * pass over the bounded sample plus one assignment rewrite of the
    * index — same order as [[compactIndex]] plus k-means, still never a
    * source-corpus rescan. Single-writer, reader-quiesced, like every
    * in-place rewrite. */
  def ivfRetrain(spark: org.apache.spark.sql.SparkSession, indexDir: String,
                 kLists: Int = 0, trainSample: Int = 2048): Array[Array[Double]] = {
    healStrandedAppends(spark, indexDir)
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val liveVec = new org.apache.hadoop.fs.Path(s"$indexDir/vectors")
    val restoreFences = carryAppendFences(fs, liveVec)
    val k = if (kLists > 0) kLists else readCentroids(spark, indexDir).length
    // keep any metadata columns the build carried (filtered-ANN layouts)
    // — a retrain must not silently strip the columns predicates serve
    // on. Tombstoned rows are excluded from BOTH the training sample and
    // the rewrite (the retrain is a physical-drop point, like compaction
    // — the staged index never carries the tombstones dir)
    val all = antiTombstoned(spark, indexDir,
      spark.read.parquet(liveVec.toString))
    val metaCols = indexMetaCols(all, Set("id", "v", "list"))
    val rows = all.select("id" +: "v" +: metaCols map col: _*)
    val centroids = retrainCentroids(rows, k, trainSample)
    stagedCommit(spark, indexDir) { staging =>
      clusteredWrite(ivfAssign(rows, "id", "v", centroids, metaCols), "list", k)
        .write.mode("overwrite").partitionBy("list").parquet(s"$staging/vectors")
      writeCentroids(spark, s"$staging/centroids", centroids)
      restoreFences(s"$staging/vectors")
    }
    centroids
  }

  /** The retrain-time coarse-centroid trainer shared by [[ivfRetrain]]
    * and [[graft.llm.Pq.ivfPqRetrain]]: a deterministic HASH-SPREAD
    * sample (ties under the hash broken by id, so a recomputed partition
    * mid-training feeds identical rows — the same property
    * [[trainCentroids]] gets from its id ordering) fed to the
    * distributed k-means. The spread matters at retrain time: the
    * build's lowest-id sample would systematically exclude appended rows
    * (appends usually carry the highest ids) — exactly the drifted data
    * a retrain exists to absorb. */
  private[llm] def retrainCentroids(rows: DataFrame, k: Int,
                                    trainSample: Int): Array[Array[Double]] = {
    val sampleRdd = rows
      .orderBy(pmod(hash(col("id")), lit(1 << 30)), col("id"))
      .limit(trainSample).select(col("v")).rdd
      .map(_.getSeq[Any](0).map(x => x.asInstanceOf[Number].doubleValue()).toArray)
    kmeansDistributed(sampleRdd, k)
  }

  /** Materialize already-collected rows as a LOCAL frame (one
    * LocalTableScan, zero jobs at consumption) — the shared idiom of
    * every collect-per-round probe and serving answer localization. */
  private[graft] def localFrame(spark: org.apache.spark.sql.SparkSession,
                                rows: Array[org.apache.spark.sql.Row],
                                schema: org.apache.spark.sql.types.StructType)
      : DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.toIndexedSeq: _*), schema)

  /** Centroid sidecar read-back: kLists × dim doubles — always tiny. */
  def readCentroids(spark: org.apache.spark.sql.SparkSession,
                    indexDir: String): Array[Array[Double]] =
    spark.read.parquet(s"$indexDir/centroids")
      .collect().sortBy(_.getInt(0)).map(_.getSeq[Double](1).toArray)

  /** Data-file count and per-partition max of an index's vectors dir —
    * the read-amplification monitor that decides when [[compactIndex]]
    * is worth running. Pure FS listing, no Spark job. */
  def indexFileStats(spark: org.apache.spark.sql.SparkSession,
                     indexDir: String,
                     dataDir: String = "vectors"): (Long, Long) = {
    val vec = new org.apache.hadoop.fs.Path(s"$indexDir/$dataDir")
    val fs = vec.getFileSystem(spark.sessionState.newHadoopConf())
    val perPart = fs.listStatus(vec).iterator
      .filter(st => st.isDirectory && st.getPath.getName.contains("="))
      .map(d => fs.listStatus(d.getPath)
        .count(f => f.isFile && !f.getPath.getName.startsWith("_") &&
          !f.getPath.getName.startsWith("."))
        .toLong)
      .toArray
    (perPart.sum, if (perPart.isEmpty) 0L else perPart.max)
  }

  /** File counts before and after a [[compactIndex]] run. */
  final case class CompactStats(filesBefore: Long, filesAfter: Long,
                                tombstonesCleared: Long = 0L)

  /** Whether an index has grown past its BUILD-SHAPE layout and a
    * [[compactIndex]] would actually merge something. Build shape is NOT
    * one file per partition: [[clusteredWrite]] salts each partition
    * across up to numShufflePartitions/numValues writer tasks, so a
    * freshly built (or just-compacted) index legitimately holds that
    * many files per partition — gating on `> 1` would report a
    * just-compacted index as perpetually due. One FS listing + one
    * sidecar read (memoized warm), no Spark job. */
  def compactionDue(spark: org.apache.spark.sql.SparkSession,
                    indexDir: String, method: String): Boolean = {
    val numValues = method match {
      case "ivf" | "ivfpq" => readCentroids(spark, indexDir).length
      case "lsh" => 1 << lshMeta(spark, indexDir).pBits
      case other =>
        throw new IllegalArgumentException(s"compactionDue: unknown method $other")
    }
    val saltN = math.max(1,
      spark.sessionState.conf.numShufflePartitions / math.max(1, numValues))
    indexFileStats(spark, indexDir)._2 > saltN
  }

  /** COMPACT an appended index: rewrite the vectors layout back to the
    * file shape a fresh build would produce, WITHOUT recomputing anything
    * — no k-means retrain, no signature pass, one clustered read-rewrite
    * of the index's own files. Streaming ingest lands one part file per
    * partition per micro-batch, so after N appends every probe of a
    * partition reads N small files; compaction bounds that read
    * amplification, which is what keeps an always-appending index
    * servable at 100 TB between (much rarer, much costlier) retrains.
    *
    * The row MULTISET is preserved exactly, so probe results are
    * unchanged — for LSH this is trivially true (signatures are stored,
    * not recomputed); for IVF the centroid sidecar is carried over
    * verbatim, so list assignments stay frozen exactly as [[ivfAppend]]
    * left them. Sidecars are rewritten from the index itself (the LSH
    * occupancy recount is the same column-pruned scan a build does —
    * also repairing any histogram lost to an earlier crash), and the
    * `vectors/_append-<id>` replay fences are CARRIED OVER so a
    * streaming replay of an already-ingested batch stays a no-op across
    * the compaction. The whole rewrite lands through [[stagedCommit]]:
    * a crash anywhere leaves the previous index in place.
    *
    * Same contract as an explicit in-place rebuild: single-WRITER (run
    * it from the index's owning ingest job, as [[graft.streaming
    * .StreamRunner.annIngestJob]]'s `compactEvery` does). Readers racing
    * the dir swap can see files vanish mid-scan; memoized probe
    * snapshots ([[lshMeta]]/[[ivfMeta]]) re-resolve on their next use
    * (every sidecar in their stamps is rewritten), and the serving
    * stream ([[graft.streaming.StreamRunner.annServeBatches]]) treats a
    * mid-rewrite FileNotFound as the self-healing shape it is — one
    * re-resolve-and-retry — so serving survives a concurrent rewrite. */
  def compactIndex(spark: org.apache.spark.sql.SparkSession,
                   indexDir: String, method: String): CompactStats = {
    require(method == "lsh" || method == "ivf" || method == "ivfpq",
      s"compactIndex: unknown method $method")
    // an ivfpq index may carry the opt-in float sidecar — it appends,
    // heals, and compacts in lockstep with the codes (losing it here
    // would silently strip the index of its retrain/MMR capability)
    val f32 = method == "ivfpq" &&
      graft.llm.Pq.hasVectorSidecar(spark, indexDir)
    val dataDirs =
      if (f32) Seq("vectors", graft.llm.Pq.vectorSidecarDir)
      else Seq("vectors")
    // finish any crashed-but-committed append first: its rows must be
    // live (and its fence marker durable) before the rewrite snapshots
    // the vectors dir; un-committed stagings wrote nothing live and are
    // re-staged from scratch by their owner's retry
    healStrandedAppends(spark, indexDir, dataDirs)
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val liveVec = new org.apache.hadoop.fs.Path(s"$indexDir/vectors")
    val restoreFences = carryAppendFences(fs, liveVec)
    val (filesBefore, _) = indexFileStats(spark, indexDir)
    // the rewrite is where tombstoned rows are PHYSICALLY dropped — the
    // staged index never carries them (nor the tombstones dir itself,
    // which the stagedCommit swap discards), so after compaction the
    // probes' anti-join plans away and a previously deleted id may be
    // legitimately re-appended
    val tombstonesCleared =
      tombstoneDf(spark, indexDir).map(_.distinct().count()).getOrElse(0L)
    val vectors = antiTombstoned(spark, indexDir,
      spark.read.parquet(liveVec.toString))
    val lsh = if (method == "lsh") Some(lshMeta(spark, indexDir)) else None
    val centroids =
      if (method == "ivf" || method == "ivfpq") readCentroids(spark, indexDir)
      else Array.empty[Array[Double]]
    // ivfpq: the codebooks sidecar is frozen data — snapshot it (rows AND
    // schema: the `enc` encoding marker must survive, or a residual index
    // would silently re-read as raw after compaction) before the swap so
    // the staged index carries it over verbatim
    val codebooks =
      if (method == "ivfpq") {
        val df = spark.read.parquet(s"$indexDir/codebooks")
        Some((df.collect(), df.schema))
      } else None
    val (partCol, numValues) = lsh match {
      case Some(m) => ("pband", 1 << m.pBits)
      case None    => ("list", centroids.length)
    }
    stagedCommit(spark, indexDir) { staging =>
      clusteredWrite(vectors, partCol, numValues)
        .write.mode("overwrite").partitionBy(partCol)
        .parquet(s"$staging/vectors")
      if (f32)
        // sorted by (partCol, id), as the build/append/retrain writes:
        // the sidecar's consumers read it through id-In pushdowns, and
        // a compaction must not trade their tight row-group stats away
        clusteredWrite(
            antiTombstoned(spark, indexDir, spark.read.parquet(
              s"$indexDir/${graft.llm.Pq.vectorSidecarDir}")),
            partCol, numValues)
          .sortWithinPartitions(partCol, "id")
          .write.mode("overwrite").partitionBy(partCol)
          .parquet(s"$staging/${graft.llm.Pq.vectorSidecarDir}")
      if (method == "ivf" || method == "ivfpq") {
        writeCentroids(spark, s"$staging/centroids", centroids)
        codebooks.foreach { case (rows, schema) =>
          spark.createDataFrame(
              java.util.Arrays.asList(rows: _*), schema)
            .coalesce(1).write.mode("overwrite").parquet(s"$staging/codebooks")
        }
      }
      else lsh.foreach { m =>
        import spark.implicits._
        Seq((m.nBits, m.dim, m.pBits)).toDF("n_bits", "dim", "partition_bits")
          .coalesce(1).write.mode("overwrite").parquet(s"$staging/meta")
        spark.read.parquet(s"$staging/vectors")
          .filter(col("bucket").isNotNull)
          .groupBy("bucket").count()
          .coalesce(1).write.mode("overwrite").parquet(s"$staging/occupancy")
      }
      restoreFences(s"$staging/vectors")
    }
    CompactStats(filesBefore, indexFileStats(spark, indexDir)._1,
      tombstonesCleared)
  }

  /** Driver-memoized IVF index state — the exact counterpart of
    * [[lshMeta]]: the centroid sidecar (whose read is otherwise a Spark
    * job on EVERY probe) and the resolved vectors DataFrame (whose
    * re-resolution re-lists partitions and re-reads the footer schema per
    * probe). Invalidated by the same pure FS-metadata stamp idea, over
    * the centroids dir (every rebuild rewrites it). Warm [[ivfQuery]] /
    * [[ivfQueryBatch]] planning after this touches no Spark job at all —
    * serving latency is the pruned read itself. */
  private final case class IvfMeta(centroids: Array[Array[Double]],
                                   vectors: DataFrame)

  private val ivfMetaCache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, IvfMeta)]()

  private def ivfMeta(spark: org.apache.spark.sql.SparkSession,
                      indexDir: String): IvfMeta = {
    val key = s"${sessionTag(spark)}|$indexDir"
    // "vectors" is in the stamp so an APPEND invalidates the memoized
    // vectors DataFrame, whose file listing is a snapshot: every append
    // adds a `_append-<id>` marker at the vectors dir's TOP level
    // (commitStagedAppend), so the stamp changes on the path SET — two
    // appends inside one mtime tick are still told apart. Rebuilds
    // already changed the centroids listing. The dirs' listStatus is one
    // RPC over ≤ kLists entries. "tombstones" joins the stamp so a
    // delete invalidates the memoized (tombstone-filtered) frame.
    val stamp = sidecarStamp(spark, indexDir,
      Seq("centroids", "vectors", tombstonesName))
    val cached = ivfMetaCache.get(key)
    if (cached != null && cached._1 == stamp) cached._2
    else {
      val m = IvfMeta(readCentroids(spark, indexDir),
        antiTombstoned(spark, indexDir,
          spark.read.parquet(s"$indexDir/vectors")))
      capCache(ivfMetaCache)
      ivfMetaCache.put(key, (stamp, m))
      m
    }
  }

  /** QUERY a built IVF index: read the centroid sidecar, pick the `nprobe`
    * nearest lists, and rerank exactly by cosine over a partition-PRUNED
    * read of just those list directories. No training, no full scan —
    * the serving-path counterpart of [[ivfBuild]].
    *
    * `nprobe` defaults to 8 = kLists/2 at the default kLists: measured
    * recall@10 ≈ 0.8 on the natural test corpus (vs ≈ 0.62 at nprobe 4,
    * for half the probed read) — the LlmSpec recall gate pins ≥ 0.8 so
    * the default can't silently regress. Scale both together: recall
    * tracks the PROBED FRACTION nprobe/kLists, so a 100 TB corpus with
    * kLists grown to √N keeps its recall by holding the ratio. */
  def ivfQuery(spark: org.apache.spark.sql.SparkSession, indexDir: String,
               query: Seq[Double], k: Int, nprobe: Int = 8): DataFrame = {
    val idx = ivfMeta(spark, indexDir)
    // mirror lshQuery's guard: a LONGER query would run nearestLists off
    // the end of every centroid (AIOOBE), a SHORTER one would silently
    // truncate the centroid-distance loop and return garbage lists
    require(query.size == idx.centroids.head.length,
      s"ivfQuery: query dim ${query.size} != index dim ${idx.centroids.head.length}")
    val probeLists = nearestLists(idx.centroids, query.toArray, nprobe)
    rerank(idx.vectors.filter(col("list").isin(probeLists: _*)), query, k)
  }

  /** FILTERED top-k against a built IVF index: `pred` (a predicate over
    * the index's columns — id and any metadata columns the build
    * carried) applies BEFORE the top-k heap, and PUSHES INTO the pruned
    * parquet read (a plain column predicate lands in PushedFilters, so
    * row groups the metadata excludes never decompress). The retrieval
    * serving shape "nearest k docs WHERE lang = 'en'".
    *
    * RECALL CAVEAT, and the widening loop that answers it: filtering
    * shrinks the candidate set — the `nprobe` nearest lists may hold
    * fewer than k ELIGIBLE rows even when the unfiltered probe is well
    * tuned. The probe doubles `nprobe` until k eligible candidates
    * survive or every list is probed, so a selective predicate degrades
    * gracefully toward the EXACT filtered scan instead of silently
    * returning short/far results. Each widening step costs one pruned
    * read (survivor count); the common case returns in one. */
  def ivfQueryFiltered(spark: org.apache.spark.sql.SparkSession,
                       indexDir: String, query: Seq[Double], k: Int,
                       pred: Column, nprobe: Int = 8): DataFrame = {
    val idx = ivfMeta(spark, indexDir)
    require(query.size == idx.centroids.head.length,
      s"ivfQueryFiltered: query dim ${query.size} != index dim ${idx.centroids.head.length}")
    val kLists = idx.centroids.length
    var probe = math.min(math.max(1, nprobe), kLists)
    while (true) {
      val lists = nearestLists(idx.centroids, query.toArray, probe)
      val res = rerank(
        idx.vectors.filter(col("list").isin(lists: _*)).filter(pred),
        query, k)
      // ONE job per widening round: the ≤k answer rows ARE the
      // satisfied-count — collect them and decide, returning a local
      // frame (the batch variant's posture). The old count-then-return
      // ran the pruned scoring twice in the satisfied case and once
      // more per widening round.
      val rows = res.collect()
      if (probe >= kLists || rows.length >= k)
        return localFrame(spark, rows, res.schema)
      probe = math.min(probe * 2, kLists)
    }
    throw new IllegalStateException("unreachable")
  }

  /** Indexed cosine RANGE search against a built IVF index: every id with
    * `cos >= minCos` among the `nprobe` nearest lists — the IVF sibling
    * of [[lshRange]], completing the serving matrix (top-k / range ×
    * brute / ivf / lsh). The probe reads only its lists via partition
    * pruning and EXACT-verifies the threshold on the candidates, so
    * precision is exact and recall is bounded by the probed lists (a
    * neighbor assigned to an unprobed list is missed — the same recall
    * contract as [[ivfQuery]], tuned by the same `nprobe` knob;
    * `nprobe = kLists` degenerates to the exact full scan). Unlike the
    * top-k probe there is no heap and no aggregation: one map-only
    * filter scan of the pruned read, so serving cost tracks
    * `nprobe/kLists` of the corpus regardless of how many rows pass. */
  def ivfRange(spark: org.apache.spark.sql.SparkSession, indexDir: String,
               query: Seq[Double], minCos: Double, nprobe: Int = 8): DataFrame = {
    require(minCos > -1.0 && minCos <= 1.0,
      s"ivfRange: minCos must be in (-1, 1], got $minCos")
    val idx = ivfMeta(spark, indexDir)
    require(query.size == idx.centroids.head.length,
      s"ivfRange: query dim ${query.size} != index dim ${idx.centroids.head.length}")
    val probeLists = nearestLists(idx.centroids, query.toArray, nprobe)
    val qLit = array(query.map(lit): _*)
    idx.vectors.filter(col("list").isin(probeLists: _*))
      .select(col("id"), round(cosine(col("v"), qLit), 6).as("cos"))
      .filter(col("cos").isNotNull && !isnan(col("cos")) &&
        col("cos") >= minCos)
  }

  /** FILTERED indexed range search: [[ivfRange]] with the predicate
    * pushed into the pruned read. Unlike the filtered top-k probes there
    * is NO widening loop to need — a range answer has no k to satisfy,
    * precision stays exact (the threshold verify), and recall is the
    * same probed-lists contract as the unfiltered probe (the predicate
    * only removes rows, never changes which lists hold the survivors). */
  def ivfRangeFiltered(spark: org.apache.spark.sql.SparkSession,
                       indexDir: String, query: Seq[Double], minCos: Double,
                       pred: Column, nprobe: Int = 8): DataFrame = {
    require(minCos > -1.0 && minCos <= 1.0,
      s"ivfRangeFiltered: minCos must be in (-1, 1], got $minCos")
    val idx = ivfMeta(spark, indexDir)
    require(query.size == idx.centroids.head.length,
      s"ivfRangeFiltered: query dim ${query.size} != index dim ${idx.centroids.head.length}")
    val probeLists = nearestLists(idx.centroids, query.toArray, nprobe)
    val qLit = array(query.map(lit): _*)
    idx.vectors.filter(col("list").isin(probeLists: _*)).filter(pred)
      .select(col("id"), round(cosine(col("v"), qLit), 6).as("cos"))
      .filter(col("cos").isNotNull && !isnan(col("cos")) &&
        col("cos") >= minCos)
  }

  /** Ad-hoc (index-less) IVF range search for IN-MEMORY corpora: train
    * the coarse quantizer (deterministic, as [[ivfTopK]]), assign in the
    * same plan, keep the `nprobe` nearest lists, exact-verify the
    * threshold. One full corpus pass per call — a serving path should
    * [[ivfBuild]] once and [[ivfRange]] against the pruned layout.
    * Same probed-lists recall contract as [[ivfRange]] at equal params. */
  def ivfRangeAdhoc(df: DataFrame, idCol: String, vecCol: String,
                    query: Seq[Double], minCos: Double, kLists: Int = 16,
                    nprobe: Int = 8, trainSample: Int = 2048): DataFrame = {
    require(minCos > -1.0 && minCos <= 1.0,
      s"ivfRangeAdhoc: minCos must be in (-1, 1], got $minCos")
    val centroids = trainCentroids(df, idCol, vecCol, kLists, trainSample)
    val probeLists = nearestLists(centroids, query.toArray, nprobe)
    val qLit = array(query.map(lit): _*)
    ivfAssign(df, idCol, vecCol, centroids)
      .filter(col("list").isin(probeLists: _*))
      .select(col("id"), round(cosine(col("v"), qLit), 6).as("cos"))
      .filter(col("cos").isNotNull && !isnan(col("cos")) &&
        col("cos") >= minCos)
  }

  /** QUERY a built IVF index with a BATCH of query vectors in ONE pruned
    * corpus pass — the indexed serving shape for query streams: one read
    * over the UNION of all queries' probe lists, each vector scored
    * against the whole query matrix via the native
    * [[graft.functions.MatVecDots]], a per-row membership filter keeping
    * each query's candidates to ITS OWN nprobe lists (so results are
    * row-for-row identical to a [[ivfQuery]] per query), and a bounded-
    * heap [[graft.functions.TopKF]] top-k per query — the only shuffle
    * carries ≤ partitions × |queries| × k rows, exactly like
    * [[bruteForceTopKBatch]]. Returns (qid, id, cos).
    *
    * Same plan-literal bound as [[bruteForceTopKBatch]]: batches beyond
    * `chunkSize` split into independent chunk plans (each with its own
    * pruned union read over just ITS queries' probe lists — often TIGHTER
    * pruning than one giant union) and the results union; per-query
    * answers are unchanged. The centroid sidecar re-read per chunk is
    * kLists × dim doubles — noise. */
  def ivfQueryBatch(spark: org.apache.spark.sql.SparkSession, indexDir: String,
                    queries: Seq[(Long, Seq[Double])], k: Int,
                    nprobe: Int = 8, chunkSize: Int = 256): DataFrame = {
    require(queries.nonEmpty, "ivfQueryBatch: empty query batch")
    val dims = queries.map(_._2.size).distinct
    require(dims.size == 1, s"ivfQueryBatch: ragged query dims $dims")
    require(chunkSize > 0, "ivfQueryBatch: chunkSize must be positive")
    if (queries.size > chunkSize)
      return queries.grouped(chunkSize)
        .map(c => ivfQueryBatch(spark, indexDir, c, k, nprobe, chunkSize))
        .reduce(_ unionByName _)
    val idx = ivfMeta(spark, indexDir)
    // same guard as lshQueryBatch: without it a longer query dies with an
    // AIOOBE in nearestLists (an error class serving streams don't catch)
    // and a shorter one silently truncates the centroid loop
    require(dims.head == idx.centroids.head.length,
      s"ivfQueryBatch: query dim ${dims.head} != index dim ${idx.centroids.head.length}")
    val probeLists = queries.map { case (_, q) =>
      nearestLists(idx.centroids, q.toArray, nprobe)
    }
    val allLists = probeLists.flatten.distinct
    ProbeStats.record("ivf", queries.size, nprobe, nprobe, 0)
    scoreIvfGroup(
      idx.vectors.filter(col("list").isin(allLists: _*)), // pruned union read
      queries, probeLists, k)
  }

  /** RANGE probe of a built IVF index for a BATCH of queries in ONE
    * pruned corpus pass — the range member of the batched serving matrix,
    * mirroring [[ivfQueryBatch]]: one read over the UNION of all queries'
    * nprobe lists, every vector scored against the whole query matrix
    * via the native [[graft.functions.MatVecDots]], a per-row membership
    * filter keeping each query's candidates to ITS OWN lists (batch ≡
    * per-query [[ivfRange]]), then the exact threshold verify. NO top-k
    * heap and NO aggregation: the output (qid, id, cos) is map-only
    * after the pruned read, so the plan has no shuffle at all. Same
    * `chunkSize` plan-literal bound as every batch entry point. */
  def ivfRangeBatch(spark: org.apache.spark.sql.SparkSession, indexDir: String,
                    queries: Seq[(Long, Seq[Double])], minCos: Double,
                    nprobe: Int = 8, chunkSize: Int = 256): DataFrame = {
    require(queries.nonEmpty, "ivfRangeBatch: empty query batch")
    require(minCos > -1.0 && minCos <= 1.0,
      s"ivfRangeBatch: minCos must be in (-1, 1], got $minCos")
    val dims = queries.map(_._2.size).distinct
    require(dims.size == 1, s"ivfRangeBatch: ragged query dims $dims")
    require(chunkSize > 0, "ivfRangeBatch: chunkSize must be positive")
    if (queries.size > chunkSize)
      return queries.grouped(chunkSize)
        .map(c => ivfRangeBatch(spark, indexDir, c, minCos, nprobe, chunkSize))
        .reduce(_ unionByName _)
    val idx = ivfMeta(spark, indexDir)
    require(dims.head == idx.centroids.head.length,
      s"ivfRangeBatch: query dim ${dims.head} != index dim ${idx.centroids.head.length}")
    val probeLists = queries.map { case (_, q) =>
      nearestLists(idx.centroids, q.toArray, nprobe)
    }
    val allLists = probeLists.flatten.distinct
    ProbeStats.record("ivf_range", queries.size, nprobe, nprobe, 0)
    scoreIvfRangeGroup(
      idx.vectors.filter(col("list").isin(allLists: _*)),
      queries, probeLists, minCos)
  }

  /** Ad-hoc (index-less) batched IVF range for IN-MEMORY corpora: train
    * + assign in-plan (as [[ivfTopKBatch]]), score through the shared
    * range tail. One full corpus pass per call. */
  def ivfRangeAdhocBatch(df: DataFrame, idCol: String, vecCol: String,
                         queries: Seq[(Long, Seq[Double])], minCos: Double,
                         kLists: Int = 16, nprobe: Int = 8,
                         trainSample: Int = 2048,
                         chunkSize: Int = 256): DataFrame = {
    require(queries.nonEmpty, "ivfRangeAdhocBatch: empty query batch")
    require(minCos > -1.0 && minCos <= 1.0,
      s"ivfRangeAdhocBatch: minCos must be in (-1, 1], got $minCos")
    val dims = queries.map(_._2.size).distinct
    require(dims.size == 1, s"ivfRangeAdhocBatch: ragged query dims $dims")
    val centroids = trainCentroids(df, idCol, vecCol, kLists, trainSample)
    val assigned = ivfAssign(df, idCol, vecCol, centroids)
    queries.grouped(chunkSize).map { chunk =>
      val probeLists = chunk.map { case (_, q) =>
        nearestLists(centroids, q.toArray, nprobe)
      }
      val allLists = probeLists.flatten.distinct
      scoreIvfRangeGroup(assigned.filter(col("list").isin(allLists: _*)),
        chunk, probeLists, minCos)
    }.reduce(_ unionByName _)
  }

  /** [[ivfRangeBatch]] through the fingerprint-fenced cached-index
    * lifecycle — same params string as every ivf-indexed entry point, so
    * one build serves single/batch top-k and range alike. */
  def ivfRangeBatchIndexed(df: DataFrame, idCol: String, vecCol: String,
                           cacheKey: String, queries: Seq[(Long, Seq[Double])],
                           minCos: Double, kLists: Int = 16, nprobe: Int = 8,
                           trainSample: Int = 2048): DataFrame = {
    require(queries.nonEmpty, "ivfRangeBatchIndexed: empty query batch")
    require(queries.map(_._2.size).distinct.size == 1,
      s"ivfRangeBatchIndexed: ragged query dims ${queries.map(_._2.size).distinct}")
    val dir = cachedIndex(df, cacheKey, s"ivf|k=$kLists|t=$trainSample",
      Some((newRows, d) => ivfAppend(newRows, idCol, vecCol, d))) { d =>
      ivfBuild(df, idCol, vecCol, d, kLists, trainSample); ()
    }
    ivfRangeBatch(df.sparkSession, dir, queries, minCos, nprobe)
  }

  /** The shared scoring tail of the batched IVF RANGE paths: per-row
    * [[graft.functions.MatVecDots]] against the group's query matrix, a
    * per-query probe-list membership filter (pure column math — batch ≡
    * per-query [[ivfRange]]), then the exact `cos >= minCos` verify.
    * Unlike [[scoreIvfGroup]] there is no heap and no groupBy: the
    * answer is a map-only projection of the pruned read. */
  private def scoreIvfRangeGroup(vecs: DataFrame,
                                 queries: Seq[(Long, Seq[Double])],
                                 probeLists: Seq[Seq[Int]],
                                 minCos: Double): DataFrame = {
    import graft.functions.{MatVecF, VectorF}
    val qNorms = queries.map { case (_, q) => math.sqrt(q.map(x => x * x).sum) }
    val qIds = queries.map(_._1)
    val probeLit = array(probeLists.map(ls => array(ls.map(lit): _*)): _*)
    vecs
      .withColumn("vnorm", VectorF.norm(col("v")))
      .filter(col("vnorm").isNotNull && !isnan(col("vnorm")) && col("vnorm") > 0)
      .select(col("id"), col("list"), col("vnorm"),
        posexplode(MatVecF.dots(col("v"), queries.map(_._2))))
      .filter(array_contains(element_at(probeLit, col("pos") + 1), col("list")))
      .select(element_at(array(qIds.map(lit): _*), col("pos") + 1).as("qid"),
        col("id"),
        round(col("col") / (col("vnorm") *
          element_at(array(qNorms.map(lit): _*), col("pos") + 1)), 6).as("cos"))
      .filter(col("cos").isNotNull && !isnan(col("cos")) &&
        col("cos") >= minCos)
  }

  /** The shared matrix-scoring tail of the batched IVF paths (indexed
    * [[ivfQueryBatch]] and ad-hoc [[ivfTopKBatch]]): score one group of
    * queries against a candidate frame carrying (id, v, list) — per-row
    * [[graft.functions.MatVecDots]] against the group's query matrix, a
    * per-query probe-list membership filter (pure column math, no join:
    * batch ≡ per-query [[ivfQuery]]), degenerate-query exclusion exactly
    * as in [[bruteForceTopKBatch]], and the bounded-heap top-k per
    * query. Returns (qid, id, cos). */
  private def scoreIvfGroup(vecs: DataFrame, queries: Seq[(Long, Seq[Double])],
                            probeLists: Seq[Seq[Int]], k: Int): DataFrame = {
    import graft.functions.{MatVecF, TopKF, VectorF}
    val qNorms = queries.map { case (_, q) => math.sqrt(q.map(x => x * x).sum) }
    val qIds = queries.map(_._1)
    val probeLit = array(probeLists.map(ls => array(ls.map(lit): _*)): _*)
    val scored = vecs
      .withColumn("vnorm", VectorF.norm(col("v")))
      .filter(col("vnorm").isNotNull && !isnan(col("vnorm")) && col("vnorm") > 0)
      .select(col("id"), col("list"), col("vnorm"),
        posexplode(MatVecF.dots(col("v"), queries.map(_._2))))
      .filter(array_contains(element_at(probeLit, col("pos") + 1), col("list")))
      .select(col("pos"),
        round(col("col") / (col("vnorm") *
          element_at(array(qNorms.map(lit): _*), col("pos") + 1)), 6).as("cos"),
        col("id"))
      .filter(col("cos").isNotNull && !isnan(col("cos")))
    scored
      .groupBy("pos")
      .agg(TopKF.topKByScore(col("cos"), col("id"), k).as("topk"))
      .select(element_at(array(qIds.map(lit): _*), col("pos") + 1).as("qid"),
        explode(col("topk")).as("hit"))
      .select(col("qid"), col("hit.id").as("id"), col("hit.score").as("cos"))
  }

  /** Ad-hoc (index-less) IVF ANN top-k for a BATCH of queries: train the
    * coarse quantizer once (deterministic, as [[ivfTopK]]), assign in the
    * same plan, and score every chunk through the shared
    * [[scoreIvfGroup]] tail. For one-shot exploration and IN-MEMORY
    * corpora — no index dir, nothing cached, one full corpus pass per
    * call; a serving path should [[ivfBuild]] once and [[ivfQueryBatch]]
    * against the partition-pruned layout instead. Returns (qid, id,
    * cos), row-identical to an [[ivfTopK]] per query at equal params. */
  def ivfTopKBatch(df: DataFrame, idCol: String, vecCol: String,
                   queries: Seq[(Long, Seq[Double])], k: Int,
                   kLists: Int = 16, nprobe: Int = 8,
                   trainSample: Int = 2048, chunkSize: Int = 256): DataFrame = {
    require(queries.nonEmpty, "ivfTopKBatch: empty query batch")
    val dims = queries.map(_._2.size).distinct
    require(dims.size == 1, s"ivfTopKBatch: ragged query dims $dims")
    require(chunkSize > 0, "ivfTopKBatch: chunkSize must be positive")
    val centroids = trainCentroids(df, idCol, vecCol, kLists, trainSample)
    require(dims.head == centroids.head.length,
      s"ivfTopKBatch: query dim ${dims.head} != corpus dim ${centroids.head.length}")
    val assigned = ivfAssign(df, idCol, vecCol, centroids)
    queries.grouped(chunkSize).map { chunk =>
      val probeLists = chunk.map { case (_, q) =>
        nearestLists(centroids, q.toArray, nprobe)
      }
      val allLists = probeLists.flatten.distinct
      scoreIvfGroup(assigned.filter(col("list").isin(allLists: _*)),
        chunk, probeLists, k)
    }.reduce(_ unionByName _)
  }

  /** One-per-process index registry for [[ivfTopKIndexed]]: the first call
    * for a corpus key pays the [[ivfBuild]]; every later call (warm bench
    * passes, repeated serving queries) is a pruned [[ivfQuery]] probe.
    * Entries carry a (corpus fingerprint, build params) stamp — a stamp
    * mismatch on a later call triggers a rebuild, so a corpus regenerated
    * under the same path/key can never silently serve a stale index.
    * This is the train-once-at-ingest lifecycle inside one process. */
  /** One cache slot: the (fingerprint | params) stamp plus a LAZY index
    * dir — the heavy Spark build runs on first `.dir` access, OUTSIDE the
    * ConcurrentHashMap bin lock (running it inside `compute` would block
    * unrelated keys hashing to the same bin for the build's duration and
    * deadlock any reentrant map access). The lazy val's own monitor still
    * serializes concurrent first probes of the SAME key, and a build that
    * throws is retried on the next access (Scala lazy vals don't cache
    * failures). */
  private final class IndexSlot(val stamp: String,
                                val files: Map[String, (Long, Long)],
                                val baseFileCount: Int,
                                mk0: () => String) {
    // once-memo that RELEASES the thunk after forcing: a plain
    // `lazy val dir = mk()` keeps `mk` as a field forever, and each
    // append-path slot's thunk captures the PREVIOUS slot plus the
    // call's DataFrame — a long-running serving process appending daily
    // would otherwise retain an unbounded slot/plan chain per cacheKey
    // until the rebuild-factor retrain
    private[this] var thunk: () => String = mk0
    private[this] var computed: String = _
    def dir: String = synchronized {
      if (thunk != null) { computed = thunk(); thunk = null }
      computed
    }
  }

  private val indexCache =
    new java.util.concurrent.ConcurrentHashMap[String, IndexSlot]()

  // Temp-dir indexes created by ivfTopKIndexed, deleted at JVM exit —
  // without this, one directory leaked per corpus key per process.
  private val tempIndexDirs = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]())
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      tempIndexDirs.forEach { d =>
        try {
          val root = java.nio.file.Paths.get(d)
          if (java.nio.file.Files.exists(root))
            java.nio.file.Files.walk(root)
              .sorted(java.util.Comparator.reverseOrder())
              .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
        } catch { case scala.util.control.NonFatal(_) => () }
      }
    }))
  }

  /** Corpus fingerprint from the plan's input files: (path, length, mtime)
    * per file, hashed — driver-side FS metadata only, no data read. A
    * regenerated file (new name, new size, or new mtime) changes the
    * fingerprint. Statuses come from ONE `listStatus` RPC per PARENT
    * DIRECTORY, not one `getFileStatus` per file — a 10⁵-file corpus under
    * a handful of partition dirs costs a handful of RPCs instead of
    * minutes of sequential per-file round-trips on every indexed call.
    * (Files the listing somehow misses — e.g. a path qualified differently
    * than its directory listing renders it — fall back to a per-file
    * stat.) A corpus with no file-backed scan (pure in-memory data)
    * fingerprints empty — callers there must vary `cacheKey` on data
    * change. */
  private[llm] def corpusFileMeta(df: DataFrame): Seq[(String, (Long, Long))] = {
    val hconf = df.sparkSession.sessionState.newHadoopConf()
    val files = df.inputFiles.sorted
    val byParent = files.groupBy(f => new org.apache.hadoop.fs.Path(f).getParent)
    val listed: Map[String, (Long, Long)] = byParent.keysIterator.flatMap { parent =>
      val fs = parent.getFileSystem(hconf)
      try fs.listStatus(parent).iterator.map(st =>
        st.getPath.toString -> (st.getLen, st.getModificationTime))
      catch { case _: java.io.FileNotFoundException => Iterator.empty }
    }.toMap
    files.iterator.map { f =>
      f -> listed.getOrElse(f, {
        val p = new org.apache.hadoop.fs.Path(f)
        val st = p.getFileSystem(hconf).getFileStatus(p)
        (st.getLen, st.getModificationTime)
      })
    }.toSeq
  }

  /** Total bytes of the file-backed corpus's input files — the size a
    * caller gates an index-build side effect on (one listing per input
    * dir, no data read). */
  private[graft] def corpusInputBytes(df: DataFrame): Long =
    corpusFileMeta(df).iterator.map(_._2._1).sum

  private[llm] def corpusFingerprint(df: DataFrame): String =
    graft.util.Md5.hex(corpusFileMeta(df).iterator.map {
      case (f, (len, mtime)) => s"$f:$len:$mtime;"
    })

  /** Where the `*TopKIndexed` entry points materialize an index (IVF and
    * LSH alike): under the configured `graft.ivf.indexBase` (a qualified
    * URI on the shared filesystem — REQUIRED for any non-local
    * deployment, where a driver-local temp dir would resolve against a
    * different filesystem than the executors' parquet IO), else a local
    * temp dir registered for cleanup at exit — a local-mode convenience
    * only. The shared-base dir name hashes the cacheKey AND the full
    * (corpus fingerprint | params) stamp: a rebuild after a corpus or
    * param change lands in a NEW directory instead of swapping the one
    * in-flight readers are probing, and two processes sharing the base
    * only ever write the same dir when key, corpus, and params all agree
    * — in which case their staged commits produce identical content.
    * Superseded stamp dirs are not garbage-collected here (ops can list
    * the base by mtime); serving deployments should still prefer the
    * explicit build + query pairs with a durable indexDir. */
  private def newIndexDir(spark: org.apache.spark.sql.SparkSession,
                          cacheKey: String, stamp: String): String =
    spark.conf.getOption("graft.ivf.indexBase") match {
      case Some(base) =>
        def h(s: String): String = graft.util.Md5.hex(s).take(16)
        s"$base/idx-${h(cacheKey)}-${h(stamp)}"
      case None =>
        val d = java.nio.file.Files.createTempDirectory("graft-ivf-index").toString
        tempIndexDirs.add(d)
        s"$d/index"
    }

  /** An appended corpus may grow this much (in FILES, the granularity the
    * fingerprint sees) past its last FULL build before the cache retrains
    * from scratch instead of appending again: for IVF the centroids drift
    * away from the grown distribution (recall degrades once a large
    * fraction of the data post-dates training); for LSH appends are exact
    * forever but each one adds part files, so the rebuild is a compaction.
    * 1.5 ≈ "retrain once a third of the corpus post-dates the quantizer". */
  private val appendRebuildFactor = 1.5

  /** True when `df`'s plan is a chain of deterministic Project/Filter over
    * ONE file-backed relation — the shape where "rows from new input
    * files" is exactly "new output rows", so an index append over just
    * those files equals a full rebuild. Joins, aggregates, limits, or
    * nondeterministic expressions disqualify (appended files could change
    * or reorder OLD output rows there). */
  private def appendSafePlan(df: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project, SubqueryAlias}
    def ok(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean = p match {
      case _: org.apache.spark.sql.execution.datasources.LogicalRelation => true
      // parquet resolves through DSv2 on deployments that exclude it from
      // spark.sql.sources.useV1SourceList — same file-scan semantics,
      // same append safety
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
        r.table.isInstanceOf[org.apache.spark.sql.execution.datasources.v2.FileTable]
      case p: Project       => p.projectList.forall(_.deterministic) && ok(p.child)
      case f: Filter        => f.condition.deterministic && ok(f.child)
      case s: SubqueryAlias => ok(s.child)
      case _                => false
    }
    ok(df.queryExecution.analyzed)
  }

  // input_file_name() renders local paths as file:///p while
  // FileIndex-derived inputFiles render file:/p — normalize both sides
  // before comparing (hdfs:// and s3a:// render identically already)
  private def normFileUri(s: String): String = s.replaceFirst("^file:/+", "file:/")

  /** Build-once/probe-many resolution against [[indexCache]]: returns the
    * index dir for `cacheKey`, running `build` only when the key is new or
    * its (corpus fingerprint | build params) stamp changed. The map
    * `compute` only INSTALLS the slot (cheap); the build itself runs via
    * the slot's lazy dir, outside the map's bin lock.
    *
    * APPEND fencing: when the fingerprint changed because files were ADDED
    * to the corpus — every previously-indexed file still present with the
    * same (length, mtime) — and the plan is append-safe
    * ([[appendSafePlan]]), the slot runs `append` over JUST the new files
    * against the EXISTING index dir instead of a full retrain + rewrite:
    * the dominant ingest pattern (daily appends) updates the index in
    * place. Readers are safe (append never removes a file a resolved
    * DataFrame references), and the slot's stamp advances to the new
    * fingerprint, so the next unchanged call is a pure cache hit. Past
    * [[appendRebuildFactor]] growth since the last FULL build the cache
    * retrains from scratch (IVF centroid drift / LSH part-file
    * compaction). Cross-process note: an appended dir keeps its
    * original stamp-hashed NAME, so a second process computing the new
    * fingerprint builds its own fresh dir rather than sharing — correct,
    * just unshared; long-lived serving deployments should prefer the
    * explicit build/append/query lifecycle on a durable indexDir. */
  private[llm] def cachedIndex(df: DataFrame, cacheKey: String, paramStamp: String,
                          append: Option[(DataFrame, String) => Unit] = None)
                         (build: String => Unit): String = {
    val fileMeta = corpusFileMeta(df)
    val fileMap = fileMeta.toMap
    val stamp = graft.util.Md5.hex(fileMeta.iterator.map {
      case (f, (len, mtime)) => s"$f:$len:$mtime;"
    }) + s"|$paramStamp"
    val spark = df.sparkSession
    indexCache.compute(cacheKey, (_, prev) =>
      if (prev != null && prev.stamp == stamp) prev
      else {
        val grownInPlace = prev != null && append.isDefined &&
          prev.stamp.endsWith(s"|$paramStamp") &&
          prev.files.nonEmpty && fileMap.size > prev.files.size &&
          prev.files.forall { case (f, m) => fileMap.get(f).contains(m) }
        val canAppend = grownInPlace &&
          fileMap.size <= prev.baseFileCount * appendRebuildFactor &&
          appendSafePlan(df)
        if (canAppend) {
          val newFiles = (fileMap.keySet -- prev.files.keySet).toSeq
            .map(normFileUri)
          val prevSlot = prev
          new IndexSlot(stamp, fileMap, prev.baseFileCount, () => {
            val d = prevSlot.dir // force the previous build first
            val newRows = df.filter(
              regexp_replace(input_file_name(), "^file:/+", "file:/")
                .isin(newFiles: _*))
            append.get(newRows, d)
            d
          })
        } else {
          // make the append path's ABSENCE diagnosable: a corpus that
          // grew by pure file addition but still retrains should say why
          if (grownInPlace)
            log.debug(s"cachedIndex[$cacheKey]: grown corpus NOT appended (" +
              (if (fileMap.size > prev.baseFileCount * appendRebuildFactor)
                 s"file growth ${fileMap.size}/${prev.baseFileCount} past " +
                   s"rebuild factor $appendRebuildFactor"
               else "plan not append-safe") + "); retraining from scratch")
          new IndexSlot(stamp, fileMap, fileMap.size, () => {
            val d = newIndexDir(spark, cacheKey, stamp)
            build(d)
            // optional retention sweep after a successful rebuild: every
            // corpus/param change — and every threshold retrain — strands
            // the previous stamp dir otherwise. Scoped to THIS key's hash;
            // `graft.ivf.gcKeep` generations survive (>= 2 keeps the dir
            // in-flight readers of the superseded index may still probe).
            spark.conf.getOption("graft.ivf.gcKeep").foreach { keep =>
              spark.conf.getOption("graft.ivf.indexBase").foreach { base =>
                // default the hidden-dir age guard to the CLI's hour:
                // a 0 guard would let this sweep race ANOTHER session's
                // in-flight staged build under the shared indexBase
                val minAge = spark.conf.getOption("graft.ivf.gcMinAgeMs")
                  .map(_.toLong).getOrElse(3600000L)
                graft.tools.IndexGc.sweep(spark, base, keep.toInt, minAge,
                  Some(graft.util.Md5.hex(cacheKey).take(16)))
              }
            }
            d
          })
        }
      }).dir
  }

  /** IVF ANN top-k against a cached index keyed by `cacheKey` (use the
    * corpus path + construction name). Builds on first use; probes after.
    * Rebuilds — not serves stale — when the corpus input files or the
    * build parameters (`kLists`, `trainSample`) change under the same key.
    * `nprobe` is a pure query-time parameter and never forces a rebuild. */
  def ivfTopKIndexed(df: DataFrame, idCol: String, vecCol: String, cacheKey: String,
                     query: Seq[Double], k: Int, kLists: Int = 16,
                     nprobe: Int = 8, trainSample: Int = 2048): DataFrame = {
    val dir = cachedIndex(df, cacheKey, s"ivf|k=$kLists|t=$trainSample",
      Some((newRows, d) => ivfAppend(newRows, idCol, vecCol, d))) { d =>
      ivfBuild(df, idCol, vecCol, d, kLists, trainSample); ()
    }
    ivfQuery(df.sparkSession, dir, query, k, nprobe)
  }

  /** [[ivfQueryFiltered]] through the fingerprint-fenced cached-index
    * lifecycle: first call per key pays an [[ivfBuild]] that CARRIES
    * `metaCols` into the layout; later calls are widening pruned probes.
    * metaCols participate in the param stamp (an index without them
    * cannot serve the predicate), so filtered and plain serving of one
    * corpus are distinct cached indexes by construction. */
  def ivfTopKFilteredIndexed(df: DataFrame, idCol: String, vecCol: String,
                             cacheKey: String, query: Seq[Double], k: Int,
                             pred: Column, metaCols: Seq[String],
                             kLists: Int = 16, nprobe: Int = 8,
                             trainSample: Int = 2048): DataFrame = {
    val dir = cachedIndex(df, cacheKey,
      s"ivf|k=$kLists|t=$trainSample|m=${metaCols.mkString(",")}",
      Some((newRows, d) => ivfAppend(newRows, idCol, vecCol, d))) { d =>
      ivfBuild(df, idCol, vecCol, d, kLists, trainSample, metaCols); ()
    }
    ivfQueryFiltered(df.sparkSession, dir, query, k, pred, nprobe)
  }

  /** BATCH filtered top-k against a built IVF index — [[ivfQueryFiltered]]
    * for a query stream: each round scores ALL still-unsatisfied queries
    * in ONE pred-filtered pruned pass (the [[ivfQueryBatch]] machinery:
    * list-pruned union read, native MatVecDots, per-query membership
    * filter, bounded-heap top-k), finalizes every query with k eligible
    * survivors (or a full-width probe), and doubles the probe width for
    * the rest. Per-query answers equal [[ivfQueryFiltered]] at the same
    * starting `nprobe` — the widening schedule is identical. Results are
    * ≤ |queries| × k rows, collected per round (the same driver-size
    * bound as every batch entry point's output). Returns (qid, id, cos),
    * qid-then-rank ordered. */
  def ivfQueryBatchFiltered(spark: org.apache.spark.sql.SparkSession,
                            indexDir: String, queries: Seq[(Long, Seq[Double])],
                            k: Int, pred: Column, nprobe: Int = 8,
                            chunkSize: Int = 256): DataFrame = {
    require(queries.nonEmpty, "ivfQueryBatchFiltered: empty query batch")
    val dims = queries.map(_._2.size).distinct
    require(dims.size == 1, s"ivfQueryBatchFiltered: ragged query dims $dims")
    require(chunkSize > 0, "ivfQueryBatchFiltered: chunkSize must be positive")
    // results are keyed by QID here (the widening loop tracks per-query
    // satisfaction) — a duplicated qid would conflate two queries'
    // candidate pools and double-emit rows; reject loudly (the serving
    // jobs already drop in-batch duplicates, the pos-keyed unfiltered
    // path tolerates them)
    require(queries.map(_._1).distinct.size == queries.size,
      "ivfQueryBatchFiltered: duplicate qids in one batch")
    val idx = ivfMeta(spark, indexDir)
    require(dims.head == idx.centroids.head.length,
      s"ivfQueryBatchFiltered: query dim ${dims.head} != index dim ${idx.centroids.head.length}")
    val kLists = idx.centroids.length
    val eligible = idx.vectors.filter(pred)
    val acc = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    var pending = queries
    var width = math.min(math.max(1, nprobe), kLists)
    val widthStart = width
    var widthUsed = width
    var rounds = 0
    while (pending.nonEmpty) {
      widthUsed = width
      rounds += 1
      val rows = pending.grouped(chunkSize).toSeq.flatMap { chunk =>
        val probeLists = chunk.map(q =>
          nearestLists(idx.centroids, q._2.toArray, width))
        // prune the read to THIS round's union of probe lists (the
        // ivfQueryBatch posture) — scoreIvfGroup's per-query membership
        // filter keeps answers identical, but without the partition
        // pruning every widening round re-scanned ALL kLists partitions
        // and the index bought nothing on the filtered path
        val allLists = probeLists.flatten.distinct
        val pruned =
          if (allLists.size >= kLists) eligible
          else eligible.filter(col("list").isin(allLists: _*))
        scoreIvfGroup(pruned, chunk, probeLists, k).collect()
      }
      val byQ = rows.groupBy(_.getLong(0))
      val (done, todo) = pending.partition(q =>
        width >= kLists || byQ.getOrElse(q._1, Seq.empty).size >= k)
      acc ++= done.flatMap(q => byQ.getOrElse(q._1, Seq.empty)
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))))
      pending = todo
      width = math.min(width * 2, kLists)
    }
    ProbeStats.record("ivf_filtered", queries.size, widthStart, widthUsed,
      rounds - 1)
    import spark.implicits._
    acc.toSeq.sortBy { case (qid, id, cos) => (qid, -cos, id) }
      .toDF("qid", "id", "cos")
  }

  /** [[ivfRangeFiltered]] through the cached-index lifecycle — the SAME
    * stamp as [[ivfTopKFilteredIndexed]], so one metadata-carrying build
    * serves filtered top-k and filtered range. */
  def ivfRangeFilteredIndexed(df: DataFrame, idCol: String, vecCol: String,
                              cacheKey: String, query: Seq[Double],
                              minCos: Double, pred: Column,
                              metaCols: Seq[String], kLists: Int = 16,
                              nprobe: Int = 8,
                              trainSample: Int = 2048): DataFrame = {
    val dir = cachedIndex(df, cacheKey,
      s"ivf|k=$kLists|t=$trainSample|m=${metaCols.mkString(",")}",
      Some((newRows, d) => ivfAppend(newRows, idCol, vecCol, d))) { d =>
      ivfBuild(df, idCol, vecCol, d, kLists, trainSample, metaCols); ()
    }
    ivfRangeFiltered(df.sparkSession, dir, query, minCos, pred, nprobe)
  }

  /** Batch counterpart of [[ivfTopKFilteredIndexed]] — same cache stamp,
    * so single and batch filtered serving of one corpus share one
    * metadata-carrying build. */
  def ivfTopKBatchFilteredIndexed(df: DataFrame, idCol: String, vecCol: String,
                                  cacheKey: String,
                                  queries: Seq[(Long, Seq[Double])], k: Int,
                                  pred: Column, metaCols: Seq[String],
                                  kLists: Int = 16, nprobe: Int = 8,
                                  trainSample: Int = 2048): DataFrame = {
    require(queries.nonEmpty, "ivfTopKBatchFilteredIndexed: empty query batch")
    require(queries.map(_._2.size).distinct.size == 1,
      s"ivfTopKBatchFilteredIndexed: ragged query dims ${queries.map(_._2.size).distinct}")
    val dir = cachedIndex(df, cacheKey,
      s"ivf|k=$kLists|t=$trainSample|m=${metaCols.mkString(",")}",
      Some((newRows, d) => ivfAppend(newRows, idCol, vecCol, d))) { d =>
      ivfBuild(df, idCol, vecCol, d, kLists, trainSample, metaCols); ()
    }
    ivfQueryBatchFiltered(df.sparkSession, dir, queries, k, pred, nprobe)
  }

  /** Batch counterpart of [[ivfTopKIndexed]]: resolves the SAME cached
    * index (same cache stamp — single-query and batch calls under one
    * `cacheKey` share one build), then runs the one-pass pruned
    * [[ivfQueryBatch]]. */
  def ivfTopKBatchIndexed(df: DataFrame, idCol: String, vecCol: String,
                          cacheKey: String, queries: Seq[(Long, Seq[Double])],
                          k: Int, kLists: Int = 16, nprobe: Int = 8,
                          trainSample: Int = 2048): DataFrame = {
    val dir = cachedIndex(df, cacheKey, s"ivf|k=$kLists|t=$trainSample",
      Some((newRows, d) => ivfAppend(newRows, idCol, vecCol, d))) { d =>
      ivfBuild(df, idCol, vecCol, d, kLists, trainSample); ()
    }
    ivfQueryBatch(df.sparkSession, dir, queries, k, nprobe)
  }

  /** [[ivfRange]] through the same fingerprint-fenced cached-index
    * lifecycle as [[ivfTopKIndexed]] — identical params string, so a
    * corpus served for top-k and range probes shares ONE build (the
    * lsh twin is [[lshRangeIndexed]]). */
  def ivfRangeIndexed(df: DataFrame, idCol: String, vecCol: String,
                      cacheKey: String, query: Seq[Double], minCos: Double,
                      kLists: Int = 16, nprobe: Int = 8,
                      trainSample: Int = 2048): DataFrame = {
    val dir = cachedIndex(df, cacheKey, s"ivf|k=$kLists|t=$trainSample",
      Some((newRows, d) => ivfAppend(newRows, idCol, vecCol, d))) { d =>
      ivfBuild(df, idCol, vecCol, d, kLists, trainSample); ()
    }
    ivfRange(df.sparkSession, dir, query, minCos, nprobe)
  }

  /** Ad-hoc (index-less) IVF ANN top-k: train, assign, and probe in one
    * plan without materializing an index — for one-shot exploration. A
    * serving path should [[ivfBuild]] once and [[ivfQuery]] per query
    * (or use [[ivfTopKIndexed]]), which replaces this full corpus pass
    * with a partition-pruned read. */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String,
              query: Seq[Double], k: Int, kLists: Int = 16,
              nprobe: Int = 8, trainSample: Int = 2048): DataFrame = {
    val centroids = trainCentroids(df, idCol, vecCol, kLists, trainSample)
    val probeLists = nearestLists(centroids, query.toArray, nprobe)
    rerank(
      ivfAssign(df, idCol, vecCol, centroids).filter(col("list").isin(probeLists: _*)),
      query, k)
  }

  /** Driver-side signature of one query vector under the same fixed-seed
    * plane family as [[lshBuckets]]/[[signature]]. */
  private[llm] def querySignature(query: Seq[Double],
                                  planes: Seq[Seq[Double]]): Long =
    planes.zipWithIndex.map { case (p, i) =>
      val d = p.zip(query).map { case (a, b) => a * b }.sum
      if (d > 0) 1L << i else 0L
    }.reduce(_ | _)

  /** ANN top-k via adaptive multi-probe LSH: start at the query's bucket
    * and expand the probe Hamming radius until at least `minCandidates`
    * vectors are in scope, then rerank by exact cosine.
    *
    * Ad-hoc form — radius selection runs against a ONE-JOB bucket
    * histogram (`groupBy(bucket).count()`, ≤ min(2^nBits, distinct
    * signatures) rows) replayed driver-side, then ONE final filtered
    * signature pass reranks: exactly two corpus passes, where the old
    * expansion loop recomputed the signature pass per radius step (up to
    * 1 + log₂ nBits passes). Radius choice is identical to the loop's —
    * histogram mass within Hamming r IS the loop's candidate count — so
    * results are unchanged. A histogram wider than [[maxHistogramBuckets]]
    * (nBits ≫ 20 over a huge corpus) falls back to the counting loop.
    * The serving path is still [[lshBuild]] + [[lshQuery]] (or
    * [[lshTopKIndexed]]), where probes are partition-PRUNED reads of the
    * built index, not corpus scans. */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
              query: Seq[Double], k: Int, nBits: Int = 16,
              minCandidates: Int = 100): DataFrame = {
    val planes = hyperplanes(nBits, query.size)
    val qSig = querySignature(query, planes)
    val q = array(query.map(lit): _*)
    val bucketed = lshBuckets(df, idCol, vecCol, nBits, query.size)
    val hamming = bit_count(col("bucket").bitwiseXOR(lit(qSig)))
    val hist = bucketed.filter(col("bucket").isNotNull)
      .groupBy("bucket").count()
      .limit(maxHistogramBuckets + 1).collect()
    val histogram =
      if (hist.length <= maxHistogramBuckets)
        Some((hist.map(_.getLong(0)), hist.map(_.getLong(1))))
      else None
    val radius = chooseRadius(histogram, qSig, nBits, minCandidates)(r =>
      bucketed.filter(hamming <= r).limit(minCandidates).count())
    bucketed.filter(hamming <= radius)
      .select(col("id"), round(cosine(col("v"), q), 6).as("cos"))
      // same unscorable-row exclusion as bruteForceTopK (null or NaN cos)
      .filter(col("cos").isNotNull && !isnan(col("cos")))
      .orderBy(col("cos").desc, col("id").asc)
      .limit(k)
  }

  // ---------- LSH index lifecycle (mirrors the IVF one) ----------

  /** BUILD an LSH bucket index at ingest: ONE signature pass over the
    * corpus, written `partitionBy("bucket")` so probes are partition-
    * pruned reads, plus a one-row sidecar recording (n_bits, dim) so a
    * query can never probe with a mismatched plane family. No training —
    * the hyperplanes are a fixed seeded function of (nBits, dim). Commits
    * atomically via the same staged rename as [[ivfBuild]].
    *
    * Signature width and layout granularity are SEPARATE knobs: the
    * partition column is the top `partitionBits` of the signature (up to
    * 2^partitionBits directories — pick it ≈ log₂(corpus / desired
    * rows-per-partition); finer layouts waste the write on tiny files and
    * every probe on directory listings), while the FULL `nBits` signature
    * rides along as a data column for exact Hamming candidate filtering.
    * Prefix pruning is LOSSLESS over the Hamming ball: a signature within
    * Hamming r of the query has ≤ r flips in its prefix too, so the
    * prefix ball is a superset of the probe's partitions. */
  def lshBuild(df: DataFrame, idCol: String, vecCol: String, indexDir: String,
               nBits: Int = 16, dim: Int = 64,
               partitionBits: Int = 8, metaCols: Seq[String] = Nil): Unit = {
    requireValidMetaCols(metaCols, Set("id", "v", "bucket", "pband"), "lshBuild")
    // the hyperplane family is a function of (nBits, dim): a `dim` that
    // doesn't match the corpus would sign EVERY vector as malformed
    // (NULL bucket) and commit a silently-useless index whose probes
    // return zero rows forever — fail the build loudly instead (one
    // first-non-null-row peek; the IVF family's centroid-dim require)
    val sample = df.select(col(vecCol)).filter(col(vecCol).isNotNull)
      .head(1)
    // an empty corpus would commit an index whose vectors dir has no
    // files — every later read dies on parquet schema inference with an
    // unrelated-looking error (the lshAppend explicit-schema lesson);
    // fail the build with the real reason
    require(sample.nonEmpty,
      "lshBuild: corpus has no non-null vectors — refusing to commit an " +
        "empty index (bootstrap from a non-empty backfill)")
    val got = sample.head.getSeq[Any](0).size
    require(got == dim,
      s"lshBuild: corpus vector dim $got != configured dim $dim — " +
        "probes over a mismatched hyperplane family would silently " +
        "return nothing")
    val pBits = math.min(partitionBits, nBits)
    val sess = df.sparkSession
    stagedCommit(sess, indexDir) { staging =>
      clusteredWrite(
        lshBuckets(df, idCol, vecCol, nBits, dim, metaCols)
          .withColumn("pband", shiftrightunsigned(col("bucket"), nBits - pBits)),
        "pband", 1 << pBits)
        .write.mode("overwrite").partitionBy("pband").parquet(s"$staging/vectors")
      import sess.implicits._
      Seq((nBits, dim, pBits)).toDF("n_bits", "dim", "partition_bits")
        .coalesce(1).write.mode("overwrite").parquet(s"$staging/meta")
      // bucket-OCCUPANCY sidecar: rows-per-populated-bucket, read back
      // from the just-staged index (a column-pruned scan of the bucket
      // column only — not a second signature pass over the corpus).
      // lshQuery replays its radius-expansion loop against this histogram
      // DRIVER-SIDE, so a warm probe costs zero candidate-count Spark
      // jobs. Size is bounded by min(2^nBits, distinct signatures) —
      // 65536 rows at the default width; a query facing an oversized
      // histogram falls back to the counting loop rather than collecting
      // it. NULL buckets (malformed vectors) are excluded exactly as the
      // probe's Hamming filter excludes them.
      sess.read.parquet(s"$staging/vectors")
        .filter(col("bucket").isNotNull)
        .groupBy("bucket").count()
        .coalesce(1).write.mode("overwrite").parquet(s"$staging/occupancy")
    }
  }

  /** APPEND rows to a built LSH index WITHOUT a rebuild — and, unlike the
    * IVF append, EXACTLY: the hyperplanes are a fixed seeded function of
    * (nBits, dim) recorded in the meta sidecar, so signing the new rows
    * with the recorded family and appending into the pband partitions
    * yields an index bit-identical (as a row multiset) to a full rebuild
    * over the grown corpus. One signature pass over the NEW data only;
    * readers are safe throughout (no existing file is touched), and the
    * whole append goes through the crash/retry-safe [[stagedAppend]]
    * commit — a retried or replayed append of the same file-backed batch
    * is a no-op, never a double-append. The occupancy sidecar is MERGED
    * (old histogram + the batch's STAGED per-bucket delta — durable in
    * the staging dir, so the merge survives a crash after the part-file
    * moves) and swapped atomically with its `_applied-<id>` marker via
    * [[replaceSidecar]]; its rewrite is also what advances the meta
    * stamp for ZERO-job warm radius planning over the grown index. A
    * legacy index with no occupancy sidecar (or one lost to a crash
    * mid-swap) gets a full recount from the index's bucket column — a
    * column-pruned scan, not a corpus signature pass. Appends accumulate
    * part files; rebuild to compact once growth is large (the cached
    * lifecycle does so at [[appendRebuildFactor]]).
    *
    * `appendId` overrides the default batch identity (a fingerprint of
    * the file-backed batch's plan+files, or a fresh UUID for in-memory
    * frames). Pass a STABLE caller-side identity — e.g. streaming
    * `checkpoint#batchId`, as [[graft.streaming.StreamRunner.annIngestJob]]
    * does — when the frame itself can't prove two calls are the same
    * logical batch: the applied marker then makes a replay a no-op. */
  def lshAppend(df: DataFrame, idCol: String, vecCol: String,
                indexDir: String, appendId: Option[String] = None): Unit = {
    val sess = df.sparkSession
    val idx = lshMeta(sess, indexDir)
    // carry the index's metadata columns, as ivfAppend does
    val metaCols = indexMetaCols(idx.vectors, Set("id", "v", "bucket", "pband"))
    val sigs = lshBuckets(df, idCol, vecCol, idx.nBits, idx.dim, metaCols)
      .withColumn("pband",
        shiftrightunsigned(col("bucket"), idx.nBits - idx.pBits))
    ("id" +: "v" +: metaCols).foreach { c =>
      // modulo nullability, as in ivfAppend's fence
      require(sigs.schema(c).dataType.sql == idx.vectors.schema(c).dataType.sql,
        s"lshAppend: column '$c' type ${sigs.schema(c).dataType.sql} != " +
          s"index type ${idx.vectors.schema(c).dataType.sql}")
    }
    healStrandedAppends(sess, indexDir)
    stagedAppend(sess, indexDir, appendId.getOrElse(appendBatchId(df))) { staging =>
      clusteredWrite(sigs, "pband", 1 << idx.pBits)
        .write.mode("overwrite").partitionBy("pband")
        .parquet(s"$staging/vectors")
      // the per-bucket DELTA stages alongside the vectors: the occupancy
      // merge must survive a crash AFTER the part-file moves, when the
      // staged vectors are gone from staging and nothing is left to
      // recount cheaply. Read back from the staged write (column-pruned)
      // rather than recomputing signatures over the corpus. The read
      // carries an EXPLICIT schema: an all-filtered-out (empty) batch
      // stages zero part files, and a schema-inferring read of a
      // footerless dir would throw where the append should no-op.
      sess.read.schema(sigs.schema).parquet(s"$staging/vectors")
        .filter(col("bucket").isNotNull).groupBy("bucket").count()
        .coalesce(1).write.mode("overwrite").parquet(s"$staging/delta")
    }
  }

  /** Driver-memoized LSH index metadata: the (n_bits, dim, partition_bits)
    * sidecar row, the bucket-occupancy histogram, AND the resolved vectors
    * DataFrame (re-resolving `read.parquet` per probe would re-run
    * partition discovery over the pband directories — a Spark listing job
    * once the dir count passes the parallel-discovery threshold).
    * Invalidated by a pure FS-metadata stamp over the two sidecar
    * directories (a rebuild — staged or in place — writes new part files,
    * changing the stamp; two listStatus RPCs per probe, no Spark job on
    * the warm path). Histogram is None when the index predates the
    * occupancy sidecar or exceeds [[maxHistogramBuckets]] rows — those
    * probes fall back to the counting loop, correctness unchanged. */
  private final case class LshMeta(nBits: Int, dim: Int, pBits: Int,
                                   histogram: Option[(Array[Long], Array[Long])],
                                   vectors: DataFrame)

  private val maxHistogramBuckets = 1 << 20

  // Meta caches hold histograms and resolved DataFrames per
  // (session, indexDir). A long-lived process cycling through many
  // corpora (tests, multi-tenant serving) must not accumulate them
  // forever: past the cap the cache clears wholesale — crude but
  // bounded, and re-warming is one sidecar read per live index.
  private val maxMetaCacheEntries = 128

  private[llm] def capCache[V](m: java.util.concurrent.ConcurrentHashMap[String, V]): Unit =
    if (m.size > maxMetaCacheEntries) m.clear()

  // Unique tag per live SparkSession for meta-cache keys (a resolved
  // DataFrame must never serve a different session). Weak keys: a closed
  // session's tag — and with it every cache entry keyed by it, once the
  // cap clears them — can be collected.
  private val sessionTags = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, String]())

  private[llm] def sessionTag(spark: org.apache.spark.sql.SparkSession): String =
    sessionTags.computeIfAbsent(spark, _ => java.util.UUID.randomUUID().toString)

  private val lshMetaCache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, LshMeta)]()

  private[llm] def sidecarStamp(spark: org.apache.spark.sql.SparkSession,
                           indexDir: String, sides: Seq[String]): String = {
    val hconf = spark.sessionState.newHadoopConf()
    graft.util.Md5.hex(sides.iterator.flatMap { side =>
      val p = new org.apache.hadoop.fs.Path(s"$indexDir/$side")
      val fs = p.getFileSystem(hconf)
      try fs.listStatus(p).sortBy(_.getPath.toString).iterator.map(st =>
        s"${st.getPath}:${st.getLen}:${st.getModificationTime};")
      catch { case _: java.io.FileNotFoundException => Iterator.single("-") }
    })
  }

  private def lshMeta(spark: org.apache.spark.sql.SparkSession,
                      indexDir: String): LshMeta = {
    // session-scoped key: a resolved DataFrame must not leak across
    // SparkSessions
    val key = s"${sessionTag(spark)}|$indexDir"
    // "vectors" guards the memoized DataFrame against appends that landed
    // their files but crashed before the occupancy swap; completed
    // appends advance the stamp doubly — the rewritten occupancy part
    // file AND the `vectors/_append-<id>` marker, a path-SET change that
    // doesn't depend on mtime granularity
    val stamp = sidecarStamp(spark, indexDir,
      Seq("meta", "occupancy", "vectors", tombstonesName))
    val cached = lshMetaCache.get(key)
    if (cached != null && cached._1 == stamp) cached._2
    else {
      val meta = spark.read.parquet(s"$indexDir/meta").head()
      val (nBits, dim, pBits) = (meta.getAs[Int]("n_bits"),
        meta.getAs[Int]("dim"), meta.getAs[Int]("partition_bits"))
      val histogram =
        try {
          val rows = spark.read.parquet(s"$indexDir/occupancy")
            .limit(maxHistogramBuckets + 1).collect()
          if (rows.length > maxHistogramBuckets) None
          else Some((rows.map(_.getAs[Long]("bucket")),
                     rows.map(_.getAs[Long]("count"))))
        } catch { case scala.util.control.NonFatal(_) => None }
      val m = LshMeta(nBits, dim, pBits, histogram,
        antiTombstoned(spark, indexDir,
          spark.read.parquet(s"$indexDir/vectors")))
      capCache(lshMetaCache)
      lshMetaCache.put(key, (stamp, m))
      m
    }
  }

  /** All signatures within Hamming distance ≤ `radius` of `sig` — the
    * bucket ids a radius-r probe must read. Size is Σ_{i≤r} C(nBits, i):
    * driver-side combinatorics, cheap for the radii real probes use. */
  private[llm] def hammingBall(sig: Long, nBits: Int, radius: Int): Seq[Long] =
    (0 to radius).flatMap(r =>
      (0 until nBits).combinations(r)
        .map(_.foldLeft(sig)((s, b) => s ^ (1L << b))))

  /** QUERY a built LSH index: start at the query's bucket and expand the
    * probe Hamming radius until `minCandidates` vectors are in scope, then
    * rerank by exact cosine — same adaptive semantics (and same candidate
    * sets) as [[lshTopK]], but each probe step reads ONLY the partitions
    * in the radius ball's PREFIX projection (partition pruning over the
    * `pband` layout column), with the exact Hamming filter on the full
    * signature applied inside. When even the prefix ball outgrows
    * `maxEnumBuckets` ids (the corpus is genuinely spread out), the probe
    * falls back to a Hamming-filtered scan — correctness unchanged,
    * pruning honestly abandoned. */
  def lshQuery(spark: org.apache.spark.sql.SparkSession, indexDir: String,
               query: Seq[Double], k: Int, minCandidates: Int = 100,
               maxEnumBuckets: Int = 4096): DataFrame = {
    val idx = lshMeta(spark, indexDir)
    val (nBits, dim, pBits) = (idx.nBits, idx.dim, idx.pBits)
    require(query.size == dim,
      s"lshQuery: query dim ${query.size} != index dim $dim")
    val qSig = querySignature(query, hyperplanes(nBits, dim))
    val vectors = idx.vectors
    def candsAt(radius: Int): DataFrame =
      prunedCandidates(vectors, idx, qSig, radius, maxEnumBuckets)
    // Radius selection via the shared chooseRadius: with the occupancy
    // histogram (memoized; every index built since it exists has one) the
    // expansion replays DRIVER-SIDE at zero Spark jobs; without it, the
    // counting loop runs one job per step. Either way the decision — and
    // therefore the candidate set and results — is identical.
    val radius = chooseRadius(idx.histogram, qSig, nBits, minCandidates)(r =>
      candsAt(r).limit(minCandidates).count())
    rerank(candsAt(radius), query, k)
  }

  /** FILTERED top-k against a built LSH index — the LSH sibling of
    * [[ivfQueryFiltered]]: `pred` applies before the heap and pushes
    * into the Hamming-ball-pruned parquet read. Same recall caveat,
    * same answer: the occupancy histogram plans the UNFILTERED radius
    * (it cannot see predicate selectivity), then the ball WIDENS —
    * doubling, capped at nBits = the exact filtered full scan — until k
    * eligible candidates survive. One survivor-count read per widening
    * step; a predicate loose enough for the planned ball returns in
    * one. */
  def lshQueryFiltered(spark: org.apache.spark.sql.SparkSession,
                       indexDir: String, query: Seq[Double], k: Int,
                       pred: Column, minCandidates: Int = 100,
                       maxEnumBuckets: Int = 4096): DataFrame = {
    val idx = lshMeta(spark, indexDir)
    require(query.size == idx.dim,
      s"lshQueryFiltered: query dim ${query.size} != index dim ${idx.dim}")
    val qSig = querySignature(query, hyperplanes(idx.nBits, idx.dim))
    def candsAt(radius: Int): DataFrame =
      prunedCandidates(idx.vectors, idx, qSig, radius, maxEnumBuckets)
        .filter(pred)
    var radius = chooseRadius(idx.histogram, qSig, idx.nBits, minCandidates)(r =>
      candsAt(r).limit(minCandidates).count())
    while (true) {
      val res = rerank(candsAt(radius), query, k)
      // one job per widening round — collect the ≤k answer rows and
      // decide on their count (the ivfQueryFiltered posture)
      val rows = res.collect()
      if (radius >= idx.nBits || rows.length >= k)
        return localFrame(spark, rows, res.schema)
      radius = math.min(radius * 2, idx.nBits)
    }
    throw new IllegalStateException("unreachable")
  }

  /** Indexed cosine RANGE search against a built LSH index: every id
    * with `cos >= minCos`, served by a PRUNED Hamming-ball read instead
    * of a corpus scan. The probe radius derives from the sign-LSH
    * collision geometry — a pair at angle θ flips each hyperplane bit
    * with probability θ/π, so a cosine-`minCos` neighbor sits at
    * expected Hamming distance `nBits·acos(minCos)/π`; the probe reads
    * `that + slackBits` (slack buys recall at read-amplification cost)
    * and then EXACT-verifies `cos >= minCos` on the candidates.
    *
    * Semantics: precision is EXACT (the verify filter), recall is
    * approximate — a true neighbor whose signature landed beyond the
    * slack radius is missed (tail probability decays binomially in the
    * slack). `slackBits = nBits` degenerates to the exact full scan.
    * High thresholds (the retrieval-filter regime this exists for) probe
    * a small ball of a partition-pruned layout: serving cost tracks the
    * ball, not the corpus — the [[bruteForceRange]] scan stays the
    * exact baseline for low thresholds. */
  def lshRange(spark: org.apache.spark.sql.SparkSession, indexDir: String,
               query: Seq[Double], minCos: Double, slackBits: Int = 4,
               maxEnumBuckets: Int = 4096): DataFrame = {
    require(minCos > -1.0 && minCos <= 1.0,
      s"lshRange: minCos must be in (-1, 1], got $minCos")
    require(slackBits >= 0, s"lshRange: slackBits must be >= 0, got $slackBits")
    val idx = lshMeta(spark, indexDir)
    require(query.size == idx.dim,
      s"lshRange: query dim ${query.size} != index dim ${idx.dim}")
    val qSig = querySignature(query, hyperplanes(idx.nBits, idx.dim))
    val radius = rangeRadius(idx.nBits, minCos, slackBits)
    val qLit = array(query.map(lit): _*)
    prunedCandidates(idx.vectors, idx, qSig, radius, maxEnumBuckets)
      .select(col("id"), round(cosine(col("v"), qLit), 6).as("cos"))
      .filter(col("cos").isNotNull && !isnan(col("cos")) &&
        col("cos") >= minCos)
  }

  /** FILTERED indexed LSH range — the LSH sibling of
    * [[ivfRangeFiltered]]: the predicate pushes into the Hamming-ball-
    * pruned read, exact precision, the same geometry-derived-radius
    * recall contract (the predicate only removes rows). No widening
    * needed — range has no k to satisfy. */
  def lshRangeFiltered(spark: org.apache.spark.sql.SparkSession,
                       indexDir: String, query: Seq[Double], minCos: Double,
                       pred: Column, slackBits: Int = 4,
                       maxEnumBuckets: Int = 4096): DataFrame = {
    require(minCos > -1.0 && minCos <= 1.0,
      s"lshRangeFiltered: minCos must be in (-1, 1], got $minCos")
    require(slackBits >= 0, s"lshRangeFiltered: slackBits must be >= 0, got $slackBits")
    val idx = lshMeta(spark, indexDir)
    require(query.size == idx.dim,
      s"lshRangeFiltered: query dim ${query.size} != index dim ${idx.dim}")
    val qSig = querySignature(query, hyperplanes(idx.nBits, idx.dim))
    val radius = rangeRadius(idx.nBits, minCos, slackBits)
    val qLit = array(query.map(lit): _*)
    prunedCandidates(idx.vectors, idx, qSig, radius, maxEnumBuckets)
      .filter(pred)
      .select(col("id"), round(cosine(col("v"), qLit), 6).as("cos"))
      .filter(col("cos").isNotNull && !isnan(col("cos")) &&
        col("cos") >= minCos)
  }

  /** Ad-hoc (index-less) LSH range search for IN-MEMORY corpora: one
    * corpus pass computing signatures in-plan, a Hamming-radius filter
    * derived by the SAME collision-geometry rule as [[lshRange]]
    * (`ceil(nBits·acos(minCos)/π) + slackBits`), then the exact verify.
    * Identical candidate-inclusion semantics to [[lshRange]] at equal
    * params — just unpruned; a serving path should [[lshBuild]] once
    * and probe the partition-pruned layout instead. */
  def lshRangeAdhoc(df: DataFrame, idCol: String, vecCol: String,
                    query: Seq[Double], minCos: Double, nBits: Int = 16,
                    slackBits: Int = 4): DataFrame = {
    require(minCos > -1.0 && minCos <= 1.0,
      s"lshRangeAdhoc: minCos must be in (-1, 1], got $minCos")
    require(slackBits >= 0, s"lshRangeAdhoc: slackBits must be >= 0, got $slackBits")
    val dim = query.size
    val qSig = querySignature(query, hyperplanes(nBits, dim))
    val radius = rangeRadius(nBits, minCos, slackBits)
    val qLit = array(query.map(lit): _*)
    lshBuckets(df, idCol, vecCol, nBits, dim)
      .filter(bit_count(col("bucket").bitwiseXOR(lit(qSig))) <= radius)
      .select(col("id"), round(cosine(col("v"), qLit), 6).as("cos"))
      .filter(col("cos").isNotNull && !isnan(col("cos")) &&
        col("cos") >= minCos)
  }

  /** The pband ids a radius-`radius` probe of signature `qSig` must read
    * — the prefix projection of the Hamming ball (lossless: full-sig
    * Hamming ≤ r implies prefix Hamming ≤ r) — or None when the ball
    * outgrows `maxEnumBuckets` (probe falls back to an unpruned scan).
    * The ball-size sum early-exits at the cap: for wide prefixes a full
    * C(n, r) sum overflows Long long before any enumerable radius. ONE
    * implementation shared by the single and batch probes — their
    * batch ≡ per-query contract depends on identical ball decisions. */
  private def prefixBall(qSig: Long, nBits: Int, pBits: Int, radius: Int,
                         maxEnumBuckets: Int): Option[Seq[Long]] = {
    def choose(n: Int, r: Int): Long =
      (1 to r).foldLeft(1L)((a, i) => a * (n - i + 1) / i)
    val pRadius = math.min(radius, pBits)
    val ballSize = (0 to pRadius).foldLeft(0L)((acc, r) =>
      if (acc > maxEnumBuckets) acc else acc + choose(pBits, r))
    if (ballSize <= maxEnumBuckets)
      Some(hammingBall(qSig >>> (nBits - pBits), pBits, pRadius))
    else None
  }

  /** pband IN (...) literals typed to match the read-back partition
    * column — the column is type-INFERRED (int when values fit), and a
    * mistyped literal adds a cast that silently drops PartitionFilters. */
  private def pbandLiterals(idx: LshMeta, ids: Seq[Long]): Seq[Any] =
    if (idx.vectors.schema("pband").dataType ==
        org.apache.spark.sql.types.IntegerType) ids.map(_.toInt)
    else ids

  /** One query's candidate read at a radius: prefix-ball partition
    * pruning when enumerable, Hamming-filtered scan otherwise — shared
    * by the single probe, and by the batch probe's counting fallback so
    * a legacy no-histogram index never costs the batch path unpruned
    * full-index counting scans. */
  private def prunedCandidates(vectors: DataFrame, idx: LshMeta, qSig: Long,
                               radius: Int, maxEnumBuckets: Int): DataFrame = {
    val isHamming = bit_count(col("bucket").bitwiseXOR(lit(qSig)))
    prefixBall(qSig, idx.nBits, idx.pBits, radius, maxEnumBuckets) match {
      case Some(ids) =>
        vectors.filter(col("pband").isin(pbandLiterals(idx, ids): _*) &&
          isHamming <= radius)
      case None => vectors.filter(isHamming <= radius)
    }
  }

  /** Shared adaptive radius selection for the LSH probes: replay the
    * exponential expansion (r = 1, 2, 4, … capped at nBits) until at
    * least `minCandidates` candidates lie within Hamming r of `qSig` —
    * against a driver-side occupancy histogram when one is available
    * (zero Spark jobs: histogram mass within r IS the candidate count at
    * r, nulls excluded on both sides), else via `countAt` (one counting
    * job per step, O(log nBits) total). One implementation so the
    * histogram path can never drift from the counting loop it replaces —
    * the zero-jobs specs gate their equivalence.
    *
    * SCALING BOUND: the histogram path costs exactly ONE O(buckets)
    * popcount pass per query — the buckets pre-bucket into an
    * (nBits+1)-cell distance profile, and every radius step is then an
    * O(1) cumulative lookup. The previous per-step rescan was
    * O(buckets × steps) and unguarded at the [[maxHistogramBuckets]]
    * = 2²⁰ cap × a 256-query batch chunk (~10⁹ driver bitCounts); the
    * pre-bucketed form is bounded by cap × chunk ≈ 2.7×10⁸ popcounts
    * per chunk (≲0.3 s driver CPU) regardless of how many expansion
    * steps the queries take. */
  private def chooseRadius(histogram: Option[(Array[Long], Array[Long])],
                           qSig: Long, nBits: Int, minCandidates: Int)
                          (countAt: Int => Long): Int = {
    val count: Int => Long = histogram match {
      case Some((buckets, counts)) =>
        val within = new Array[Long](nBits + 1)
        var i = 0
        while (i < buckets.length) {
          val d = java.lang.Long.bitCount(buckets(i) ^ qSig)
          // a (corrupt) bucket with bits beyond nBits stays excluded at
          // every radius, exactly as the per-step scan excluded it
          if (d <= nBits) within(d) += counts(i)
          i += 1
        }
        var d = 1
        while (d <= nBits) { within(d) += within(d - 1); d += 1 }
        r => within(math.min(r, nBits))
      case None => countAt
    }
    var r = 1
    while (r < nBits && count(r) < minCandidates) r = math.min(r * 2, nBits)
    r
  }

  /** LSH ANN top-k against a cached index keyed by `cacheKey` — the
    * train-free counterpart of [[ivfTopKIndexed]]: first call per key
    * pays the one-pass [[lshBuild]]; every later call is a bucket-pruned
    * [[lshQuery]] probe. Same fingerprint fencing: a changed corpus or
    * nBits under the same key rebuilds instead of serving stale. */
  def lshTopKIndexed(df: DataFrame, idCol: String, vecCol: String, cacheKey: String,
                     query: Seq[Double], k: Int, nBits: Int = 16,
                     minCandidates: Int = 100, partitionBits: Int = 8): DataFrame = {
    val dim = query.size
    val dir = cachedIndex(df, cacheKey, s"lsh|b=$nBits|d=$dim|p=$partitionBits",
      Some((newRows, d) => lshAppend(newRows, idCol, vecCol, d))) { d =>
      lshBuild(df, idCol, vecCol, d, nBits, dim, partitionBits)
    }
    lshQuery(df.sparkSession, dir, query, k, minCandidates)
  }

  /** [[lshQueryFiltered]] through the cached-index lifecycle — the LSH
    * sibling of [[ivfTopKFilteredIndexed]], same metaCols-in-stamp
    * contract. */
  def lshTopKFilteredIndexed(df: DataFrame, idCol: String, vecCol: String,
                             cacheKey: String, query: Seq[Double], k: Int,
                             pred: Column, metaCols: Seq[String],
                             nBits: Int = 16, minCandidates: Int = 100,
                             partitionBits: Int = 8): DataFrame = {
    val dim = query.size
    val dir = cachedIndex(df, cacheKey,
      s"lsh|b=$nBits|d=$dim|p=$partitionBits|m=${metaCols.mkString(",")}",
      Some((newRows, d) => lshAppend(newRows, idCol, vecCol, d))) { d =>
      lshBuild(df, idCol, vecCol, d, nBits, dim, partitionBits, metaCols)
    }
    lshQueryFiltered(df.sparkSession, dir, query, k, pred, minCandidates)
  }

  /** [[lshRangeFiltered]] through the cached-index lifecycle — shared
    * stamp with [[lshTopKFilteredIndexed]], one build for both. */
  def lshRangeFilteredIndexed(df: DataFrame, idCol: String, vecCol: String,
                              cacheKey: String, query: Seq[Double],
                              minCos: Double, pred: Column,
                              metaCols: Seq[String], nBits: Int = 16,
                              slackBits: Int = 4,
                              partitionBits: Int = 8): DataFrame = {
    val dim = query.size
    val dir = cachedIndex(df, cacheKey,
      s"lsh|b=$nBits|d=$dim|p=$partitionBits|m=${metaCols.mkString(",")}",
      Some((newRows, d) => lshAppend(newRows, idCol, vecCol, d))) { d =>
      lshBuild(df, idCol, vecCol, d, nBits, dim, partitionBits, metaCols)
    }
    lshRangeFiltered(df.sparkSession, dir, query, minCos, pred, slackBits)
  }

  /** Batch counterpart of [[lshTopKFilteredIndexed]] — shared stamp,
    * one metadata-carrying build for single and batch filtered probes. */
  def lshTopKBatchFilteredIndexed(df: DataFrame, idCol: String, vecCol: String,
                                  cacheKey: String,
                                  queries: Seq[(Long, Seq[Double])], k: Int,
                                  pred: Column, metaCols: Seq[String],
                                  nBits: Int = 16, minCandidates: Int = 100,
                                  partitionBits: Int = 8): DataFrame = {
    // validate the batch BEFORE resolving the cache (the
    // lshTopKBatchIndexed rule): a ragged batch must not cost a full
    // index build it could never use
    require(queries.nonEmpty, "lshTopKBatchFilteredIndexed: empty query batch")
    require(queries.map(_._2.size).distinct.size == 1,
      s"lshTopKBatchFilteredIndexed: ragged query dims ${queries.map(_._2.size).distinct}")
    val dim = queries.head._2.size
    val dir = cachedIndex(df, cacheKey,
      s"lsh|b=$nBits|d=$dim|p=$partitionBits|m=${metaCols.mkString(",")}",
      Some((newRows, d) => lshAppend(newRows, idCol, vecCol, d))) { d =>
      lshBuild(df, idCol, vecCol, d, nBits, dim, partitionBits, metaCols)
    }
    lshQueryBatchFiltered(df.sparkSession, dir, queries, k, pred, minCandidates)
  }

  /** [[lshRange]] through the same fingerprint-fenced cached-index
    * lifecycle as [[lshTopKIndexed]] — an identical params string, so a
    * corpus served for top-k and for range probes shares ONE build. */
  def lshRangeIndexed(df: DataFrame, idCol: String, vecCol: String,
                      cacheKey: String, query: Seq[Double], minCos: Double,
                      nBits: Int = 16, slackBits: Int = 4,
                      partitionBits: Int = 8): DataFrame = {
    val dim = query.size
    val dir = cachedIndex(df, cacheKey, s"lsh|b=$nBits|d=$dim|p=$partitionBits",
      Some((newRows, d) => lshAppend(newRows, idCol, vecCol, d))) { d =>
      lshBuild(df, idCol, vecCol, d, nBits, dim, partitionBits)
    }
    lshRange(df.sparkSession, dir, query, minCos, slackBits)
  }

  /** BATCH filtered top-k against a built LSH index — the LSH sibling of
    * [[ivfQueryBatchFiltered]]: per-query starting radii come from the
    * shared [[chooseRadius]] planning (histogram-driven when available,
    * with the pred-filtered counting fallback [[lshQueryFiltered]] uses),
    * each round reads ONE pruned union of the still-unsatisfied queries'
    * prefix balls (unpruned only if any pending ball outgrows the
    * enumeration cap) filtered by `pred`, scores with the batched
    * machinery, finalizes queries with k eligible survivors, and doubles
    * the radii of the rest (capped at nBits = the exact filtered scan).
    * Returns (qid, id, cos), qid-then-rank ordered. */
  def lshQueryBatchFiltered(spark: org.apache.spark.sql.SparkSession,
                            indexDir: String, queries: Seq[(Long, Seq[Double])],
                            k: Int, pred: Column, minCandidates: Int = 100,
                            maxEnumBuckets: Int = 4096,
                            chunkSize: Int = 256): DataFrame = {
    require(queries.nonEmpty, "lshQueryBatchFiltered: empty query batch")
    val dims = queries.map(_._2.size).distinct
    require(dims.size == 1, s"lshQueryBatchFiltered: ragged query dims $dims")
    require(chunkSize > 0, "lshQueryBatchFiltered: chunkSize must be positive")
    // qid-keyed widening loop — duplicates would conflate two queries'
    // pools (the ivfQueryBatchFiltered note); reject loudly
    require(queries.map(_._1).distinct.size == queries.size,
      "lshQueryBatchFiltered: duplicate qids in one batch")
    val idx = lshMeta(spark, indexDir)
    require(dims.head == idx.dim,
      s"lshQueryBatchFiltered: query dim ${dims.head} != index dim ${idx.dim}")
    val planes = hyperplanes(idx.nBits, idx.dim)
    val eligible = idx.vectors.filter(pred)
    val acc = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    var pending = queries.map { case (qid, q) =>
      val sig = querySignature(q, planes)
      val r0 = chooseRadius(idx.histogram, sig, idx.nBits, minCandidates)(r =>
        prunedCandidates(eligible, idx, sig, r, maxEnumBuckets)
          .limit(minCandidates).count())
      (qid, q, sig, r0)
    }
    val radiusStart =
      if (pending.isEmpty) 0 else pending.map(_._4).min
    var radiusUsed = radiusStart
    var lshRounds = 0
    while (pending.nonEmpty) {
      radiusUsed = math.max(radiusUsed, pending.map(_._4).max)
      lshRounds += 1
      val rows = pending.grouped(chunkSize).toSeq.flatMap { chunk =>
        // union prefix-ball pruning, lossless under the per-query
        // full-signature Hamming filter inside scoreLshGroup. PER-GROUP
        // split (the lshQueryBatch posture): one adversarial wide-ball
        // query must not cost every other query its pruned read —
        // enumerable queries share one union-pruned read, overflow
        // queries share one unpruned scan, the answers union
        val balls = chunk.map { case (_, _, sig, r) =>
          prefixBall(sig, idx.nBits, idx.pBits, r, maxEnumBuckets) }
        val (enumC, scanC) = chunk.zip(balls).partition(_._2.isDefined)
        val parts = Seq(
          if (enumC.isEmpty) None else Some {
            val ids = enumC.flatMap(_._2.get).distinct
            scoreLshGroup(
              eligible.filter(col("pband").isin(pbandLiterals(idx, ids): _*)),
              enumC.map(c => (c._1._1, c._1._2)), enumC.map(_._1._3),
              enumC.map(_._1._4), k)
          },
          if (scanC.isEmpty) None else Some(
            scoreLshGroup(eligible, scanC.map(c => (c._1._1, c._1._2)),
              scanC.map(_._1._3), scanC.map(_._1._4), k))
        ).flatten
        parts.flatMap(_.collect())
      }
      val byQ = rows.groupBy(_.getLong(0))
      val (done, todo) = pending.partition { case (qid, _, _, r) =>
        r >= idx.nBits || byQ.getOrElse(qid, Seq.empty).size >= k }
      acc ++= done.flatMap { case (qid, _, _, _) =>
        byQ.getOrElse(qid, Seq.empty)
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))) }
      pending = todo.map { case (qid, q, sig, r) =>
        (qid, q, sig, math.min(r * 2, idx.nBits)) }
    }
    ProbeStats.record("lsh_filtered", queries.size, radiusStart, radiusUsed,
      lshRounds - 1)
    import spark.implicits._
    acc.toSeq.sortBy { case (qid, id, cos) => (qid, -cos, id) }
      .toDF("qid", "id", "cos")
  }

  /** QUERY a built LSH index with a BATCH of query vectors in ONE pruned
    * read — the LSH member of the batched serving matrix, mirroring
    * [[ivfQueryBatch]]: each query's Hamming radius comes from the
    * memoized occupancy histogram DRIVER-SIDE (zero counting jobs —
    * identical radii, hence identical per-query candidate sets and
    * results, to a [[lshQuery]] per query), the read is pruned to the
    * UNION of all queries' prefix balls (lossless: full-signature Hamming
    * ≤ r implies prefix Hamming ≤ r, so each query's exact in-scope
    * filter below is a subset of its enumerated ball), every candidate
    * row scores against the whole query matrix via the native
    * [[graft.functions.MatVecDots]], a per-row per-query Hamming
    * membership filter keeps each query to ITS candidates, and the
    * bounded-heap [[graft.functions.TopKF]] keeps k per query — the only
    * shuffle carries ≤ partitions × |queries| × k rows. A query whose
    * ball outgrows `maxEnumBuckets` falls back to an unpruned scan
    * WITHOUT dragging the rest of the chunk with it (per-group pruning:
    * enumerable queries keep their one union-pruned read, overflow
    * queries share one scan, the answers union); per-step counting jobs
    * happen only for a legacy index with no occupancy sidecar. Same
    * plan-literal `chunkSize` bound as the other batch entry points.
    * Returns (qid, id, cos). */
  def lshQueryBatch(spark: org.apache.spark.sql.SparkSession, indexDir: String,
                    queries: Seq[(Long, Seq[Double])], k: Int,
                    minCandidates: Int = 100, maxEnumBuckets: Int = 4096,
                    chunkSize: Int = 256): DataFrame = {
    require(queries.nonEmpty, "lshQueryBatch: empty query batch")
    val dims = queries.map(_._2.size).distinct
    require(dims.size == 1, s"lshQueryBatch: ragged query dims $dims")
    require(chunkSize > 0, "lshQueryBatch: chunkSize must be positive")
    if (queries.size > chunkSize)
      return queries.grouped(chunkSize)
        .map(c => lshQueryBatch(spark, indexDir, c, k, minCandidates,
          maxEnumBuckets, chunkSize))
        .reduce(_ unionByName _)
    val idx = lshMeta(spark, indexDir)
    val nBits = idx.nBits
    require(dims.head == idx.dim,
      s"lshQueryBatch: query dim ${dims.head} != index dim ${idx.dim}")
    val planes = hyperplanes(nBits, idx.dim)
    val vectors = idx.vectors
    val qSigs = queries.map { case (_, q) => querySignature(q, planes) }
    // the counting fallback (legacy index, no occupancy sidecar) probes
    // through the same pruned per-query candidate read as lshQuery
    val radii = qSigs.map(qSig =>
      chooseRadius(idx.histogram, qSig, nBits, minCandidates)(r =>
        prunedCandidates(vectors, idx, qSig, r, maxEnumBuckets)
          .limit(minCandidates).count()))
    // per-query prefix balls (shared prefixBall — identical ball
    // decisions to the single-query path); None = unpruned read
    val balls: Seq[Option[Seq[Long]]] = qSigs.zip(radii).map {
      case (qSig, radius) =>
        prefixBall(qSig, nBits, idx.pBits, radius, maxEnumBuckets)
    }
    ProbeStats.record("lsh", queries.size, radii.min, radii.max, 0)
    // PER-GROUP pruning: one adversarial wide-ball query must not cost
    // every other query its pruned read. Queries split into the
    // ball-enumerable group (ONE union-pruned read over their balls) and
    // the overflow group (one unpruned scan); each query's own Hamming
    // membership filter defines its candidate set, so the split cannot
    // change any query's answer — the groups' results simply union.
    val (enumIdx, scanIdx) = queries.indices.partition(i => balls(i).isDefined)
    def slice[T](xs: Seq[T], ix: Seq[Int]): Seq[T] = ix.map(xs)
    val parts = Seq(
      if (enumIdx.isEmpty) None else Some {
        val ids = enumIdx.flatMap(i => balls(i).get).distinct
        scoreLshGroup(
          vectors.filter(col("pband").isin(pbandLiterals(idx, ids): _*)),
          slice(queries, enumIdx), slice(qSigs, enumIdx),
          slice(radii, enumIdx), k)
      },
      if (scanIdx.isEmpty) None
      else Some(scoreLshGroup(vectors, slice(queries, scanIdx),
        slice(qSigs, scanIdx), slice(radii, scanIdx), k))
    ).flatten
    parts.reduce(_ unionByName _)
  }

  /** RANGE probe of a built LSH index for a BATCH of queries in ONE
    * pruned read — the range member of the batched LSH serving matrix,
    * mirroring [[lshQueryBatch]]: the probe radius is THRESHOLD-derived
    * (the [[lshRange]] collision-geometry rule — one radius for the
    * whole batch, no occupancy replay needed), the read prunes to the
    * union of the enumerable queries' prefix balls with the same
    * per-group overflow split as the top-k batch, each candidate row
    * scores against the whole query matrix, a per-query Hamming
    * membership filter keeps batch ≡ per-query [[lshRange]], and the
    * exact threshold verify bounds precision. No heap, no aggregation —
    * map-only output (qid, id, cos) after the pruned read. */
  def lshRangeBatch(spark: org.apache.spark.sql.SparkSession, indexDir: String,
                    queries: Seq[(Long, Seq[Double])], minCos: Double,
                    slackBits: Int = 4, maxEnumBuckets: Int = 4096,
                    chunkSize: Int = 256): DataFrame = {
    require(queries.nonEmpty, "lshRangeBatch: empty query batch")
    require(minCos > -1.0 && minCos <= 1.0,
      s"lshRangeBatch: minCos must be in (-1, 1], got $minCos")
    require(slackBits >= 0, s"lshRangeBatch: slackBits must be >= 0, got $slackBits")
    val dims = queries.map(_._2.size).distinct
    require(dims.size == 1, s"lshRangeBatch: ragged query dims $dims")
    require(chunkSize > 0, "lshRangeBatch: chunkSize must be positive")
    if (queries.size > chunkSize)
      return queries.grouped(chunkSize)
        .map(c => lshRangeBatch(spark, indexDir, c, minCos, slackBits,
          maxEnumBuckets, chunkSize))
        .reduce(_ unionByName _)
    val idx = lshMeta(spark, indexDir)
    require(dims.head == idx.dim,
      s"lshRangeBatch: query dim ${dims.head} != index dim ${idx.dim}")
    val nBits = idx.nBits
    val planes = hyperplanes(nBits, idx.dim)
    val qSigs = queries.map { case (_, q) => querySignature(q, planes) }
    val radius = rangeRadius(nBits, minCos, slackBits)
    val balls: Seq[Option[Seq[Long]]] = qSigs.map(qSig =>
      prefixBall(qSig, nBits, idx.pBits, radius, maxEnumBuckets))
    ProbeStats.record("lsh_range", queries.size, radius, radius, 0)
    val (enumIdx, scanIdx) = queries.indices.partition(i => balls(i).isDefined)
    def slice[T](xs: Seq[T], ix: Seq[Int]): Seq[T] = ix.map(xs)
    val parts = Seq(
      if (enumIdx.isEmpty) None else Some {
        val ids = enumIdx.flatMap(i => balls(i).get).distinct
        scoreLshRangeGroup(
          idx.vectors.filter(col("pband").isin(pbandLiterals(idx, ids): _*)),
          slice(queries, enumIdx), slice(qSigs, enumIdx), radius, minCos)
      },
      if (scanIdx.isEmpty) None
      else Some(scoreLshRangeGroup(idx.vectors, slice(queries, scanIdx),
        slice(qSigs, scanIdx), radius, minCos))
    ).flatten
    parts.reduce(_ unionByName _)
  }

  /** Ad-hoc (index-less) batched LSH range for IN-MEMORY corpora: one
    * signature pass buckets the corpus, the shared range tail scores
    * each chunk — candidate-inclusion identical to [[lshRangeAdhoc]]
    * per query at equal params. */
  def lshRangeAdhocBatch(df: DataFrame, idCol: String, vecCol: String,
                         queries: Seq[(Long, Seq[Double])], minCos: Double,
                         nBits: Int = 16, slackBits: Int = 4,
                         chunkSize: Int = 256): DataFrame = {
    require(queries.nonEmpty, "lshRangeAdhocBatch: empty query batch")
    require(minCos > -1.0 && minCos <= 1.0,
      s"lshRangeAdhocBatch: minCos must be in (-1, 1], got $minCos")
    val dims = queries.map(_._2.size).distinct
    require(dims.size == 1, s"lshRangeAdhocBatch: ragged query dims $dims")
    val dim = dims.head
    val planes = hyperplanes(nBits, dim)
    val bucketed = lshBuckets(df, idCol, vecCol, nBits, dim)
    val radius = rangeRadius(nBits, minCos, slackBits)
    queries.grouped(chunkSize).map { chunk =>
      scoreLshRangeGroup(bucketed, chunk,
        chunk.map { case (_, q) => querySignature(q, planes) }, radius, minCos)
    }.reduce(_ unionByName _)
  }

  /** [[lshRangeBatch]] through the fingerprint-fenced cached-index
    * lifecycle — identical params string to [[lshTopKIndexed]], so one
    * build serves single/batch top-k and range alike. */
  def lshRangeBatchIndexed(df: DataFrame, idCol: String, vecCol: String,
                           cacheKey: String, queries: Seq[(Long, Seq[Double])],
                           minCos: Double, nBits: Int = 16, slackBits: Int = 4,
                           partitionBits: Int = 8): DataFrame = {
    val dims = queries.map(_._2.size).distinct
    require(dims.size == 1, s"lshRangeBatchIndexed: ragged query dims $dims")
    val dim = dims.head
    val dir = cachedIndex(df, cacheKey, s"lsh|b=$nBits|d=$dim|p=$partitionBits",
      Some((newRows, d) => lshAppend(newRows, idCol, vecCol, d))) { d =>
      lshBuild(df, idCol, vecCol, d, nBits, dim, partitionBits)
    }
    lshRangeBatch(df.sparkSession, dir, queries, minCos, slackBits)
  }

  /** The shared scoring tail of the batched LSH RANGE paths: per-row
    * [[graft.functions.MatVecDots]] against the group's query matrix,
    * per-query exact Hamming membership at the threshold-derived radius
    * (batch ≡ per-query [[lshRange]]; NULL-bucket rows fail every
    * comparison), then the exact `cos >= minCos` verify. No heap, no
    * groupBy — a map-only projection. */
  private def scoreLshRangeGroup(vecs: DataFrame,
                                 queries: Seq[(Long, Seq[Double])],
                                 qSigs: Seq[Long], radius: Int,
                                 minCos: Double): DataFrame = {
    import graft.functions.{MatVecF, VectorF}
    val qNorms = queries.map { case (_, q) => math.sqrt(q.map(x => x * x).sum) }
    val qIds = queries.map(_._1)
    val sigLit = array(qSigs.map(lit): _*)
    vecs
      .withColumn("vnorm", VectorF.norm(col("v")))
      .filter(col("vnorm").isNotNull && !isnan(col("vnorm")) && col("vnorm") > 0)
      .select(col("id"), col("bucket"), col("vnorm"),
        posexplode(MatVecF.dots(col("v"), queries.map(_._2))))
      .filter(bit_count(col("bucket").bitwiseXOR(
        element_at(sigLit, col("pos") + 1))) <= radius)
      .select(element_at(array(qIds.map(lit): _*), col("pos") + 1).as("qid"),
        col("id"),
        round(col("col") / (col("vnorm") *
          element_at(array(qNorms.map(lit): _*), col("pos") + 1)), 6).as("cos"))
      .filter(col("cos").isNotNull && !isnan(col("cos")) &&
        col("cos") >= minCos)
  }

  /** The shared matrix-scoring tail of the batched LSH paths (indexed
    * pruned group, indexed overflow group, ad-hoc [[lshTopKBatch]]):
    * score one group of queries against a candidate frame carrying
    * (id, v, bucket) — per-row [[graft.functions.MatVecDots]] against
    * the group's query matrix, per-query exact Hamming membership
    * (batch ≡ per-query [[lshQuery]]; NULL-bucket rows fail every
    * comparison), degenerate-query exclusion, and the bounded-heap
    * [[graft.functions.TopKF]] top-k per query — the only shuffle
    * carries ≤ partitions × |group| × k rows. Returns (qid, id, cos). */
  private def scoreLshGroup(vecs: DataFrame, queries: Seq[(Long, Seq[Double])],
                            qSigs: Seq[Long], radii: Seq[Int],
                            k: Int): DataFrame = {
    import graft.functions.{MatVecF, TopKF, VectorF}
    val qNorms = queries.map { case (_, q) => math.sqrt(q.map(x => x * x).sum) }
    val qIds = queries.map(_._1)
    val sigLit = array(qSigs.map(lit): _*)
    val radiusLit = array(radii.map(lit): _*)
    val scored = vecs
      .withColumn("vnorm", VectorF.norm(col("v")))
      .filter(col("vnorm").isNotNull && !isnan(col("vnorm")) && col("vnorm") > 0)
      .select(col("id"), col("bucket"), col("vnorm"),
        posexplode(MatVecF.dots(col("v"), queries.map(_._2))))
      .filter(bit_count(col("bucket").bitwiseXOR(
          element_at(sigLit, col("pos") + 1))) <=
        element_at(radiusLit, col("pos") + 1))
      .select(col("pos"),
        round(col("col") / (col("vnorm") *
          element_at(array(qNorms.map(lit): _*), col("pos") + 1)), 6).as("cos"),
        col("id"))
      // degenerate QUERY guard, as in the other batch paths
      .filter(col("cos").isNotNull && !isnan(col("cos")))
    scored
      .groupBy("pos")
      .agg(TopKF.topKByScore(col("cos"), col("id"), k).as("topk"))
      .select(element_at(array(qIds.map(lit): _*), col("pos") + 1).as("qid"),
        explode(col("topk")).as("hit"))
      .select(col("qid"), col("hit.id").as("id"), col("hit.score").as("cos"))
  }

  /** Ad-hoc (index-less) LSH ANN top-k for a BATCH of queries: one
    * signature pass buckets the corpus, ONE bucket-histogram job feeds
    * every query's driver-side radius choice (same decisions as
    * [[lshTopK]] per query), and the shared [[scoreLshGroup]] tail
    * scores each chunk in one corpus pass. For one-shot exploration and
    * IN-MEMORY corpora — no index dir, nothing cached, the whole corpus
    * is scanned per call; a serving path should [[lshBuild]] once and
    * [[lshQueryBatch]] against the pruned layout instead. Returns
    * (qid, id, cos), row-identical to a [[lshTopK]] per query. */
  def lshTopKBatch(df: DataFrame, idCol: String, vecCol: String,
                   queries: Seq[(Long, Seq[Double])], k: Int,
                   nBits: Int = 16, minCandidates: Int = 100,
                   chunkSize: Int = 256): DataFrame = {
    require(queries.nonEmpty, "lshTopKBatch: empty query batch")
    val dims = queries.map(_._2.size).distinct
    require(dims.size == 1, s"lshTopKBatch: ragged query dims $dims")
    require(chunkSize > 0, "lshTopKBatch: chunkSize must be positive")
    val dim = dims.head
    val planes = hyperplanes(nBits, dim)
    val bucketed = lshBuckets(df, idCol, vecCol, nBits, dim)
    // same one-job histogram as lshTopK, replayed driver-side per query
    val hist = bucketed.filter(col("bucket").isNotNull)
      .groupBy("bucket").count()
      .limit(maxHistogramBuckets + 1).collect()
    val histogram =
      if (hist.length <= maxHistogramBuckets)
        Some((hist.map(_.getLong(0)), hist.map(_.getLong(1))))
      else None
    queries.grouped(chunkSize).map { chunk =>
      val qSigs = chunk.map { case (_, q) => querySignature(q, planes) }
      val radii = qSigs.map(qSig =>
        chooseRadius(histogram, qSig, nBits, minCandidates)(r =>
          bucketed.filter(bit_count(col("bucket").bitwiseXOR(lit(qSig))) <= r)
            .limit(minCandidates).count()))
      scoreLshGroup(bucketed, chunk, qSigs, radii, k)
    }.reduce(_ unionByName _)
  }

  /** The embedding dimension a built index expects — from the memoized
    * sidecar meta (LSH: the (n_bits, dim) row; IVF: the centroid width),
    * so a serving layer can validate query dims BEFORE probing at zero
    * Spark jobs on the warm path. */
  def indexDim(spark: org.apache.spark.sql.SparkSession, indexDir: String,
               method: String): Int = method match {
    case "lsh"   => lshMeta(spark, indexDir).dim
    case "ivf"   => ivfMeta(spark, indexDir).centroids.head.length
    case "ivfpq" => Pq.ivfPqDim(spark, indexDir)
    case other => throw new IllegalArgumentException(s"indexDim: unknown method $other")
  }

  /** The (id, vector) column TYPES of a built index — what an appended
    * batch must carry (modulo nullability). The streaming ingest job uses
    * this to type its file stream from the index itself, so a watched
    * directory that is still EMPTY at job start needs no schema
    * inference, and jsonl's array<double> vectors get cast to the index's
    * element type before the append fence sees them. */
  def indexVectorTypes(spark: org.apache.spark.sql.SparkSession,
                       indexDir: String, method: String)
      : (org.apache.spark.sql.types.DataType, org.apache.spark.sql.types.DataType) = {
    // ivfpq stores CODES, not vectors — appended increments still arrive
    // as float/double arrays (ivfPqAppend encodes them), so the stream
    // types its vector column array<double> (jsonl's natural shape;
    // Spark 4's parquet type widening accepts narrower float files)
    if (method == "ivfpq") {
      val vectors = Pq.ivfPqMeta(spark, indexDir).vectors
      return (vectors.schema("id").dataType,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType))
    }
    val vectors = method match {
      case "lsh" => lshMeta(spark, indexDir).vectors
      case "ivf" => ivfMeta(spark, indexDir).vectors
      case other =>
        throw new IllegalArgumentException(s"indexVectorTypes: unknown method $other")
    }
    (vectors.schema("id").dataType, vectors.schema("v").dataType)
  }

  /** Bootstrap an index from a parquet corpus when none exists at
    * `indexDir` yet (the method's always-written sidecar — `meta` for
    * LSH, `centroids` for IVF — is the built marker; the build itself
    * commits atomically via [[stagedCommit]]) — the shared
    * entry the serving ([[graft.cli.ServeCli]]) and ingest
    * ([[graft.cli.IngestCli]]) jobs use so one relaunch-safe command
    * takes a fresh host from "corpus on disk" to a live index. An
    * EXISTING index is never rebuilt here: refreshing belongs to
    * [[lshAppend]]/[[ivfAppend]] or an explicit rebuild. */
  /** Detect a BUILT index dir's kind from its layout sidecars — the
    * self-describing dispatch the `index:REF` catalog vars and the DFL
    * probe stages use (an index dir always knows what it is; callers
    * should not have to): bm25 = stats+postings, ivfpq =
    * codebooks+centroids, ivf = centroids, lsh = meta+vectors. None =
    * not a built index. */
  def indexKind(spark: org.apache.spark.sql.SparkSession,
                indexDir: String): Option[String] = {
    val root = new org.apache.hadoop.fs.Path(indexDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    def has(sub: String) =
      fs.exists(new org.apache.hadoop.fs.Path(root, sub))
    if (has("stats") && has("postings")) Some("bm25")
    else if (has("codebooks") && has("centroids")) Some("ivfpq")
    else if (has("centroids") && has("vectors")) Some("ivf")
    else if (has("meta") && has("vectors")) Some("lsh")
    else None
  }

  def ensureIndex(spark: org.apache.spark.sql.SparkSession, indexDir: String,
                  method: String, corpusUri: String, idCol: String,
                  vecCol: String, nBits: Int = 16, dim: Int = 64,
                  partitionBits: Int = 8, kLists: Int = 16,
                  metaCols: Seq[String] = Nil,
                  pqM: Int = 8, pqK: Int = 64,
                  keepVectors: Boolean = false,
                  opq: Boolean = false): Unit = {
    require(method == "lsh" || method == "ivf" || method == "ivfpq",
      s"ensureIndex: unknown method $method")
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val builtMarker = if (method == "lsh") "meta" else "centroids"
    if (fs.exists(new org.apache.hadoop.fs.Path(indexDir, builtMarker))) return
    val corpus = spark.read.parquet(corpusUri)
    method match {
      case "ivf" =>
        ivfBuild(corpus, idCol, vecCol, indexDir, kLists, metaCols = metaCols)
        ()
      case "ivfpq" =>
        Pq.ivfPqBuild(corpus, idCol, vecCol, indexDir, kLists, pqM, pqK,
          metaCols = metaCols, keepVectors = keepVectors, opq = opq)
      case _ =>
        lshBuild(corpus, idCol, vecCol, indexDir, nBits, dim, partitionBits,
          metaCols)
        ()
    }
  }

  /** Batch counterpart of [[lshTopKIndexed]]: resolves the SAME cached
    * index (single-query and batch calls under one `cacheKey` share one
    * build), then runs the one-pass pruned [[lshQueryBatch]]. */
  def lshTopKBatchIndexed(df: DataFrame, idCol: String, vecCol: String,
                          cacheKey: String, queries: Seq[(Long, Seq[Double])],
                          k: Int, nBits: Int = 16, minCandidates: Int = 100,
                          partitionBits: Int = 8): DataFrame = {
    // validate the batch BEFORE resolving the cache: a ragged batch must
    // not cost a full index build it could never use
    require(queries.nonEmpty, "lshTopKBatchIndexed: empty query batch")
    val dims = queries.map(_._2.size).distinct
    require(dims.size == 1, s"lshTopKBatchIndexed: ragged query dims $dims")
    val dim = dims.head
    val dir = cachedIndex(df, cacheKey, s"lsh|b=$nBits|d=$dim|p=$partitionBits",
      Some((newRows, d) => lshAppend(newRows, idCol, vecCol, d))) { d =>
      lshBuild(df, idCol, vecCol, d, nBits, dim, partitionBits)
    }
    lshQueryBatch(df.sparkSession, dir, queries, k, minCandidates)
  }
}
