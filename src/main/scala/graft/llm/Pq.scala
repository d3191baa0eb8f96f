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
  * The hot paths are two native codegen'd loops: encoding is the whole
  * m×k argmin as one primitive pass per row
  * ([[graft.functions.PqEncode]]), and probe scoring is one
  * [[graft.functions.PqAdcDots]] pass that resolves a code row against
  * EVERY query of a batch (and the reconstruction-norm tables) in a
  * single loop. Training mirrors the [[Embeddings.pcaFit]] posture:
  * deterministic bounded sample, seeded driver k-means per subspace, so
  * the codebook is reproducible at any parallelism. IVFPQ indexes
  * default to RESIDUAL encoding ([[pqTrainResidual]] — Jégou §III-C),
  * recorded in the self-describing `enc` sidecar column.
  *
  * Accuracy contract: ADC is an approximation (quantization error per
  * subspace); probes rank by the EXACT cosine of the query against the
  * PQ reconstruction (closed-form from the codes — see adcCosScored),
  * the spec pins recall vs exact top-k on natural queries, residual-vs-
  * raw fidelity, and exactness on planted duplicate cliques (identical
  * vectors share codes, so their scores tie at the top by
  * construction). */
object Pq {

  /** codebooks(m)(k) = the k-th codeword of subspace m (subDim doubles). */
  final case class PqModel(m: Int, k: Int, subDim: Int,
                           codebooks: Array[Array[Array[Double]]]) {
    def compression(bytesPerFloat: Int = 4): Double =
      (subDim.toLong * m * bytesPerFloat).toDouble / m
  }

  /** Deterministic bounded training sample: the first `trainSample` rows
    * by id, as double arrays (the [[Embeddings.pcaFit]] posture — same
    * sample at any parallelism). */
  private def sampleVecs(df: DataFrame, idCol: String, vecCol: String,
                         trainSample: Int): Array[Array[Double]] =
    // EXCLUDE malformed rows (null vectors / null elements) exactly as
    // trainCentroids and the probe paths do — one bad row in the sample
    // otherwise kills the whole build AFTER the centroid-training pass
    df.select(col(idCol), col(vecCol))
      .filter(col(vecCol).isNotNull)
      .orderBy(col(idCol)).limit(trainSample)
      .collect().flatMap { r =>
        val xs = r.getSeq[Any](1)
        if (xs == null || xs.contains(null)) None
        else Some(xs.map {
          case f: Float => f.toDouble; case d: Double => d
          case n: Number => n.doubleValue()
        }.toArray)
      }

  /** Train an (m × k) codebook on a deterministic bounded sample. */
  def pqTrain(df: DataFrame, idCol: String, vecCol: String,
              m: Int, k: Int, trainSample: Int = 4096): PqModel =
    trainBooks("pqTrain",
      sampleAndValidate("pqTrain", df, idCol, vecCol, m, k, trainSample),
      m, k)

  /** The shared trainer body: deterministic sample + dim/param guards
    * (ONE implementation, so the raw and residual trainers can never
    * diverge on sampling, seeding, or validation). */
  private def sampleAndValidate(who: String, df: DataFrame, idCol: String,
                                vecCol: String, m: Int, k: Int,
                                trainSample: Int): Array[Array[Double]] = {
    require(m > 0 && k > 1 && k <= 256, s"$who: need m > 0, 1 < k <= 256")
    val sample = sampleVecs(df, idCol, vecCol, trainSample)
    require(sample.nonEmpty, s"$who: empty training sample")
    val dims = sample.map(_.length).distinct
    require(dims.length == 1,
      s"$who: ragged vector dims ${dims.toSeq.sorted} in the training sample")
    val dim = sample.head.length
    require(dim % m == 0, s"$who: dim $dim not divisible by m=$m")
    sample
  }

  /** Per-subspace seeded k-means over an already-validated sample.
    * Subspaces are independent — k-means them concurrently (driver-side
    * CPU work, ~m × iters × n × k × subDim flops; serial it dominated
    * at the default m=8). Seeds are 42+mi in BOTH trainers. */
  private def trainBooks(who: String, sample: Array[Array[Double]],
                         m: Int, k: Int): PqModel = {
    val subDim = sample.head.length / m
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

  /** Train an (m × k) codebook on RESIDUALS `v − centroid[list]` — the
    * standard IVFPQ formulation (Jégou et al. PAMI'11 §III-C, the FAISS
    * IVFADC default): subtracting each vector's coarse centroid
    * concentrates the quantizer's input range around the origin, so the
    * same k codewords spend their capacity on the WITHIN-list geometry
    * instead of re-describing the between-list offsets the IVF lists
    * already encode — materially better ADC fidelity on clustered data,
    * which IVF lists create by construction. Same deterministic sample
    * and seeded per-subspace k-means as [[pqTrain]]; list assignment of
    * the sample replays [[Similarity.ivfAssign]]'s argmin driver-side. */
  def pqTrainResidual(df: DataFrame, idCol: String, vecCol: String,
                      centroids: Array[Array[Double]], m: Int, k: Int,
                      trainSample: Int = 4096): PqModel = {
    val sample = sampleAndValidate("pqTrainResidual", df, idCol, vecCol,
      m, k, trainSample)
    val dim = sample.head.length
    require(centroids.nonEmpty && centroids.head.length == dim,
      s"pqTrainResidual: centroid dim ${centroids.headOption.map(_.length)} != $dim")
    val residuals = sample.map { v =>
      val c = centroids(nearestIdx(centroids, v))
      Array.tabulate(dim)(j => v(j) - c(j))
    }
    trainBooks("pqTrainResidual", residuals, m, k)
  }

  /** Train an OPTIMIZED-PQ model on residuals — codebooks PLUS a learned
    * orthogonal rotation R (Ge et al., CVPR'13 "Optimized Product
    * Quantization", the non-parametric alternation): codes quantize
    * z = R·(v − c_list), so the rotation re-mixes correlated dimensions
    * across subspaces before the per-subspace k-means, recovering the
    * accuracy a fixed axis-aligned split leaves on the table. Each round
    * (a) trains codebooks on the rotated residuals and (b) updates R by
    * the orthogonal-Procrustes closed form — SVD(Ẑ·Xᵀ) = U·S·Vᵀ,
    * R ← U·Vᵀ — which is the exact minimizer of ‖R·X − Ẑ‖_F over
    * orthogonal R; a final codebook pass trains against the settled
    * rotation. Deterministic end to end (seeded k-means, closed-form
    * SVD, fixed iteration count); all driver-side over the bounded
    * sample, like every trainer here. Returns (model, R). */
  def pqTrainOpq(df: DataFrame, idCol: String, vecCol: String,
                 centroids: Array[Array[Double]], m: Int, k: Int,
                 trainSample: Int = 4096, iters: Int = 6)
      : (PqModel, Array[Array[Double]]) = {
    require(iters > 0, s"pqTrainOpq: iters must be positive, got $iters")
    val sample = sampleAndValidate("pqTrainOpq", df, idCol, vecCol,
      m, k, trainSample)
    val dim = sample.head.length
    require(centroids.nonEmpty && centroids.head.length == dim,
      s"pqTrainOpq: centroid dim ${centroids.headOption.map(_.length)} != $dim")
    val subDim = dim / m
    val residuals = sample.map { v =>
      val c = centroids(nearestIdx(centroids, v))
      Array.tabulate(dim)(j => v(j) - c(j))
    }
    var r = Array.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0)
    for (_ <- 0 until iters) {
      val z = residuals.map(x => matVec(r, x))
      val model = trainBooks("pqTrainOpq", z, m, k)
      val zhat = z.map(encodeDecode(model, _, subDim))
      // Procrustes update: M = Ẑ·Xᵀ (dim×dim, accumulated over the
      // sample), R = U·Vᵀ of its SVD
      val mm = breeze.linalg.DenseMatrix.zeros[Double](dim, dim)
      residuals.indices.foreach { i =>
        val x = residuals(i); val zh = zhat(i)
        var a = 0
        while (a < dim) {
          val za = zh(a); var b = 0
          while (b < dim) { mm(a, b) += za * x(b); b += 1 }
          a += 1
        }
      }
      val s = breeze.linalg.svd(mm)
      val ru = s.U * s.Vt
      r = Array.tabulate(dim, dim)((i, j) => ru(i, j))
    }
    val model = trainBooks("pqTrainOpq",
      residuals.map(x => matVec(r, x)), m, k)
    (model, r)
  }

  /** Driver-side PQ round trip z → codes → ẑ (per-subspace argmin then
    * codeword concat) — the trainer's reconstruction step. */
  private def encodeDecode(model: PqModel, z: Array[Double],
                           subDim: Int): Array[Double] = {
    val out = new Array[Double](z.length)
    var mi = 0
    while (mi < model.m) {
      var best = 0; var bestD = Double.MaxValue; var ki = 0
      while (ki < model.k) {
        val cw = model.codebooks(mi)(ki)
        var d = 0.0; var j = 0
        while (j < subDim) {
          val t = z(mi * subDim + j) - cw(j); d += t * t; j += 1
        }
        if (d < bestD) { bestD = d; best = ki }
        ki += 1
      }
      System.arraycopy(model.codebooks(mi)(best), 0, out, mi * subDim, subDim)
      mi += 1
    }
    out
  }

  /** argmin ‖x − c‖² over centroids, ties to the smaller index — the
    * driver-side replay of [[graft.functions.NearestCentroid]]'s
    * assignment (same tie-break), used to residualize the training
    * sample consistently with the in-plan list assignment. */
  private def nearestIdx(centroids: Array[Array[Double]],
                         x: Array[Double]): Int = {
    var best = 0; var bd = Double.MaxValue; var c = 0
    while (c < centroids.length) {
      var s = 0.0; var j = 0
      while (j < x.length) { val t = x(j) - centroids(c)(j); s += t * t; j += 1 }
      if (s < bd) { bd = s; best = c }
      c += 1
    }
    best
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
  def codesCol(vecCol: String, model: PqModel): Column =
    graft.functions.PqF.pqEncode(col(vecCol), flatCodebook(model),
      model.m, model.k, model.subDim)

  /** The (mi·k + ki)·subDim flattened codebook layout both encoders
    * ship to [[graft.functions.PqEncode]] — ONE copy of the indexing
    * so the raw and residual paths can never drift. */
  private def flatCodebook(model: PqModel): Array[Double] = {
    val flat = new Array[Double](model.m * model.k * model.subDim)
    for (mi <- 0 until model.m; ki <- 0 until model.k) {
      System.arraycopy(model.codebooks(mi)(ki), 0, flat,
        (mi * model.k + ki) * model.subDim, model.subDim)
    }
    flat
  }

  /** (id, codes array<tinyint>): per-subspace nearest codeword. */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
               model: PqModel): DataFrame =
    df.select(col(idCol).as("id"), codesCol(vecCol, model).as("codes"))

  /** RESIDUAL PQ-codes expression: encode `v − centroid[list]` with a
    * residual-trained codebook ([[pqTrainResidual]]). The subtraction is
    * a codegen'd `zip_with` against the centroid-matrix literal (one
    * nested-array literal in the plan, kLists×dim doubles — shipped
    * once, not per row); the m×k argmin stays the native
    * [[graft.functions.PqEncode]] loop. Runs only at build/append time —
    * probes never decode. */
  def codesColRes(vecCol: String, listCol: String, model: PqModel,
                  centroids: Array[Array[Double]],
                  rot: Option[Array[Array[Double]]] = None): Column = {
    val centsLit = typedLit(centroids.map(_.toSeq).toSeq)
    val residual = zip_with(
      col(vecCol).cast("array<double>"),
      element_at(centsLit, col(listCol) + 1),
      (x, c) => x - c)
    // OPQ: rotate the residual into codeword space before the argmin —
    // R·r via the native MatVecDots loop (R's rows as the query matrix)
    val encoded = rot match {
      case Some(r) =>
        graft.functions.MatVecF.dots(residual, r.map(_.toSeq).toSeq)
      case None => residual
    }
    graft.functions.PqF.pqEncode(encoded, flatCodebook(model),
      model.m, model.k, model.subDim)
  }

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
    * [[ivfPqAppend]]; retrain in place via [[ivfPqRetrain]] when built
    * with `keepVectors = true`, else via a fresh build on drift cadence
    * (monitor [[Similarity.ivfListStats]]).
    *
    * `keepVectors` (opt-in) additionally persists a `vectors_f32` FLOAT
    * sidecar — (id, list, v, meta…) partitioned by the same list
    * assignment as the codes. It is never read on the probe path (ADC
    * stays code-only), but it is what makes two lifecycle verbs possible
    * on a compressed index: a skew-triggered [[ivfPqRetrain]] (codes
    * cannot re-encode themselves) and exact MMR diversification over
    * served candidates (answer-sized id-joins against the sidecar). The
    * cost is storing the floats the compression otherwise discards —
    * the operator chooses compressed-only (cheapest, rebuild from source
    * on drift) or sidecar-carrying (self-contained lifecycle). */
  def ivfPqBuild(df: DataFrame, idCol: String, vecCol: String,
                 indexDir: String, kLists: Int = 64, m: Int = 8,
                 k: Int = 64, trainSample: Int = 4096,
                 metaCols: Seq[String] = Nil,
                 residual: Boolean = true,
                 keepVectors: Boolean = false,
                 opq: Boolean = false): Unit = {
    Similarity.requireValidMetaCols(metaCols,
      Set("id", "v", "list", "codes"), "ivfPqBuild")
    require(!opq || residual,
      "ivfPqBuild: opq is a refinement of the residual formulation " +
        "(codes quantize R·(v − centroid)); residual=false excludes it")
    val spark = df.sparkSession
    val centroids = Similarity.trainCentroids(df, idCol, vecCol, kLists, trainSample)
    // residual (default): codebooks trained on v − centroid[list] — the
    // Jégou §III-C / FAISS-default formulation (see pqTrainResidual);
    // `opq = true` additionally learns the Ge et al. orthogonal rotation
    // ([[pqTrainOpq]]); `residual = false` keeps the plain
    // global-codebook encoding for A/B comparison and as the documented
    // shape of pre-residual indexes
    val (model, rot) =
      if (opq) {
        val (mdl, r) = pqTrainOpq(df, idCol, vecCol, centroids, m, k, trainSample)
        (mdl, Some(r))
      }
      else if (residual)
        (pqTrainResidual(df, idCol, vecCol, centroids, m, k, trainSample), None)
      else (pqTrain(df, idCol, vecCol, m, k, trainSample), None)
    Similarity.stagedCommit(spark, indexDir) { staging =>
      val codes =
        if (residual) codesColRes("v", "list", model, centroids, rot)
        else codesCol("v", model)
      val assigned = Similarity.ivfAssign(df, idCol, vecCol, centroids, metaCols)
      if (!keepVectors)
        Similarity.clusteredWrite(
            assigned.select(col("id") +: col("list") +:
                codes.as("codes") +: metaCols.map(col): _*),
            "list", kLists)
          .write.mode("overwrite").partitionBy("list").parquet(s"$staging/vectors")
      else
        writeCodesAndFloats(assigned, codes, metaCols, kLists,
          s"$staging/vectors", s"$staging/$vectorSidecarDir")
      Similarity.writeCentroids(spark, s"$staging/centroids", centroids)
      writeCodebooks(spark, s"$staging/codebooks", model,
        if (opq) "opq" else if (residual) "res" else "raw", rot)
    }
  }

  /** The two-layout write of a sidecar-carrying index: materialize the
    * assigned+encoded frame ONCE (persist, spill-tolerant) and land the
    * codes and float layouts from the cached pass — without it, each
    * layout's write re-executed the full corpus scan, nearest-centroid
    * assignment, and PQ encode, doubling the dominant cost of every
    * keepVectors build/append/retrain. */
  private def writeCodesAndFloats(assigned: DataFrame, codes: Column,
                                  metaCols: Seq[String], kLists: Int,
                                  codesDir: String, floatsDir: String): Unit = {
    // the sidecar stores FLOAT32 — what the name promises, and half the
    // bytes of double at sidecar scale. Lossless for float32 sources
    // (every embedding table here); a double-valued corpus quantizes to
    // float32 once at build, and every sidecar consumer (retrain
    // training, MMR cosines, refined rerank) reads that same
    // representation, so they stay mutually consistent.
    val combined = assigned.select(col("id") +: col("list") +:
        codes.as("codes") +:
        col("v").cast("array<float>").as("v") +: metaCols.map(col): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      Similarity.clusteredWrite(
          combined.select("id" +: "list" +: "codes" +: metaCols map col: _*),
          "list", kLists)
        .write.mode("overwrite").partitionBy("list").parquet(codesDir)
      // the sidecar lands SORTED BY id within each file: its consumers
      // (MMR candidate fetch, refined rerank) read it through an
      // `id IN (…)` pushdown, and sorted files give every parquet
      // row-group a tight id min/max — the pruning that keeps a
      // candidate fetch answer-sized instead of corpus-sized. `list`
      // leads the sort so the dynamic-partition writer's required
      // ordering (partition cols) is already satisfied and no second,
      // id-order-destroying sort is planned.
      Similarity.clusteredWrite(
          combined.select("id" +: "list" +: "v" +: metaCols map col: _*),
          "list", kLists)
        .sortWithinPartitions("list", "id")
        .write.mode("overwrite").partitionBy("list").parquet(floatsDir)
    } finally { combined.unpersist(); () }
  }

  /** The float-sidecar subdir name an opt-in `keepVectors` build/append
    * maintains next to the code partitions. */
  val vectorSidecarDir = "vectors_f32"

  /** Whether `indexDir` carries the opt-in float sidecar — the gate for
    * [[ivfPqRetrain]] and for exact MMR over a compressed serving leg.
    * Pure FS existence check, no Spark job. */
  def hasVectorSidecar(spark: org.apache.spark.sql.SparkSession,
                       indexDir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/$vectorSidecarDir")
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** BACKFILL the float sidecar onto a CODES-ONLY index — the upgrade
    * path that turns "rebuild with keepVectors" (a multi-day job at
    * 100 TB: retrain + re-encode + rewrite) into ONE aligned write:
    * re-read the source corpus, join it against the index's EXISTING
    * (id, list) assignment — NEVER re-assign: centroids may have
    * drifted since build (appends, or simply a different training
    * sample on rebuild), and a re-assigned sidecar would put floats in
    * lists their codes don't live in, silently corrupting every
    * list-pruned rerank — and land the (list, id)-sorted float32
    * layout the `keepVectors` builds write ([[writeCodesAndFloats]]'
    * sort contract, byte-compatible consumers). The index's metadata
    * columns ride along from the CODES side (a later [[ivfPqRetrain]]
    * reconstructs the whole index from this sidecar — backfilling
    * without them would strip the filtered probes).
    *
    * Alignment is VALIDATED before the sidecar goes live: the staged
    * write must cover exactly the index's (non-tombstoned) rows — a
    * source missing index ids (or carrying duplicate ids) fails loudly
    * with id samples, and the staging is discarded. The swap is a
    * single dir rename; a crash before it leaves the index codes-only
    * and fully servable, a retry re-stages from scratch. After the
    * backfill, refined/MMR/retrain all serve as if the index had been
    * built with `keepVectors`, and [[ivfPqAppend]] maintains the
    * sidecar from the next batch on.
    *
    * Cost honesty at scale: one co-shuffle of (source ⋈ assignment) on
    * id plus one clustered write — the source and the codes are both
    * corpus-sized, so this is a full-shuffle job, but it replaces a
    * rebuild that pays the same join-scale I/O PLUS k-means PLUS PQ
    * encode, and it never touches the live layout until the rename.
    * Returns the number of sidecar rows written. */
  def ivfPqAddSidecar(src: DataFrame, idCol: String, vecCol: String,
                      indexDir: String): Long = {
    val spark = src.sparkSession
    require(!hasVectorSidecar(spark, indexDir),
      s"ivfPqAddSidecar: $indexDir already carries a $vectorSidecarDir " +
        "sidecar — appends maintain it; a corrupted one should be " +
        "deleted first, explicitly")
    Similarity.healStrandedAppends(spark, indexDir)
    val idx = ivfPqMeta(spark, indexDir)
    val kLists = idx.centroids.length
    val dim = idx.model.m * idx.model.subDim
    val metaCols = idx.vectors.schema.fieldNames
      .filterNot(Set("id", "list", "codes")).toSeq
    val vecs = src.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<float>").as("v"))
    // dim fence before any distributed work (one row's worth of source);
    // an EMPTY source fails here with its own message, not head()'s bare
    // NoSuchElementException. Rows 2..n are fenced distributedly below.
    val sampleRow = vecs.select(size(col("v"))).limit(1).collect()
    require(sampleRow.nonEmpty, "ivfPqAddSidecar: empty source frame")
    val sampleDim = sampleRow.head.getInt(0)
    require(sampleDim == dim,
      s"ivfPqAddSidecar: source vector dim $sampleDim != index dim $dim")
    val assignment =
      idx.vectors.select("id" +: "list" +: metaCols map col: _*)
    val joined = assignment.join(vecs, Seq("id"))
      .select("id" +: "list" +: "v" +: metaCols map col: _*)
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val target = fs.makeQualified(
      new org.apache.hadoop.fs.Path(s"$indexDir/$vectorSidecarDir"))
    val staging = new org.apache.hadoop.fs.Path(
      target.getParent, s".$vectorSidecarDir.staging")
    fs.delete(staging, true)
    Similarity.clusteredWrite(joined, "list", kLists)
      .sortWithinPartitions("list", "id")
      .write.mode("overwrite").partitionBy("list")
      .parquet(staging.toString)
    // alignment check against the STAGED rows (parquet-footer counts):
    // every index row must have exactly one float — fewer means the
    // source lost ids since build, more means duplicate source ids;
    // both corrupt reranks silently if let through
    // ONE aggregate pass over the staged write covers all three
    // invariants (the distinct count catches the pathological shape a
    // bare row-count compare misses: k duplicated source ids cancelling
    // k missing ones; the misdim count fences ragged vectors beyond the
    // sampled first row, which would otherwise corrupt every refined
    // rerank dot product) — at backfill scale a second corpus-sized
    // validation scan would roughly double the check's cost
    val vRow = spark.read.parquet(staging.toString)
      .agg(count(lit(1)), count_distinct(col("id")),
        count(when(size(col("v")) =!= dim || col("v").isNull, 1)))
      .head()
    val (written, writtenDistinct, misdim) =
      (vRow.getLong(0), vRow.getLong(1), vRow.getLong(2))
    if (misdim > 0) {
      val bad = spark.read.parquet(staging.toString)
        .filter(size(col("v")) =!= dim || col("v").isNull)
        .select("id").limit(5).collect().map(_.getLong(0))
      fs.delete(staging, true)
      throw new IllegalArgumentException(
        s"ivfPqAddSidecar: $misdim source vectors are null or not dim " +
          s"$dim (sample ids: ${bad.mkString(",")}) — a ragged sidecar " +
          "would corrupt every refined rerank")
    }
    val nCodes = idx.vectors.count()
    if (written != nCodes || writtenDistinct != nCodes) {
      val stagedIds = spark.read.parquet(staging.toString).select("id")
      val missing = assignment.select("id")
        .join(stagedIds.distinct(), Seq("id"), "left_anti")
        .limit(5).collect().map(_.getLong(0))
      val dups = stagedIds.groupBy("id").count().filter(col("count") > 1)
        .limit(5).collect().map(_.getLong(0))
      fs.delete(staging, true)
      throw new IllegalArgumentException(
        s"ivfPqAddSidecar: staged sidecar has $written rows for $nCodes " +
          s"index rows — source/index id mismatch" +
          (if (missing.nonEmpty)
             s"; index ids missing from source (sample): ${missing.mkString(",")}"
           else "") +
          (if (dups.nonEmpty)
             s"; duplicated source ids (sample): ${dups.mkString(",")}"
           else ""))
    }
    if (!fs.rename(staging, target))
      throw new java.io.IOException(
        s"ivfPqAddSidecar: rename $staging -> $target failed")
    written
  }

  /** The codebook sidecar, self-describing: `enc` records whether codes
    * quantize residuals ("res"), rotated residuals ("opq"), or raw
    * vectors ("raw") — a reader never guesses, and an index built before
    * the residual formulation landed (no `enc` column) reads as "raw".
    * An OPQ rotation rides in the SAME sidecar as rows at m = -1 (k =
    * row index, vec = R's k-th row): one atomic artifact, so codes and
    * their rotation can never commit separately. */
  private def writeCodebooks(spark: org.apache.spark.sql.SparkSession,
                             dir: String, model: PqModel, enc: String,
                             rot: Option[Array[Array[Double]]] = None): Unit = {
    import spark.implicits._
    require((enc == "opq") == rot.isDefined,
      s"writeCodebooks: enc=$enc with rotation=${rot.isDefined}")
    val bookRows = for { mi <- 0 until model.m; ki <- 0 until model.k }
      yield (mi, ki, model.codebooks(mi)(ki).toSeq, enc)
    val rotRows = rot.toSeq.flatMap(_.zipWithIndex.map { case (row, i) =>
      (-1, i, row.toSeq, enc)
    })
    (bookRows ++ rotRows)
      .toDF("m", "k", "vec", "enc")
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
    * before list assignment does. Rebuild (or [[ivfPqRetrain]], when the
    * index carries the float sidecar) on retrain cadence; the skew
    * monitor ([[Similarity.ivfListStats]] / [[Similarity.ivfSkew]])
    * reads this index's list column the same way.
    *
    * A sidecar-carrying index ([[ivfPqBuild]] `keepVectors`) appends the
    * batch's FLOATS alongside its codes in the SAME staged commit
    * (`dataDirs = vectors, vectors_f32`) — the two layouts can never
    * diverge on a crash, and the replay fence covers both. */
  def ivfPqAppend(df: DataFrame, idCol: String, vecCol: String,
                  indexDir: String, appendId: Option[String] = None): Unit = {
    val sess = df.sparkSession
    val idx = ivfPqMeta(sess, indexDir)
    val (centroids, model, vectors) = (idx.centroids, idx.model, idx.vectors)
    val sidecar = hasVectorSidecar(sess, indexDir)
    // carry the index's metadata columns (filtered-ANN layouts), as the
    // float appends do — re-derived from the live index schema
    val metaCols = vectors.schema.map(_.name)
      .filterNot(Set("id", "list", "codes"))
    // encode to MATCH the index's own formulation (the enc sidecar
    // column): appending raw codes into a residual index would score
    // garbage under the residual ADC tables, and an OPQ index's stored
    // rotation rides into the encode the same way
    val codes =
      if (idx.residual) codesColRes("v", "list", model, centroids, idx.rot)
      else codesCol("v", model)
    val assignedAll = Similarity.ivfAssign(df, idCol, vecCol, centroids, metaCols)
    val assigned = assignedAll
      .select(col("id") +: col("list") +:
        codes.as("codes") +: metaCols.map(col): _*)
    // schema fence, as ivfAppend: a drifted type in ANY carried column
    // (id or metadata) would strand the index with unmergeable parquet
    // footers (codes are always array<tinyint> by construction)
    ("id" +: metaCols).foreach { c =>
      require(assigned.schema(c).dataType.sql == vectors.schema(c).dataType.sql,
        s"ivfPqAppend: column '$c' type ${assigned.schema(c).dataType.sql} != " +
          s"index type ${vectors.schema(c).dataType.sql}")
    }
    val dataDirs =
      if (sidecar) Seq("vectors", vectorSidecarDir) else Seq("vectors")
    Similarity.healStrandedAppends(sess, indexDir, dataDirs)
    Similarity.stagedAppend(sess, indexDir,
        appendId.getOrElse(Similarity.appendBatchId(df)),
        dataDirs) { staging =>
      if (!sidecar)
        Similarity.clusteredWrite(assigned, "list", centroids.length)
          .write.mode("overwrite").partitionBy("list")
          .parquet(s"$staging/vectors")
      else
        writeCodesAndFloats(assignedAll, codes, metaCols, centroids.length,
          s"$staging/vectors", s"$staging/$vectorSidecarDir")
    }
  }

  /** RETRAIN a drifted IVFPQ index from its own FLOAT sidecar — the
    * compressed counterpart of [[Similarity.ivfRetrain]], and the verb
    * that closes the compressed lifecycle: codes cannot re-encode
    * themselves, so it exists only for indexes built/grown with
    * `keepVectors = true` (anything else fails loudly with the rebuild
    * advice). New coarse centroids train on the same deterministic
    * hash-spread sample discipline as the float retrain (the build's
    * lowest-id sample would systematically exclude appended rows — the
    * drifted data a retrain exists to absorb), NEW codebooks train on
    * the new residuals (re-clustering changes every residual, so frozen
    * codebooks would mis-model the re-assigned lists), and every row
    * re-assigns + re-encodes from the sidecar floats. The whole layout —
    * codes, sidecar, centroids, codebooks — rewrites through one
    * [[Similarity.stagedCommit]] with the `_append` replay fences
    * carried over. Cost: two bounded training passes plus one
    * assignment/encode rewrite of the index — never a source-corpus
    * rescan, which a long-running ingest job no longer has. */
  def ivfPqRetrain(spark: org.apache.spark.sql.SparkSession,
                   indexDir: String, kLists: Int = 0,
                   trainSample: Int = 4096): Array[Array[Double]] = {
    require(hasVectorSidecar(spark, indexDir),
      s"ivfPqRetrain: $indexDir carries no $vectorSidecarDir float " +
        "sidecar (built without keepVectors) — codes cannot re-encode " +
        "themselves; rebuild from the source corpus instead")
    val dataDirs = Seq("vectors", vectorSidecarDir)
    Similarity.healStrandedAppends(spark, indexDir, dataDirs)
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val liveVec = new org.apache.hadoop.fs.Path(s"$indexDir/vectors")
    val restoreFences = Similarity.carryAppendFences(fs, liveVec)
    val idx = ivfPqMeta(spark, indexDir)
    val k = if (kLists > 0) kLists else idx.centroids.length
    // tombstoned rows are excluded from training AND the re-encode — a
    // retrain is a physical-drop point (the staged index never carries
    // the tombstones dir, so the probes' anti-join plans away after)
    val floats = Similarity.antiTombstoned(spark, indexDir,
      spark.read.parquet(s"$indexDir/$vectorSidecarDir"))
    val metaCols = floats.schema.map(_.name)
      .filterNot(Set("id", "list", "v"))
    val rows = floats.select("id" +: "v" +: metaCols map col: _*)
    val centroids = Similarity.retrainCentroids(rows, k, trainSample)
    // the codebooks retrain under the SAME encoding the index declares
    // (enc sidecar) — a residual index gets residual books against the
    // NEW centroids, an OPQ index re-learns its rotation too, a raw
    // index keeps the raw formulation
    val (model, rot) =
      if (idx.rot.isDefined) {
        val (mdl, r) = pqTrainOpq(rows, "id", "v", centroids,
          idx.model.m, idx.model.k, trainSample)
        (mdl, Some(r))
      }
      else if (idx.residual)
        (pqTrainResidual(rows, "id", "v", centroids,
          idx.model.m, idx.model.k, trainSample), None)
      else (pqTrain(rows, "id", "v", idx.model.m, idx.model.k, trainSample),
        None)
    Similarity.stagedCommit(spark, indexDir) { staging =>
      val codes =
        if (idx.residual) codesColRes("v", "list", model, centroids, rot)
        else codesCol("v", model)
      val assigned = Similarity.ivfAssign(rows, "id", "v", centroids, metaCols)
      writeCodesAndFloats(assigned, codes, metaCols, k,
        s"$staging/vectors", s"$staging/$vectorSidecarDir")
      Similarity.writeCentroids(spark, s"$staging/centroids", centroids)
      writeCodebooks(spark, s"$staging/codebooks", model,
        if (rot.isDefined) "opq" else if (idx.residual) "res" else "raw", rot)
      restoreFences(s"$staging/vectors")
    }
    centroids
  }

  /** Driver-memoized IVFPQ index state (centroids + codebooks + resolved
    * vectors DataFrame) — the [[Similarity]] ivfMeta pattern: warm probe
    * planning touches no Spark job; the pure FS-metadata stamp over the
    * sidecars AND the vectors dir's top-level listing invalidates on any
    * rebuild, append (`_append-<id>` marker changes the path set), or
    * compaction. */
  /** A resolved IVFPQ index snapshot: coarse centroids, PQ codebooks,
    * the vectors frame, and whether the codes quantize residuals. The
    * query-INDEPENDENT ADC tables (codeword norms, per-list residual
    * cross terms, centroid norms) are lazy members: ivfPqMeta memoizes
    * the snapshot, so they compute ONCE per resolved index instead of
    * rebuilding kLists·m·k doubles driver-side on EVERY probe call —
    * at kLists=1024/m=8/k=64 that was ~4M multiply-adds and a fresh
    * 4 MB literal per query. */
  final case class IvfPqIndex(centroids: Array[Array[Double]],
                              model: PqModel, vectors: DataFrame,
                              residual: Boolean,
                              rot: Option[Array[Array[Double]]] = None) {
    /** Centroids as the CODEWORDS see them: under an OPQ rotation the
      * codes quantize z = R·(v − c_L), so every table pairing a
      * centroid with a codeword must pair the ROTATED centroid (R is
      * orthogonal, so norms and q·c dots are rotation-free). */
    private def cwSpaceCentroid(li: Int): Array[Double] = rot match {
      case Some(r) => matVec(r, centroids(li))
      case None    => centroids(li)
    }
    lazy val cwNorm2: Array[Double] = {
      val a = new Array[Double](model.m * model.k)
      for (mi <- 0 until model.m; ki <- 0 until model.k) {
        val cw = model.codebooks(mi)(ki)
        var sm = 0.0; var j = 0
        while (j < model.subDim) { sm += cw(j) * cw(j); j += 1 }
        a(mi * model.k + ki) = sm
      }
      a
    }
    lazy val crossTable: Array[Double] = {
      val kLists = centroids.length
      val a = new Array[Double](kLists * model.m * model.k)
      for (li <- 0 until kLists; mi <- 0 until model.m; ki <- 0 until model.k) {
        val c = cwSpaceCentroid(li); val cw = model.codebooks(mi)(ki)
        var sm = 0.0; var j = 0
        while (j < model.subDim) { sm += c(mi * model.subDim + j) * cw(j); j += 1 }
        a((li * model.m + mi) * model.k + ki) = 2.0 * sm
      }
      a
    }
    lazy val centNorm2: Seq[Double] =
      centroids.toSeq.map(c => c.map(x => x * x).sum)
  }

  /** Dense driver-side R·x (dim² multiply-adds — training/meta-time
    * only; the in-plan rotation is [[graft.functions.MatVecF.dots]]). */
  private def matVec(r: Array[Array[Double]],
                     x: Array[Double]): Array[Double] =
    Array.tabulate(r.length) { i =>
      val row = r(i); var s = 0.0; var j = 0
      while (j < x.length) { s += row(j) * x(j); j += 1 }
      s
    }

  private val ivfPqMetaCache = new java.util.concurrent.ConcurrentHashMap[
    String, (String, IvfPqIndex)]()

  private[graft] def ivfPqMeta(spark: org.apache.spark.sql.SparkSession,
                               indexDir: String): IvfPqIndex = {
    val key = s"${Similarity.sessionTag(spark)}|$indexDir"
    val stamp = Similarity.sidecarStamp(spark, indexDir,
      Seq("centroids", "codebooks", "vectors", Similarity.tombstonesName))
    val cached = ivfPqMetaCache.get(key)
    if (cached != null && cached._1 == stamp) cached._2
    else {
      val cents = Similarity.readCentroids(spark, indexDir)
      val cbDf = spark.read.parquet(s"$indexDir/codebooks")
      // indexes written before the residual formulation carry no `enc`
      // column — their codes quantize raw vectors. "opq" is the third
      // state: residual codes under a learned orthogonal rotation whose
      // rows ride in the same sidecar at m = -1 (see writeCodebooks).
      val enc =
        if (cbDf.schema.fieldNames.contains("enc"))
          cbDf.select("enc").head().getString(0)
        else "raw"
      val all = cbDf.select("m", "k", "vec")
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
      val (rotRows, cb) = all.partition(_._1 < 0)
      val rot =
        if (enc == "opq") Some(rotRows.sortBy(_._2).map(_._3))
        else None
      require(enc != "opq" || rot.exists(_.nonEmpty),
        s"ivfPqMeta: $indexDir declares enc=opq but carries no rotation rows")
      val m = cb.map(_._1).max + 1
      val k = cb.map(_._2).max + 1
      val books = Array.ofDim[Array[Double]](m, k)
      cb.foreach { case (mi, ki, v) => books(mi)(ki) = v }
      // tombstone-filtered at the chokepoint, like ivfMeta: every ADC
      // probe reads codes through this frame, so deleted ids can never
      // be NOMINATED — which is also why the refined paths' direct
      // float-sidecar reads need no filter of their own (their id sets
      // come from nominees/pools that this frame already excludes)
      val meta = IvfPqIndex(cents, PqModel(m, k, books(0)(0).length, books),
        Similarity.antiTombstoned(spark, indexDir,
          spark.read.parquet(s"$indexDir/vectors")),
        residual = enc == "res" || enc == "opq", rot = rot)
      Similarity.capCache(ivfPqMetaCache)
      ivfPqMetaCache.put(key, (stamp, meta))
      meta
    }
  }

  /** The embedding dimension a built IVFPQ index expects — memoized
    * sidecar meta, zero Spark jobs warm (the serving layer's dim fence). */
  def ivfPqDim(spark: org.apache.spark.sql.SparkSession,
               indexDir: String): Int = {
    val idx = ivfPqMeta(spark, indexDir)
    idx.model.m * idx.model.subDim
  }

  /** Per-query ADC tables, flat (queries × m × k): entry (qi, mi, ki) =
    * query_qi's mi-th subvector · codeword (mi, ki). With RESIDUAL codes
    * the same tables apply — dot(q, ĉ+r̂) = dot(q, c_list) + dot(q, r̂),
    * so the list-dependent part is one additive constant per (query,
    * list), not a per-list table (the dot-metric privilege; L2 would
    * need per-list tables). */
  private def adcTables(model: PqModel,
                        queries: Seq[Seq[Double]]): Array[Double] = {
    val out = new Array[Double](queries.size * model.m * model.k)
    queries.zipWithIndex.foreach { case (q, qi) =>
      val qa = q.toArray
      for (mi <- 0 until model.m; ki <- 0 until model.k) {
        val cw = model.codebooks(mi)(ki)
        var s = 0.0; var j = 0
        while (j < model.subDim) { s += qa(mi * model.subDim + j) * cw(j); j += 1 }
        out((qi * model.m + mi) * model.k + ki) = s
      }
    }
    out
  }

  /** query · centroid matrix as a nested literal (queries × kLists) —
    * the residual ADC's per-(query, list) additive constant. */
  private def qcMatrix(centroids: Array[Array[Double]],
                       queries: Seq[Seq[Double]]): Seq[Seq[Double]] =
    queries.map { q =>
      val qa = q.toArray
      centroids.toSeq.map { c =>
        var s = 0.0; var j = 0
        while (j < qa.length) { s += qa(j) * c(j); j += 1 }
        s
      }
    }

  /** The shared per-(row, query) ADC COSINE scoring of every IVFPQ
    * probe: per-row [[graft.functions.PqAdcDots]] against the group's
    * ADC tables (ONE native loop scores a code row for every query), the
    * per-query probe-list membership filter (pure column math, the
    * [[Similarity]] scoreIvfGroup posture), the residual additive
    * constant when the index quantizes residuals, and the closed-form
    * reconstructed norm as denominator. The score is the EXACT cosine of
    * the query against the PQ reconstruction v̂ — the metric every other
    * graft ANN family ranks by (cos(q, v̂) → cos(q, v) as quantization
    * error → 0; a raw ADC dot would rank large-norm reconstructions
    * above true cosine neighbors). Returns (pos, id, cos) rows. */
  private def adcCosScored(vecs: DataFrame, idx: IvfPqIndex,
                           queries: Seq[(Long, Seq[Double])],
                           probeLists: Seq[Seq[Int]]): DataFrame = {
    import graft.functions.PqF
    val model = idx.model
    // OPQ: codes live in rotated space, so the query-side tables pair
    // R·q with the codewords (dot(q, Rᵀẑ) = dot(Rq, ẑ)); ‖q‖ and the
    // q·c_list constant are rotation-free (R orthogonal)
    val tableQs = idx.rot match {
      case Some(r) => queries.map { case (_, q) => matVec(r, q.toArray).toSeq }
      case None    => queries.map(_._2)
    }
    val tables = adcTables(model, tableQs)
    val qNorms = queries.map { case (_, q) => math.sqrt(q.map(x => x * x).sum) }
    val probeLit = array(probeLists.map(ls => array(ls.map(lit): _*)): _*)
    val qcTerm =
      if (idx.residual)
        element_at(element_at(
          typedLit(qcMatrix(idx.centroids, queries.map(_._2))),
          col("pos") + 1), col("list") + 1)
      else lit(0.0)
    vecs
      .withColumn("rnorm", reconNormCol(idx))
      .filter(col("rnorm").isNotNull && !isnan(col("rnorm")) && col("rnorm") > 0)
      .select(col("id"), col("list"), col("rnorm"),
        posexplode(PqF.adcDots(col("codes"), tables,
          queries.size, model.m, model.k)))
      .filter(array_contains(element_at(probeLit, col("pos") + 1), col("list")))
      .select(col("pos"), col("id"),
        round((qcTerm + col("col")) / (col("rnorm") *
          element_at(array(qNorms.map(lit): _*), col("pos") + 1)), 6).as("cos"))
      .filter(col("cos").isNotNull && !isnan(col("cos")))
  }

  /** The shared top-k tail: [[adcCosScored]] + bounded-heap top-k per
    * query (batch ≡ per-query by construction). Returns (qid, id, cos). */
  private def scoreAdcGroup(vecs: DataFrame, idx: IvfPqIndex,
                            queries: Seq[(Long, Seq[Double])],
                            probeLists: Seq[Seq[Int]], k: Int): DataFrame = {
    import graft.functions.TopKF
    val qIds = queries.map(_._1)
    adcCosScored(vecs, idx, queries, probeLists)
      .groupBy("pos")
      .agg(TopKF.topKByScore(col("cos"), col("id"), k).as("topk"))
      .select(element_at(array(qIds.map(lit): _*), col("pos") + 1).as("qid"),
        explode(col("topk")).as("hit"))
      .select(col("qid"), col("hit.id").as("id"), col("hit.score").as("cos"))
  }

  /** IVF+PQ probe: nearest `nprobe` lists chosen driver-side against
    * the centroid sidecar (memoized — zero Spark jobs warm), a
    * partition-pruned read of those lists, ADC cosine scoring
    * (residual-aware, reconstructed-norm denominator — see
    * [[adcCosScored]]), bounded-heap top-k. Returns (id, cos). */
  def ivfPqQuery(spark: org.apache.spark.sql.SparkSession, indexDir: String,
                 query: Seq[Double], topK: Int, nprobe: Int = 8): DataFrame = {
    val idx = ivfPqMeta(spark, indexDir)
    require(query.size == idx.model.m * idx.model.subDim,
      s"ivfPqQuery: query dim ${query.size} != index dim ${idx.model.m * idx.model.subDim}")
    val lists = Similarity.nearestLists(idx.centroids, query.toArray, nprobe)
    val probe = idx.vectors
      .filter(col("list").isin(lists.map(Integer.valueOf): _*))
    scoreAdcGroup(probe, idx, Seq((0L, query)), Seq(lists), topK)
      .select("id", "cos")
  }

  /** QUERY a built IVFPQ index with a BATCH of query vectors in ONE
    * pruned code pass — the compressed member of the batched serving
    * matrix ([[Similarity.ivfQueryBatch]]'s shape at 32× smaller reads):
    * one read over the UNION of all queries' nprobe lists, each code row
    * ADC-scored against the whole batch via ONE native
    * [[graft.functions.PqAdcDots]] loop, a per-row membership filter
    * keeping each query's candidates to ITS OWN lists (batch ≡ per-query
    * [[ivfPqQuery]]), bounded-heap top-k per query. Returns (qid, id,
    * cos). Same `chunkSize` plan-literal bound as every batch entry
    * point (the ADC-table reference object is chunk × m × k doubles). */
  def ivfPqQueryBatch(spark: org.apache.spark.sql.SparkSession,
                      indexDir: String, queries: Seq[(Long, Seq[Double])],
                      k: Int, nprobe: Int = 8,
                      chunkSize: Int = 256): DataFrame = {
    // ONE telemetry leg per logical probe call (the chunk recursion and
    // the refined wrapper both go through the un-recording core)
    ProbeStats.record("ivfpq", queries.size, nprobe, nprobe, 0)
    ivfPqQueryBatchCore(spark, indexDir, queries, k, nprobe, chunkSize)
  }

  private def ivfPqQueryBatchCore(spark: org.apache.spark.sql.SparkSession,
                      indexDir: String, queries: Seq[(Long, Seq[Double])],
                      k: Int, nprobe: Int,
                      chunkSize: Int): DataFrame = {
    require(queries.nonEmpty, "ivfPqQueryBatch: empty query batch")
    val dims = queries.map(_._2.size).distinct
    require(dims.size == 1, s"ivfPqQueryBatch: ragged query dims $dims")
    require(chunkSize > 0, "ivfPqQueryBatch: chunkSize must be positive")
    if (queries.size > chunkSize)
      return queries.grouped(chunkSize)
        .map(c => ivfPqQueryBatchCore(spark, indexDir, c, k, nprobe, chunkSize))
        .reduce(_ unionByName _)
    val idx = ivfPqMeta(spark, indexDir)
    require(dims.head == idx.model.m * idx.model.subDim,
      s"ivfPqQueryBatch: query dim ${dims.head} != index dim ${idx.model.m * idx.model.subDim}")
    val probeLists = queries.map { case (_, q) =>
      Similarity.nearestLists(idx.centroids, q.toArray, nprobe)
    }
    val allLists = probeLists.flatten.distinct
    scoreAdcGroup(
      idx.vectors.filter(col("list").isin(allLists.map(Integer.valueOf): _*)),
      idx, queries, probeLists, k)
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
    val idx = ivfPqMeta(spark, indexDir)
    require(query.size == idx.model.m * idx.model.subDim,
      s"ivfPqQueryFiltered: query dim ${query.size} != index dim ${idx.model.m * idx.model.subDim}")
    val kLists = idx.centroids.length
    var probe = math.min(math.max(1, nprobe), kLists)
    while (true) {
      val lists = Similarity.nearestLists(idx.centroids, query.toArray, probe)
      val res = scoreAdcGroup(
        idx.vectors.filter(col("list").isin(lists.map(Integer.valueOf): _*))
          .filter(pred),
        idx, Seq((0L, query)), Seq(lists), topK)
        .select("id", "cos")
      // ONE job per widening round: the ≤topK answer rows ARE the
      // satisfied-count, so collect them and decide — a separate
      // res.count() pass doubled probe latency exactly when the filter
      // was most selective, and the satisfied case re-ran the scoring
      // at consumption. The local return is the batch variant's posture.
      val rows = res.collect()
      if (probe >= kLists || rows.length >= topK)
        return Similarity.localFrame(spark, rows, res.schema)
      probe = math.min(probe * 2, kLists)
    }
    throw new IllegalStateException("unreachable")
  }

  /** BATCH filtered top-k against a built IVFPQ index —
    * [[ivfPqQueryFiltered]] for a query stream, the
    * [[Similarity.ivfQueryBatchFiltered]] machinery over codes: each
    * round scores ALL still-unsatisfied queries in ONE pred-filtered
    * pruned ADC pass, finalizes every query with k eligible survivors
    * (or a full-width probe), and doubles the probe width for the rest —
    * per-query answers equal [[ivfPqQueryFiltered]] at the same starting
    * `nprobe`. Returns (qid, id, cos), qid-then-rank ordered. */
  def ivfPqQueryBatchFiltered(spark: org.apache.spark.sql.SparkSession,
                              indexDir: String,
                              queries: Seq[(Long, Seq[Double])], k: Int,
                              pred: Column, nprobe: Int = 8,
                              chunkSize: Int = 256): DataFrame = {
    require(queries.nonEmpty, "ivfPqQueryBatchFiltered: empty query batch")
    val dims = queries.map(_._2.size).distinct
    require(dims.size == 1, s"ivfPqQueryBatchFiltered: ragged query dims $dims")
    require(chunkSize > 0, "ivfPqQueryBatchFiltered: chunkSize must be positive")
    // qid-keyed widening loop — duplicates would conflate two queries'
    // pools and double-emit rows (the float twin's guard)
    require(queries.map(_._1).distinct.size == queries.size,
      "ivfPqQueryBatchFiltered: duplicate qids in one batch")
    val idx = ivfPqMeta(spark, indexDir)
    require(dims.head == idx.model.m * idx.model.subDim,
      s"ivfPqQueryBatchFiltered: query dim ${dims.head} != index dim ${idx.model.m * idx.model.subDim}")
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
          Similarity.nearestLists(idx.centroids, q._2.toArray, width))
        // full-width bypass, as the float twin: once the union covers
        // every list the isin buys nothing on the most expensive rounds
        val allLists = probeLists.flatten.distinct
        val pruned =
          if (allLists.size >= kLists) eligible
          else eligible.filter(col("list").isin(allLists.map(Integer.valueOf): _*))
        scoreAdcGroup(pruned, idx, chunk, probeLists, k).collect()
      }
      val byQ = rows.groupBy(_.getLong(0))
      val (done, todo) = pending.partition(q =>
        width >= kLists || byQ.getOrElse(q._1, Seq.empty).size >= k)
      acc ++= done.flatMap(q => byQ.getOrElse(q._1, Seq.empty)
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))))
      pending = todo
      width = math.min(width * 2, kLists)
    }
    ProbeStats.record("ivfpq_filtered", queries.size, widthStart, widthUsed,
      rounds - 1)
    import spark.implicits._
    acc.toSeq.sortBy { case (qid, id, c) => (qid, -c, id) }
      .toDF("qid", "id", "cos")
  }

  /** REFINED probe — the FAISS refine/rerank pattern over a keepVectors
    * index: the compressed ADC pass nominates `k × rerankFactor`
    * candidates (list-pruned, 32× smaller reads — the cheap wide net),
    * then the EXACT cosine reranks just those candidates from the
    * `vectors_f32` sidecar (an answer-sized id-join, never a corpus
    * scan) and keeps the true top-k. Recall approaches exact search as
    * `rerankFactor` grows while the scan cost stays the compressed
    * probe's; precision within the candidate set is EXACT (true
    * cosines, not reconstructions). Requires the float sidecar — a
    * codes-only index cannot refine and fails with the build advice. */
  def ivfPqQueryRefined(spark: org.apache.spark.sql.SparkSession,
                        indexDir: String, query: Seq[Double], k: Int,
                        nprobe: Int = 8, rerankFactor: Int = 4): DataFrame = {
    val batch = ivfPqQueryBatchRefined(spark, indexDir, Seq((0L, query)), k,
      nprobe, rerankFactor)
    batch.select("id", "cos")
  }

  /** Batch twin of [[ivfPqQueryRefined]]: ONE pruned ADC pass nominates
    * every query's widened candidate set, ONE sidecar join fetches the
    * union's floats, exact cosines rerank per query. Returns
    * (qid, id, cos); within each qid the exploded top-k is rank-ordered,
    * global qid order is unspecified (group by qid to slice). */
  def ivfPqQueryBatchRefined(spark: org.apache.spark.sql.SparkSession,
                             indexDir: String,
                             queries: Seq[(Long, Seq[Double])], k: Int,
                             nprobe: Int = 8,
                             rerankFactor: Int = 4,
                             chunkSize: Int = 256): DataFrame = {
    // ONE telemetry leg PER CHUNK — the engine-wide refined convention
    // (ivfpq_filtered_refined and ivfpq_range_refined both book per
    // chunk), so ServeStats 'calls' rollups are comparable across the
    // refined ops. The leaf core records AFTER its nomination collect
    // succeeds, so a rejected call (bad params, missing sidecar, ragged
    // dims) or a failed nomination books no phantom leg in an active
    // serving buffer.
    ivfPqQueryBatchRefinedCore(spark, indexDir, queries, k,
      nprobe, rerankFactor, chunkSize)
  }

  private def ivfPqQueryBatchRefinedCore(
      spark: org.apache.spark.sql.SparkSession, indexDir: String,
      queries: Seq[(Long, Seq[Double])], k: Int, nprobe: Int,
      rerankFactor: Int, chunkSize: Int): DataFrame = {
    require(queries.nonEmpty, "ivfPqQueryBatchRefined: empty query batch")
    require(k > 0, s"ivfPqQueryBatchRefined: k must be positive, got $k")
    require(rerankFactor >= 1,
      s"ivfPqQueryBatchRefined: rerankFactor must be >= 1, got $rerankFactor")
    require(chunkSize > 0, "ivfPqQueryBatchRefined: chunkSize must be positive")
    // the rerank is keyed by QID (the qid→pos map literal) — a
    // duplicated qid would score one query's nominees against the
    // other's vector and merge their pools; reject loudly (the filtered
    // twin's guard; the pos-keyed unrefined path tolerates duplicates)
    require(queries.map(_._1).distinct.size == queries.size,
      "ivfPqQueryBatchRefined: duplicate qids in one batch")
    // same plan-literal bound as every batch entry point: the rerank's
    // query matrix (MatVecDots) and qid→pos map are chunk-sized literals
    if (queries.size > chunkSize)
      return queries.grouped(chunkSize)
        .map(c => ivfPqQueryBatchRefinedCore(spark, indexDir, c, k, nprobe,
          rerankFactor, chunkSize))
        .reduce(_ unionByName _)
    require(hasVectorSidecar(spark, indexDir),
      s"ivfPqQueryBatchRefined: $indexDir carries no $vectorSidecarDir " +
        "float sidecar (built without keepVectors) — exact reranking " +
        "needs the true vectors; probe unrefined or rebuild with " +
        "keepVectors")
    // candidate nomination: the compressed batch probe at widened k.
    // Its answers are driver-sized ((k·factor)×queries rows max), so
    // collecting the nominee ids is the serving-sized read the refine
    // contract allows.
    val nominees = ivfPqQueryBatchCore(spark, indexDir, queries,
        k * rerankFactor, nprobe, chunkSize)
      .select("qid", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    ProbeStats.record("ivfpq_refined", queries.size, nprobe, nprobe, 0)
    if (nominees.isEmpty) {
      import spark.implicits._
      return Seq.empty[(Long, Long, Double)].toDF("qid", "id", "cos")
    }
    val idx = ivfPqMeta(spark, indexDir)
    val allLists = queries
      .flatMap(q => Similarity.nearestLists(idx.centroids, q._2.toArray, nprobe))
      .distinct
    topKPerQid(
      nomineeTrueCosines(spark, indexDir, queries, nominees.toSeq, allLists),
      k)
  }

  /** TRUE-cosine scores for a driver-collected nominee set against the
    * float sidecar — the shared rerank read of every refined probe: ONE
    * sidecar pass LIST-PRUNED to the union of the nominees' probed lists
    * (lossless — every nominee came from one of them) AND id-In-pruned
    * to the nominee ids, broadcast nominee join, ONE native dot per
    * (query, candidate). Returns (qid, id, cos) with cos EXACT
    * (rounded 6).
    *
    * Pushdown caveat: the nominee id set can reach
    * chunkSize(256)×k×rerankFactor — far above parquet's default
    * in-filter pushdown threshold (10), past which Spark pushes only the
    * id min/max RANGE, degrading exact row-group skips toward a probed-
    * list scan when nominee ids scatter. [[ensureInPushdown]] raises the
    * session threshold once (default-valued sessions only) so the id set
    * is pushed verbatim; the (list, id) sort order of the sidecar files
    * keeps the min/max fallback useful in sessions that pin their own
    * threshold. The In literal itself is plan-sized — bounded by the
    * nomination budget, the price of a driver-nominated rerank. */
  private def nomineeTrueCosines(spark: org.apache.spark.sql.SparkSession,
                                 indexDir: String,
                                 queries: Seq[(Long, Seq[Double])],
                                 nominees: Seq[(Long, Long)],
                                 lists: Seq[Int]): DataFrame = {
    import spark.implicits._
    ensureInPushdown(spark)
    val nomDf = nominees.toDF("qid", "id")
    val nomIds = nominees.map(_._2).distinct
    val floats = spark.read.parquet(s"$indexDir/$vectorSidecarDir")
      .filter(col("list").isin(lists.map(Integer.valueOf): _*))
      .filter(col("id").isin(nomIds: _*))
      .select(col("id"), col("v"))
      .join(broadcast(nomDf), Seq("id"))
    exactCosAgainst(queries, floats)
  }

  /** Raise `spark.sql.parquet.pushdown.inFilterThreshold` to cover the
    * refined rerank's nominee-id In set (see [[nomineeTrueCosines]]) —
    * ONCE per session, and ONLY when the conf still holds Spark's
    * default (10): an operator who pinned a value keeps it. Idempotent;
    * the raised value covers the largest nomination budget a chunked
    * refined probe emits (256-query chunks × k × rerankFactor).
    *
    * Scoping the override to the rerank scan alone is not possible from
    * here — the conf is consulted when the returned (lazy) DataFrame is
    * planned at action time, after this method has returned — so the
    * session-wide change is logged ONCE at WARN: an operator seeing
    * unrelated scans evaluate a large In per row group gets the
    * breadcrumb instead of an invisible side effect. */
  private val inPushdownLogged = new java.util.concurrent.atomic.AtomicBoolean
  private def ensureInPushdown(
      spark: org.apache.spark.sql.SparkSession): Unit = {
    val key = "spark.sql.parquet.pushdown.inFilterThreshold"
    if (spark.conf.get(key, "10") == "10") {
      spark.conf.set(key, "262144")
      if (inPushdownLogged.compareAndSet(false, true))
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"refined probe raised session conf $key 10 -> 262144 (covers " +
            "the nominee-id In pushdown; set the conf explicitly to pin)")
    }
  }

  /** Exact-cosine scoring of (qid, id, v) candidate rows against a
    * chunk-bounded query batch: qid→pos map + query matrix as plan
    * literals, one native [[graft.functions.MatVecF]] loop per row.
    * Returns (qid, id, cos) rounded to 6 (the engine-wide contract). */
  private def exactCosAgainst(queries: Seq[(Long, Seq[Double])],
                              withVec: DataFrame): DataFrame = {
    val qNorms = queries.map { case (_, q) => math.sqrt(q.map(x => x * x).sum) }
    val qIds = queries.map(_._1)
    import graft.functions.{MatVecF, VectorF}
    withVec
      .withColumn("pos",
        element_at(typedLit(qIds.zipWithIndex.map { case (q, i) => q -> i }
          .toMap), col("qid")))
      .withColumn("dots", MatVecF.dots(col("v"), queries.map(_._2)))
      .select(col("qid"), col("id"),
        round(element_at(col("dots"), col("pos") + 1) /
          (VectorF.norm(col("v")) *
            element_at(array(qNorms.map(lit): _*), col("pos") + 1)),
          6).as("cos"))
      .filter(col("cos").isNotNull && !isnan(col("cos")))
  }

  /** Bounded-heap top-k per qid over (qid, id, cos) rows — the shared
    * finalize of the refined probes. */
  private def topKPerQid(scored: DataFrame, k: Int): DataFrame = {
    import graft.functions.TopKF
    scored.groupBy("qid")
      .agg(TopKF.topKByScore(col("cos"), col("id"), k).as("topk"))
      .select(col("qid"), explode(col("topk")).as("hit"))
      .select(col("qid"), col("hit.id").as("id"), col("hit.score").as("cos"))
  }

  /** FILTERED + REFINED probe — closes the refine matrix's last empty
    * cell: the widening loop of [[ivfPqQueryFiltered]] NOMINATES with
    * compressed ADC, the float sidecar reranks with TRUE cosines (the
    * [[ivfPqQueryRefined]] contract under a predicate). Each round's
    * pred-filtered pruned ADC pass targets `k × rerankFactor` eligible
    * nominees per query — the widening target is the full nomination
    * budget, not k: a round that satisfied k but not k×factor would
    * hand the exact rerank a truncated candidate set and silently cap
    * refined recall exactly when the filter is most selective. Queries
    * that hit the budget (or the full-width probe) finalize; ONE sidecar
    * read then reranks every finalized nominee. Answers are EXACT
    * cosines over eligible rows, so brute-force oracles apply (the
    * unfiltered refined rows' contract). Requires the float sidecar. */
  def ivfPqQueryFilteredRefined(spark: org.apache.spark.sql.SparkSession,
                                indexDir: String, query: Seq[Double],
                                topK: Int, pred: Column, nprobe: Int = 8,
                                rerankFactor: Int = 4): DataFrame =
    ivfPqQueryBatchFilteredRefined(spark, indexDir, Seq((0L, query)), topK,
      pred, nprobe, rerankFactor).select("id", "cos")

  /** BATCH twin of [[ivfPqQueryFilteredRefined]] — the serving shape
    * behind serve-ann/serve-hybrid `--filter-dfl --refine`: each
    * widening round scores ALL still-unsatisfied queries in ONE
    * pred-filtered pruned ADC pass at the nomination budget, finalized
    * queries bank their nominees, and ONE sidecar read reranks every
    * nominee with true cosines. Returns (qid, id, cos), cos EXACT.
    * Chunked at entry like the unfiltered refined batch (the rerank's
    * query matrix and qid→pos map are chunk-sized plan literals) — one
    * telemetry leg per chunk, each chunk running its own widening loop
    * with its own observed widths. */
  def ivfPqQueryBatchFilteredRefined(
      spark: org.apache.spark.sql.SparkSession, indexDir: String,
      queries: Seq[(Long, Seq[Double])], k: Int, pred: Column,
      nprobe: Int = 8, rerankFactor: Int = 4,
      chunkSize: Int = 256): DataFrame = {
    require(queries.nonEmpty, "ivfPqQueryBatchFilteredRefined: empty query batch")
    require(k > 0, s"ivfPqQueryBatchFilteredRefined: k must be positive, got $k")
    require(rerankFactor >= 1,
      s"ivfPqQueryBatchFilteredRefined: rerankFactor must be >= 1, got $rerankFactor")
    require(chunkSize > 0,
      "ivfPqQueryBatchFilteredRefined: chunkSize must be positive")
    val dims = queries.map(_._2.size).distinct
    require(dims.size == 1,
      s"ivfPqQueryBatchFilteredRefined: ragged query dims $dims")
    // qid-keyed widening AND qid-keyed rerank — duplicates would merge
    // two queries' pools (both parents' guard)
    require(queries.map(_._1).distinct.size == queries.size,
      "ivfPqQueryBatchFilteredRefined: duplicate qids in one batch")
    require(hasVectorSidecar(spark, indexDir),
      s"ivfPqQueryBatchFilteredRefined: $indexDir carries no " +
        s"$vectorSidecarDir float sidecar (built without keepVectors) — " +
        "exact reranking needs the true vectors; probe unrefined or " +
        "rebuild with keepVectors")
    if (queries.size > chunkSize)
      return queries.grouped(chunkSize)
        .map(c => ivfPqQueryBatchFilteredRefined(spark, indexDir, c, k,
          pred, nprobe, rerankFactor, chunkSize))
        .reduce(_ unionByName _)
    val idx = ivfPqMeta(spark, indexDir)
    require(dims.head == idx.model.m * idx.model.subDim,
      s"ivfPqQueryBatchFilteredRefined: query dim ${dims.head} != index dim ${idx.model.m * idx.model.subDim}")
    val kLists = idx.centroids.length
    val eligible = idx.vectors.filter(pred)
    val budget = k * rerankFactor
    val nomAcc = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    // the union of the lists each query had probed when it finalized —
    // every banked nominee came from one of them, so pruning the
    // sidecar rerank read to this union is lossless
    val listAcc = scala.collection.mutable.LinkedHashSet.empty[Int]
    var pending = queries
    var width = math.min(math.max(1, nprobe), kLists)
    val widthStart = width
    var widthUsed = width
    var rounds = 0
    while (pending.nonEmpty) {
      widthUsed = width
      rounds += 1
      val listsByQ = pending.map(q => q._1 ->
        Similarity.nearestLists(idx.centroids, q._2.toArray, width)).toMap
      val allLists = listsByQ.valuesIterator.flatten.toSeq.distinct
      // full-width bypass, as the filtered parents: once the union
      // covers every list the isin buys nothing on the widest rounds
      val pruned =
        if (allLists.size >= kLists) eligible
        else eligible.filter(col("list").isin(allLists.map(Integer.valueOf): _*))
      val rows = scoreAdcGroup(pruned, idx, pending,
        pending.map(q => listsByQ(q._1).toSeq), budget).collect().toSeq
      val byQ = rows.groupBy(_.getLong(0))
      val (done, todo) = pending.partition(q =>
        width >= kLists || byQ.getOrElse(q._1, Seq.empty).size >= budget)
      done.foreach { q =>
        nomAcc ++= byQ.getOrElse(q._1, Seq.empty)
          .map(r => (r.getLong(0), r.getLong(1)))
        listAcc ++= listsByQ(q._1)
      }
      pending = todo
      width = math.min(width * 2, kLists)
    }
    ProbeStats.record("ivfpq_filtered_refined", queries.size, widthStart,
      widthUsed, rounds - 1)
    if (nomAcc.isEmpty) {
      import spark.implicits._
      return Seq.empty[(Long, Long, Double)].toDF("qid", "id", "cos")
    }
    topKPerQid(
      nomineeTrueCosines(spark, indexDir, queries, nomAcc.toSeq,
        listAcc.toSeq),
      k)
  }

  /** Per-row reconstructed-norm column ‖v̂‖ from codes alone — the range
    * probes' denominator. For residual codes, ‖ĉ+r̂‖² = ‖c_L‖² +
    * 2·Σ_m c_{L,m}·cw_{m,code} + Σ_m ‖cw_{m,code}‖²: the middle term is
    * a per-LIST ADC table (kLists groups, query-independent), the last a
    * 1-group table; both resolve through the same native
    * [[graft.functions.PqAdcDots]] loop. Raw codes keep only the last
    * term (subspaces are orthogonal in concatenation). */
  private def reconNormCol(idx: IvfPqIndex): Column = {
    import graft.functions.PqF
    val model = idx.model
    // all three tables are memoized on the snapshot (IvfPqIndex lazy
    // members) — this builds COLUMNS only, no per-call table math
    val rNorm2 = element_at(
      PqF.adcDots(col("codes"), idx.cwNorm2, 1, model.m, model.k), 1)
    if (!idx.residual) sqrt(rNorm2)
    else {
      val kLists = idx.centroids.length
      sqrt(element_at(typedLit(idx.centNorm2), col("list") + 1) +
        element_at(
          PqF.adcDots(col("codes"), idx.crossTable, kLists, model.m, model.k),
          col("list") + 1) +
        rNorm2)
    }
  }

  /** The shared map-only tail of the IVFPQ RANGE probes: the SAME
    * [[adcCosScored]] reconstructed cosine the top-k probes rank by,
    * thresholded instead of heaped — no aggregation at all (the
    * [[Similarity]] scoreIvfRangeGroup posture over codes). */
  private def scoreAdcRangeGroup(vecs: DataFrame, idx: IvfPqIndex,
                                 queries: Seq[(Long, Seq[Double])],
                                 probeLists: Seq[Seq[Int]],
                                 minCos: Double): DataFrame = {
    val qIds = queries.map(_._1)
    adcCosScored(vecs, idx, queries, probeLists)
      .filter(col("cos") >= minCos)
      .select(element_at(array(qIds.map(lit): _*), col("pos") + 1).as("qid"),
        col("id"), col("cos"))
  }

  /** RANGE probe of a built IVFPQ index: every id in the query's
    * `nprobe` nearest lists whose RECONSTRUCTED-vector cosine clears
    * `minCos` — the documented approximate contract: cos(q, v̂) where
    * v̂ = centroid[list] + codeword-concat (residual) or the codeword
    * concat alone (raw), computed EXACTLY from the codes via ADC table
    * algebra (numerator = dot tables + residual constant; denominator =
    * the closed-form reconstructed norm, [[reconNormCol]]). v̂ → v as
    * quantization error → 0; identical vectors share v̂ exactly. The
    * plan is a partition-pruned map-only scan — no shuffle at all.
    * Returns (id, cos). */
  def ivfPqRange(spark: org.apache.spark.sql.SparkSession, indexDir: String,
                 query: Seq[Double], minCos: Double,
                 nprobe: Int = 8): DataFrame = {
    require(minCos > -1.0 && minCos <= 1.0,
      s"ivfPqRange: minCos must be in (-1, 1], got $minCos")
    val idx = ivfPqMeta(spark, indexDir)
    require(query.size == idx.model.m * idx.model.subDim,
      s"ivfPqRange: query dim ${query.size} != index dim ${idx.model.m * idx.model.subDim}")
    val lists = Similarity.nearestLists(idx.centroids, query.toArray, nprobe)
    scoreAdcRangeGroup(
      idx.vectors.filter(col("list").isin(lists.map(Integer.valueOf): _*)),
      idx, Seq((0L, query)), Seq(lists), minCos)
      .select("id", "cos")
  }

  /** RANGE probe for a BATCH of queries in ONE pruned code pass —
    * [[ivfPqRange]]'s contract (reconstructed cosine ≥ minCos) through
    * [[Similarity.ivfRangeBatch]]'s shape: union-of-lists pruned read,
    * per-query membership filter (batch ≡ per-query), map-only. Returns
    * (qid, id, cos). */
  def ivfPqRangeBatch(spark: org.apache.spark.sql.SparkSession,
                      indexDir: String, queries: Seq[(Long, Seq[Double])],
                      minCos: Double, nprobe: Int = 8,
                      chunkSize: Int = 256): DataFrame = {
    require(queries.nonEmpty, "ivfPqRangeBatch: empty query batch")
    require(minCos > -1.0 && minCos <= 1.0,
      s"ivfPqRangeBatch: minCos must be in (-1, 1], got $minCos")
    val dims = queries.map(_._2.size).distinct
    require(dims.size == 1, s"ivfPqRangeBatch: ragged query dims $dims")
    require(chunkSize > 0, "ivfPqRangeBatch: chunkSize must be positive")
    if (queries.size > chunkSize)
      return queries.grouped(chunkSize)
        .map(c => ivfPqRangeBatch(spark, indexDir, c, minCos, nprobe, chunkSize))
        .reduce(_ unionByName _)
    val idx = ivfPqMeta(spark, indexDir)
    require(dims.head == idx.model.m * idx.model.subDim,
      s"ivfPqRangeBatch: query dim ${dims.head} != index dim ${idx.model.m * idx.model.subDim}")
    val probeLists = queries.map { case (_, q) =>
      Similarity.nearestLists(idx.centroids, q.toArray, nprobe)
    }
    val allLists = probeLists.flatten.distinct
    ProbeStats.record("ivfpq_range", queries.size, nprobe, nprobe, 0)
    scoreAdcRangeGroup(
      idx.vectors.filter(col("list").isin(allLists.map(Integer.valueOf): _*)),
      idx, queries, probeLists, minCos)
  }

  /** REFINED range probe — [[ivfPqRange]] with an EXACT threshold (the
    * contract upgrade the top-k path got from [[ivfPqQueryRefined]]):
    * compressed ADC NOMINATES every probed id whose reconstructed
    * cosine clears `minCos - slack` (the loosened net — quantization
    * error can push a true ≥ minCos row just below the reconstruction
    * threshold), then TRUE cosines from the float sidecar VERIFY
    * `≥ minCos` exactly (the PPJoin filter-verify posture). Precision
    * is exact; recall approaches exact search as `slack` grows while
    * the nomination scan stays the compressed pruned read. Returns
    * (id, cos) with cos EXACT — brute-force range oracles apply. */
  def ivfPqRangeRefined(spark: org.apache.spark.sql.SparkSession,
                        indexDir: String, query: Seq[Double],
                        minCos: Double, nprobe: Int = 8,
                        slack: Double = 0.05): DataFrame =
    ivfPqRangeBatchRefined(spark, indexDir, Seq((0L, query)), minCos,
      nprobe, slack).select("id", "cos")

  /** BATCH twin of [[ivfPqRangeRefined]]: ONE loosened pruned ADC pass
    * nominates, ONE list-pruned sidecar join verifies with true cosines.
    * Range answers are output-bound, not k-bound, so the nominee set is
    * NEVER collected to the driver — the verify is a distributed id-join
    * of the nominee frame against the list-pruned sidecar (the id-In
    * pushdown of the top-k rerank needs driver-side ids and does not
    * apply). Shuffle honesty: the SCAN is probe-proportional (the
    * probed-lists slice, the prune range semantics allow) and only the
    * JOIN is nominee-proportional — a static plan sort-merges that
    * slice, and AQE (on by default in Spark 4) demotes it to a broadcast
    * of the nominee side at runtime when the loosened nomination lands
    * small, which a tight minCos makes the common case. Forcing
    * broadcast(nominated) statically is deliberately NOT done: range
    * output is unbounded, and a loose threshold would OOM the driver
    * exactly when the distributed verify matters most. Returns
    * (qid, id, cos) with cos EXACT (≥ minCos). */
  def ivfPqRangeBatchRefined(spark: org.apache.spark.sql.SparkSession,
                             indexDir: String,
                             queries: Seq[(Long, Seq[Double])],
                             minCos: Double, nprobe: Int = 8,
                             slack: Double = 0.05,
                             chunkSize: Int = 256): DataFrame = {
    require(queries.nonEmpty, "ivfPqRangeBatchRefined: empty query batch")
    require(minCos > -1.0 && minCos <= 1.0,
      s"ivfPqRangeBatchRefined: minCos must be in (-1, 1], got $minCos")
    require(slack >= 0.0,
      s"ivfPqRangeBatchRefined: slack must be >= 0 (it only widens the " +
        s"nomination net), got $slack")
    require(chunkSize > 0, "ivfPqRangeBatchRefined: chunkSize must be positive")
    val dims = queries.map(_._2.size).distinct
    require(dims.size == 1, s"ivfPqRangeBatchRefined: ragged query dims $dims")
    // the verify is qid-keyed (qid→pos map literal) — the refined guard
    require(queries.map(_._1).distinct.size == queries.size,
      "ivfPqRangeBatchRefined: duplicate qids in one batch")
    require(hasVectorSidecar(spark, indexDir),
      s"ivfPqRangeBatchRefined: $indexDir carries no $vectorSidecarDir " +
        "float sidecar (built without keepVectors) — exact thresholds " +
        "need the true vectors; probe unrefined (reconstruction-cosine " +
        "contract) or rebuild with keepVectors")
    if (queries.size > chunkSize)
      return queries.grouped(chunkSize)
        .map(c => ivfPqRangeBatchRefined(spark, indexDir, c, minCos,
          nprobe, slack, chunkSize))
        .reduce(_ unionByName _)
    val idx = ivfPqMeta(spark, indexDir)
    require(dims.head == idx.model.m * idx.model.subDim,
      s"ivfPqRangeBatchRefined: query dim ${dims.head} != index dim ${idx.model.m * idx.model.subDim}")
    val probeLists = queries.map { case (_, q) =>
      Similarity.nearestLists(idx.centroids, q.toArray, nprobe)
    }
    val allLists = probeLists.flatten.distinct
    ProbeStats.record("ivfpq_range_refined", queries.size, nprobe, nprobe, 0)
    val nominated = scoreAdcRangeGroup(
        idx.vectors.filter(col("list").isin(allLists.map(Integer.valueOf): _*)),
        idx, queries, probeLists.map(_.toSeq), minCos - slack)
      .select("qid", "id")
    val floats = spark.read.parquet(s"$indexDir/$vectorSidecarDir")
      .filter(col("list").isin(allLists.map(Integer.valueOf): _*))
      .select(col("id"), col("v"))
      .join(nominated, Seq("id"))
    exactCosAgainst(queries, floats).filter(col("cos") >= minCos)
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
      // negative index would silently resolve from the END of the table.
      // A decoded id >= k is CORRUPTION: null the row out (the PqAdcDots
      // contract) instead of silently reading a NEIGHBORING subspace's
      // table region as a competing score
      val code = pmod(element_at(col("codes"), mi + 1).cast("int"), lit(256))
      when(code < lit(model.k),
        element_at(table, code + mi * model.k + 1))
    }.reduce(_ + _)
    codesDf
      .select(graft.functions.TopKF.topKByScore(
        round(score, 6), col("id"), k).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.id").as("id"), col("e.score").as("adc"))
  }
}
