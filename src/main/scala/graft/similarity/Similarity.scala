package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables._

/** Similarity search over the `embeddings` table (`Array[Float]`, 64-d).
  *
  *  - `knn_brute`: exact top-k cosine — broadcast the (small) query set
  *    against a single pass of the corpus; ranking uses the ROUNDED
  *    cosine with a vec_id tiebreak so Spark and the DuckDB oracle rank
  *    identically despite last-ulp float-summation differences.
  *  - `knn_lsh`: the 100 TB path — random-hyperplane signatures bucket
  *    the corpus (one shuffle on the bucket key); search touches only the
  *    query's bucket. Approximate: recall measured in SimilaritySpec.
  *
  * Dot products use zip_with + aggregate over double-cast lanes — all
  * codegen'd higher-order functions, no UDF in the scan path.
  */
object Similarity {

  private[similarity] def toDouble(c: Column): Column =
    transform(c, x => x.cast("double"))

  // codegen'd static kernel — zip_with+aggregate lambdas interpret per
  // element (~20× slower on this hot path); same sequential sum order.
  private[similarity] def dot(a: Column, b: Column): Column =
    graft.functions.ArrayKernelColumns.array_dot(a, b)

  private[similarity] def norm(c: Column): Column = sqrt(dot(c, c))

  val K = 5
  val NumQueries = 50

  /** Exact brute-force top-k cosine for the first `NumQueries` vectors. */
  def knnBrute(spark: SparkSession, dir: String): DataFrame = {
    val emb = spread(embeddings(spark, dir), col("vec_id"), 512 * 1024)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("n", norm(col("v")))
    val queries = emb.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("n").as("qn"))
    val scored = emb.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(dot(col("v"), col("qv")) / (col("n") * col("qn")), 6))
      .withColumn("rk", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("cos"), col("vec_id"))))
      .filter(col("rk") <= K)
      .select(col("query_id"), col("rk").cast("int").as("rk"),
        col("vec_id").as("neighbor_id"), col("cos"))
      .orderBy("query_id", "rk")
    scored
  }

  /** Random-hyperplane LSH: 12-bit signatures from seeded ±1 planes.
    * Multi-probe: each query also probes all signatures at hamming
    * distance 1 (13 probes) to recover near-boundary neighbors. */
  val SigBits = 12

  // plane j, lane i weight = ±1 from md5("j:i") — deterministic, no
  // stored model, and INDEPENDENTLY DERIVABLE BY DUCKDB (the
  // cluster_minsh trick applied to hyperplanes), which upgrades
  // knn_lsh from rows-only to a full hash oracle: both engines build
  // the identical plane matrix, project in the identical ascending-
  // lane IEEE order, and replay the same hamming-1 multiprobe.
  // Single-pass static kernel with the matrix cached per shape.
  private def signature(v: Column): Column =
    graft.functions.SigKernelColumns.hyperplane_sig_md5(v, SigBits)

  /** Cell count scaled to the corpus, ~√(n/2): 16 at the 500-vector
    * fixture, 32 at 2000 — the SemDeDup/IVF rule that keeps the
    * per-cell quadratic (`semantic_dedup`) and per-probe scan fraction
    * (`knn_ivf`) bounded as the corpus grows; a constant cell count
    * degrades toward all-pairs at 100 TB. The DuckDB oracles compute
    * the SAME expression from count(*) (IEEE sqrt/ceil agree bit-wise
    * on exactly-representable counts). */
  def scaledCells(n: Long): Int =
    math.max(4, math.ceil(math.sqrt(n / 2.0)).toInt)

  /** Probes scale with the cell count (cells/4: 4 at 16 cells) but CAP
    * at 16 — the constant-nprobe-at-scale policy real IVF serving uses
    * (FAISS keeps nprobe a fixed query knob while cells grow √n).
    * Uncapped, probing a fixed FRACTION of cells makes the candidate
    * scan linear in n (nprobe/cells · n = n/4); capped, the scanned
    * fraction shrinks as 16/√n and the probe side scales √n — measured
    * at the second bench decade: the cap was the difference between a
    * 12× and a ~6× time ratio at 10× data. The cap does not bite below
    * 64 cells, so sf0.01/sf0.1 oracle results are unchanged. */
  def scaledProbe(cells: Int): Int = math.min(16, math.max(2, cells / 4))

  /** PQ codebook size scaled like the cells, capped at one byte. */
  def scaledPqCodes(n: Long): Int = math.min(256, scaledCells(n))

  /** One k-means refinement iteration over the first-`cells` seed
    * centroids: assign every vector to its nearest seed (deterministic
    * argmax), then average each cell's members. The mean is an
    * ORDER-PINNED fold — members sorted by vec_id, summed left-to-right
    * per dimension — so the DuckDB oracle (list_sum over a
    * vec_id-ordered list) reproduces the centroid bit-for-bit; a plain
    * AVG would expose float summation order on both engines. Seeds
    * always land in their own cell (cos = 1), so no cell is empty. */
  /** Driver-side flat matrix of a (label, vector, norm) centroid frame,
    * ordered by label: O(√n) rows — KBs even at the second bench decade
    * — the same bounded materialization [[materializedCentroids]]
    * already makes. Returns (labels, flatVectors, norms, dim). */
  private def localMatrix(df: DataFrame, labelCol: String, vecCol: String,
      normCol: String): (Array[Long], Array[Double], Array[Double], Int) = {
    val rows = df.orderBy(labelCol).select(labelCol, vecCol, normCol).collect()
    val dim = rows.head.getSeq[Double](1).size
    val flat = new Array[Double](rows.length * dim)
    val norms = new Array[Double](rows.length)
    val labels = new Array[Long](rows.length)
    rows.zipWithIndex.foreach { case (r, j) =>
      labels(j) = r.getLong(0)
      val v = r.getSeq[Double](1)
      var i = 0
      while (i < dim) { flat(j * dim + i) = v(i); i += 1 }
      norms(j) = r.getDouble(2)
    }
    (labels, flat, norms, dim)
  }

  /** Per-row nearest-centroid assignment via the codegen'd kernel —
    * n rows in, n rows out. The broadcast-join formulation this
    * replaces materialized n·cells rows through an exchange (63M at the
    * second bench decade) before reducing back to n: assignment FLOPs
    * are n·cells·dim either way, but the ROW amplification was the
    * measured cost (knn_ivf 26 s → ~7 s at ×100). Scores, op order and
    * the higher-cell tie-break are bit-identical to the join + max_by
    * form, so the DuckDB oracles (which replay the joined form) still
    * hash-match. */
  private[similarity] def assignCells(emb: DataFrame, cents: DataFrame): DataFrame = {
    val (labels, flat, norms, dim) = localMatrix(cents, "cell", "cv", "cn")
    emb.withColumn("cell", element_at(typedLit(labels),
      graft.functions.CentroidKernelColumns.nearest_cell(
        col("v"), col("n"), typedLit(flat), typedLit(norms), dim) + 1))
  }

  /** KNOWN BOUND (r12, measured by the skew_vec bench): the per-cell
    * ordered mean fold materializes one cell's (vec_id, v) structs in
    * an aggregation buffer — max-cell-size × ~(8·dim+16) bytes, ≈5 MB
    * for the bench's planted 10⁴-copy mega-cell (ratio 0.92, unflagged).
    * Past ~10⁶ identical vectors in one cell the swap is mechanical:
    * per-dim running-sum window partitioned by (cell, dim) ordered by
    * vec_id — the pagerank_dups spill pattern, bit-identical fold
    * order — or FAISS-style sample training. Not done preemptively:
    * the ×dim explode taxes every balanced-corpus consumer to defend a
    * pathology the admission-time near-dup gate (dedup_stream_admit,
    * SemDeDup itself) exists to keep out of the corpus. */
  private def refinedCentroids(emb: DataFrame, cells: Int): DataFrame = {
    val seeds = emb.filter(col("vec_id") < cells)
      .select(col("vec_id").as("cell"), col("v").as("cv"), col("n").as("cn"))
    val asg0 = assignCells(emb, seeds)
      .select(col("vec_id"), col("cell"), col("v"))
    asg0.groupBy("cell")
      .agg(sort_array(collect_list(struct(col("vec_id"), col("v")))).as("vs"),
        count(lit(1)).as("cnt"))
      .withColumn("csum", expr(
        """aggregate(vs, transform(element_at(vs, 1).v, x -> cast(0 as double)),
          |  (acc, s) -> zip_with(acc, s.v, (a, b) -> a + b))""".stripMargin))
      .withColumn("cv", expr("transform(csum, t -> t / cnt)"))
      .select(col("cell"), col("cv"))
      .withColumn("cn", norm(col("cv")))
  }

  /** The refined centroid set is tiny (≈√n rows) but costs two corpus
    * passes to compute — and every `broadcast(centroids)` join would
    * otherwise re-run those passes (Spark broadcasts recompute their
    * child plan per use). Materialize ONCE driver-side; values are
    * bit-identical, so the oracles are untouched. */
  private[similarity] def materializedCentroids(emb: DataFrame, cells: Int): DataFrame = {
    val df = refinedCentroids(emb, cells)
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(df.collect(): _*), df.schema)
  }

  /** Approximate top-k via LSH buckets (+ hamming-1 multiprobe). */
  def knnLsh(spark: SparkSession, dir: String): DataFrame = {
    val emb = spread(embeddings(spark, dir), col("vec_id"), 512 * 1024)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("n", norm(col("v")))
      .withColumn("sig", signature(col("v")))
    val corpus = emb.select(col("vec_id"), col("v"), col("n"), col("sig"))
    val probes = emb.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("n").as("qn"),
        explode(concat(array(col("sig")), expr(
          s"transform(sequence(0, ${SigBits - 1}), j -> cast(sig as bigint) ^ shiftleft(1L, j))")))
          .as("probe_sig"))
    val scored = corpus.join(probes,
        col("sig") === col("probe_sig") && col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(dot(col("v"), col("qv")) / (col("n") * col("qn")), 6))
      // no distinct: each corpus vector has exactly one signature and the
      // probe list {sig} ∪ {sig ^ 2^j} is duplicate-free, so a
      // (query_id, vec_id) pair is produced at most once
      .select("query_id", "vec_id", "cos")
      .withColumn("rk", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("cos"), col("vec_id"))))
      .filter(col("rk") <= K)
      .select(col("query_id"), col("rk").cast("int").as("rk"),
        col("vec_id").as("neighbor_id"), col("cos"))
      .orderBy("query_id", "rk")
    scored
  }

  /** IVF-style ANN: the corpus is partitioned into Voronoi cells around
    * refined centroids (seed = first `cells` vectors, then ONE k-means
    * iteration: each centroid becomes the mean of its assigned
    * vectors); each query probes its `nprobe` nearest cells and scores
    * only vectors inside them. Assignment is a broadcast join + max_by
    * argmax — at scale the corpus partitions BY cell, so a probe
    * touches nprobe/cells of the data (the classic IVF trade).
    * Approximate vs brute force but fully DETERMINISTIC (seeded
    * centroids + order-pinned mean fold + argmax + nprobe) →
    * oracle-checked: DuckDB replays the identical refinement/
    * assignment/probe/scoring pipeline. */
  def knnIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = spread(embeddings(spark, dir), col("vec_id"), 512 * 1024)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("n", norm(col("v")))
    val cells = scaledCells(embeddings(spark, dir).count())
    val centroids = materializedCentroids(emb, cells)
    def cellScores(side: DataFrame): DataFrame =
      side.join(broadcast(centroids), expr("true"))
        .withColumn("cscore", dot(col("v"), col("cv")) / (col("n") * col("cn")))
    // corpus: each vector assigned to its single nearest cell by the
    // per-row kernel (same scores, same higher-cell tie-break as the
    // joined max_by form the oracle replays — see [[assignCells]])
    val assigned = assignCells(emb, centroids)
    // queries: nprobe nearest cells each
    val probes = cellScores(
        emb.filter(col("vec_id") < NumQueries)
          .select(col("vec_id").as("query_id"), col("v").as("qv"), col("n").as("qn"))
          .withColumnRenamed("qv", "v").withColumnRenamed("qn", "n"))
      .withColumn("prk", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("cscore"), col("cell"))))
      .filter(col("prk") <= scaledProbe(cells))
      .select(col("query_id"), col("v").as("qv"), col("n").as("qn"), col("cell"))
    assigned.join(probes,
        assigned("cell") === probes("cell") && col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(dot(col("v"), col("qv")) / (col("n") * col("qn")), 6))
      // no distinct: one cell per corpus vector (argmax) and a query's
      // nprobe cells are distinct, so each (query_id, vec_id) pair
      // appears at most once — a distinct here would only add a shuffle
      .select("query_id", "vec_id", "cos")
      .withColumn("rk", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("cos"), col("vec_id"))))
      .filter(col("rk") <= K)
      .select(col("query_id"), col("rk").cast("int").as("rk"),
        col("vec_id").as("neighbor_id"), col("cos"))
      .orderBy("query_id", "rk")
  }

  /** Product quantization ANN (the serving-side compression path IVF
    * pairs with at scale): vectors split into [[PqM]] subvectors of
    * [[PqSubDim]] dims; each subspace has a √n-scaled codebook (byte-
    * capped; subvectors of the first `scaledPqCodes(n)` corpus vectors
    * — the same seeded
    * k-means stand-in as [[knnIvf]]'s centroids); a corpus vector is
    * stored as PqM one-byte codes (64× smaller than f32); queries score
    * by asymmetric distance — each query's per-subspace L2 lookup table
    * broadcasts as ONE flat array and every (vector, query) pair sums
    * PqM element_at lookups in FIXED subspace order, so no float
    * summation-order divergence can leak into the hash gate. Fully
    * deterministic → DuckDB oracle replays the identical encode/LUT/
    * scoring pipeline.
    *
    * Scale: codes are 8 bytes/vector (the only thing shuffled), the
    * codebook and per-query LUTs broadcast; argmin tie-breaks pinned by
    * (dist, code) so encoding is reproducible. */
  val PqM = 8
  val PqSubDim = 8

  def knnPq(spark: SparkSession, dir: String): DataFrame = {
    def l2(a: Column, b: Column): Column =
      dot(a, a) - lit(2.0) * dot(a, b) + dot(b, b)
    val emb = spread(embeddings(spark, dir), col("vec_id"), 512 * 1024)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val pqCodes = scaledPqCodes(embeddings(spark, dir).count())
    // codebook driver-side: ≤256 vectors (≤128 KB), flat [m][code][d]
    // layout for the per-row encode kernel. The joined encode this
    // replaces materialized n·PqM·codes rows (410M at ×100 of the
    // bench dir — the measured cost); the kernel emits each vector's
    // PqM codes in one codegen'd pass with identical distances and the
    // identical lower-code tie-break, so the DuckDB oracle (which
    // replays the joined form) still hash-matches.
    val cbRows = emb.filter(col("vec_id") < pqCodes)
      .orderBy("vec_id").select("vec_id", "v").collect()
    val nCodes = cbRows.length
    val codeLabels: Array[Long] = cbRows.map(_.getLong(0))
    val flatCb = new Array[Double](PqM * nCodes * PqSubDim)
    cbRows.zipWithIndex.foreach { case (r, code) =>
      val v = r.getSeq[Double](1)
      var m = 0
      while (m < PqM) {
        var d = 0
        while (d < PqSubDim) {
          flatCb((m * nCodes + code) * PqSubDim + d) = v(m * PqSubDim + d)
          d += 1
        }
        m += 1
      }
    }
    // subs now feeds only the codebook/ADC frames (≤256 + 50 vectors)
    val subs = emb
      .filter(col("vec_id") < math.max(pqCodes.toLong, NumQueries.toLong))
      .select(col("vec_id"), col("v"), explode(expr(s"sequence(0, ${PqM - 1})")).as("m"))
      .withColumn("sub", expr(s"slice(v, m * $PqSubDim + 1, $PqSubDim)"))
      .drop("v")
    val cents = subs.filter(col("vec_id") < pqCodes)
      .select(col("vec_id").as("code"), col("m").as("cm"), col("sub").as("csub"))
    // per-query ADC lookup tables
    val adc = subs.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("m").as("qm"), col("sub").as("qsub"))
      .join(broadcast(cents), col("qm") === col("cm"))
      .withColumn("qd", l2(col("qsub"), col("csub")))
      .select(col("query_id"), col("qm"), col("code").as("qcode"), col("qd"))
    // ADC scoring without the LUT JOIN: fold each vector's PqM codes
    // into ONE array row (the literal "8 bytes per vector" PQ layout)
    // and each query's lookup table into ONE broadcast array of
    // PqM × PqCodes distances (position = m·PqCodes + code — adc is
    // dense per (query, m), so the (m, code)-sorted collect lands each
    // entry at exactly that offset). Scoring is then a broadcast
    // nested-loop of 50 query rows against the code table with PqM
    // fixed-order element_at additions per pair — all codegen'd, no
    // float summation-order divergence (same explicit m=0..PqM-1 sum
    // the pivot formulation had, same doubles, same oracle) and no
    // codes × queries × PqM intermediate: the old broadcast-hash join
    // materialized PqM rows per (vector, query) and re-aggregated them
    // (2M rows at sf0.1) just to undo the layout the arrays keep.
    val codeArr = emb.select(col("vec_id"),
        graft.functions.CentroidKernelColumns.pq_encode(
          col("v"), typedLit(flatCb), PqM, PqSubDim, nCodes).as("pos"))
      .select(col("vec_id"), transform(col("pos"),
        x => element_at(typedLit(codeLabels), x + 1)).as("codes"))
    val lut = adc
      .groupBy("query_id")
      .agg(sort_array(collect_list(struct(col("qm"), col("qcode"), col("qd")))).as("l"))
      .select(col("query_id"), expr("transform(l, x -> x.qd)").as("lut"))
    val scores = codeArr.join(broadcast(lut), col("vec_id") =!= col("query_id"))
      .withColumn("approx_dist", round(
        (0 until PqM).map(m => element_at(col("lut"),
          (element_at(col("codes"), m + 1) + lit(m * pqCodes) + 1).cast("int")))
          .reduce(_ + _), 6))
    scores
      .withColumn("rk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("approx_dist"), col("vec_id"))))
      .filter(col("rk") <= K)
      .select(col("query_id"), col("rk").cast("int").as("rk"),
        col("vec_id").as("neighbor_id"), col("approx_dist"))
      .orderBy("query_id", "rk")
  }

  /** Embedding-cosine near-duplicate pairs above a threshold. This corpus
    * is near-random (max pairwise cosine ≈ 0.5), so the threshold is set
    * where the data has signal; in a true near-dup regime (cos ≥ 0.9) the
    * banded-LSH candidate join of [[knnLsh]] replaces the broadcast — the
    * hyperplane collision probability (1-θ/π)^bits only amplifies at high
    * cosine. The left side is a bounded probe set (a < CosDupProbe) so the
    * plan is a broadcast of probes against one corpus pass, never an
    * all-pairs shuffle. */
  val CosDupThreshold = 0.35
  val CosDupProbe = 200

  def cosineDups(spark: SparkSession, dir: String): DataFrame = {
    val emb = spread(embeddings(spark, dir), col("vec_id"), 512 * 1024)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("n", norm(col("v")))
    val probes = emb.filter(col("vec_id") < CosDupProbe)
      .select(col("vec_id").as("a"), col("v").as("va"), col("n").as("na"))
    emb.join(broadcast(probes), col("a") < col("vec_id"))
      .withColumn("cos", round(dot(col("va"), col("v")) / (col("na") * col("n")), 6))
      .filter(col("cos") >= CosDupThreshold)
      .select(col("a"), col("vec_id").as("b"), col("cos"))
      .orderBy("a", "b")
  }

  /** Int8 scalar quantization with reconstruction-error stats — the
    * compression step before serving ANN at scale (4× smaller than f32).
    * Per-vector scale = max |x|; rounding is floor(x + 0.5) so both
    * engines round identically, and every metric is double math over
    * exactly-widened floats → bit-identical outputs, no tolerance. */
  def embeddingQuantize(spark: SparkSession, dir: String): DataFrame =
    embeddings(spark, dir)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("maxabs", array_max(transform(col("v"), x => abs(x))))
      .withColumn("l2_norm", norm(col("v")))
      .withColumn("max_err", array_max(transform(col("v"), x =>
        abs(x - floor(x * lit(127.0) / col("maxabs") + lit(0.5))
          * col("maxabs") / lit(127.0)))))
      .select("vec_id", "maxabs", "l2_norm", "max_err")
      .orderBy("vec_id")

  /** Stable IVF-index location for the embeddings under `dir`, keyed
    * by the embedding FILES' identity (name, length, mtime) — the same
    * contract as [[graft.dedup.Dedup.sketchCorpusPath]]: an unchanged
    * corpus reuses (and appends to) its standing index across runs; a
    * regenerated corpus keys to a fresh one. */
  def ivfIndexPath(dir: String): String =
    graft.table.StandingIndex.path("graft_ivf_index_", dir,
      "embeddings.parquet")

  /** Create-or-extend the standing IVF index at `path`: two graft
    * tables, `cells` (centroid vectors — written ONCE at build, the
    * fixed coarse quantizer) and `assign` (per-vector cell assignment
    * + vector). A rerun appends only vectors the index has never seen,
    * assigned against the STORED centroids — the production IVF
    * contract (FAISS add-with-ids after train): centroids stay fixed
    * as the corpus grows, so existing postings lists never rewrite. */
  def updateIvfIndex(spark: SparkSession, corpus: DataFrame, path: String)
      : (graft.table.GraftTable, graft.table.GraftTable) = {
    val cellsT = graft.table.GraftTable(spark, path + "/cells")
    val asgT = graft.table.GraftTable(spark, path + "/assign")
    // assign (postings) files are byte-targeted and CELL-clustered
    // (StandingIndex.writeSized): a probe reads nprobe cells' disjoint
    // file ranges — the on-disk layout that makes the 16/√n scanned
    // fraction an IO fraction too, not just a compute one
    if (cellsT.currentVersion < 0) {
      val cents = materializedCentroids(corpus, scaledCells(corpus.count()))
      cellsT.write(cents)
      graft.table.StandingIndex.writeSized(spark, path + "/assign",
        assignCells(corpus, cents).select("vec_id", "cell", "v", "n"),
        Seq("cell"))
    } else {
      val cents = driverCentroids(spark, cellsT)
      val known = asgT.read().select("vec_id").distinct()
      val fresh = corpus.join(known, Seq("vec_id"), "left_anti")
      if (!fresh.isEmpty)
        graft.table.StandingIndex.writeSized(spark, path + "/assign",
          assignCells(fresh, cents).select("vec_id", "cell", "v", "n"),
          Seq("cell"), org.apache.spark.sql.SaveMode.Append)
    }
    (cellsT, asgT)
  }

  /** The stored quantizer is √n rows — materialize driver-side once
    * (the [[materializedCentroids]] rationale: every broadcast would
    * otherwise re-scan the table). */
  private def driverCentroids(spark: SparkSession,
      cellsT: graft.table.GraftTable): DataFrame = {
    val df = cellsT.read().select("cell", "cv", "cn")
    spark.createDataFrame(java.util.Arrays.asList(df.collect(): _*), df.schema)
  }

  /** Streaming maintenance of the standing IVF index: each micro-batch
    * of (vec_id, embedding) rows flows through [[updateIvfIndex]] — the
    * anti-join against the stored postings makes every batch IDEMPOTENT
    * (a replay after a sink-committed/checkpoint-stale restart appends
    * nothing), so the index is exactly-once WITHOUT a txn marker: the
    * dedup key is the data itself. The quantizer must exist before the
    * stream starts (built from `seedCorpus` if absent) because fixed
    * centroids are what make append-only postings valid. The 100 TB
    * shape: the index never rebuilds; a day's new vectors arrive as
    * bounded batches and land as appends into the probed tables. */
  def streamIntoIvfIndex(spark: SparkSession, seedCorpus: DataFrame,
      stream: DataFrame, path: String): graft.table.GraftTable = {
    def prepared(df: DataFrame): DataFrame = df
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("n", norm(col("v")))
    updateIvfIndex(spark, prepared(seedCorpus), path)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        updateIvfIndex(spark, prepared(batch), path); ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    graft.table.GraftTable(spark, path + "/assign")
  }

  /** Build the standing IVF index for `dir` WITHOUT the corpus vectors
    * whose `vec_id % mod == rem` — a held-out day-2 batch — so a
    * following [[knnIncremental]] pays only that slice's APPEND
    * (assignment against the STORED centroids, the FAISS
    * add-after-train contract) plus the probe. The bench's
    * build-vs-append split: the build cost is already measured as
    * `knn_ivf`, and this lets the append path be timed on its own
    * instead of hiding inside build noise (the r12 skew_vec flag).
    * Quantizer cells derive from the SEED slice's count — slightly
    * fewer than a full build's, which is exactly the production state
    * (centroids train once, the corpus keeps growing past them). */
  def prebuildIvfIndexExcept(spark: SparkSession, dir: String,
      mod: Int, rem: Int): Unit = {
    val emb = spread(embeddings(spark, dir), col("vec_id"), 512 * 1024)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("n", norm(col("v")))
    val seed = emb.filter(col("vec_id") % 5 =!= 0)
      .filter(pmod(col("vec_id"), lit(mod)) =!= rem)
    updateIvfIndex(spark, seed, ivfIndexPath(dir))
    ()
  }

  /** Batch ANN against the persisted index: corpus vectors (vec_id not
    * divisible by 5) live in the standing index — nothing re-assigns
    * or re-reads them beyond the probed cells — and the batch (ids
    * divisible by 5, disjoint from the index) probes `nprobe` nearest
    * stored centroids, scores exactly within those postings lists, and
    * keeps top-[[K]]. The incremental counterpart of [[knnIvf]], and
    * the serving loop a 100 TB corpus actually runs: index once,
    * append new vectors against fixed centroids, probe per batch.
    * Oracle = the full recompute restricted to the batch (the
    * `dedup_incremental` contract), valid because reruns append
    * nothing and centroids are a pure function of the corpus side. */
  def knnIncremental(spark: SparkSession, dir: String): DataFrame = {
    val emb = spread(embeddings(spark, dir), col("vec_id"), 512 * 1024)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("n", norm(col("v")))
    val corpus = emb.filter(col("vec_id") % 5 =!= 0)
    val batch = emb.filter(col("vec_id") % 5 === 0)
    val (cellsT, asgT) = updateIvfIndex(spark, corpus, ivfIndexPath(dir))
    probeIndex(spark, cellsT, asgT, batch,
      scaledProbe(scaledCells(corpus.count())))
  }

  /** Probe the standing index with a query batch: `nprobe` nearest
    * STORED centroids per query, exact cosine within the probed
    * postings lists, top-[[K]]. Shared serving tail of
    * [[knnIncremental]] and [[knnStreamIndex]]. */
  private def probeIndex(spark: SparkSession, cellsT: graft.table.GraftTable,
      asgT: graft.table.GraftTable, batch: DataFrame, nprobe: Int): DataFrame = {
    val cents = driverCentroids(spark, cellsT)
    val probes = batch
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("n").as("qn"))
      .join(broadcast(cents), expr("true"))
      .withColumn("cscore", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("prk", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("cscore"), col("cell"))))
      .filter(col("prk") <= nprobe)
      .select(col("query_id"), col("qv"), col("qn"), col("cell"))
    asgT.read().join(probes, Seq("cell"))
      .withColumn("cos", round(dot(col("v"), col("qv")) / (col("n") * col("qn")), 6))
      .withColumn("rk", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("cos"), col("vec_id"))))
      .filter(col("rk") <= K)
      .select(col("query_id"), col("rk").cast("int").as("rk"),
        col("vec_id").as("neighbor_id"), col("cos"))
      .orderBy("query_id", "rk")
  }

  /** End-to-end streaming-index serving: the quantizer trains on a SEED
    * slice (vec_id % 5 ∈ {1,2}), the rest of the corpus (% 5 ∈ {3,4})
    * ARRIVES AS A STREAM through [[streamIntoIvfIndex]] (file-granular
    * micro-batches over the embeddings parquet itself), and the query
    * batch (% 5 = 0) probes the resulting index. This is the day-2
    * shape of a 100 TB vector store: train once on a sample, let new
    * vectors flow in as appends against fixed centroids, serve from
    * the postings tables. Deterministic (fixed seed slice, idempotent
    * appends, exact in-cell scoring) → the DuckDB oracle replays
    * seed-derived centroids + full-index assignment + probe. */
  def knnStreamIndex(spark: SparkSession, dir: String): DataFrame = {
    val embRaw = embeddings(spark, dir).select("vec_id", "embedding")
    val path = ivfIndexPath(dir) + "_stream"
    val seed = embRaw.filter(col("vec_id") % 5 === 1 || col("vec_id") % 5 === 2)
    // the file stream source lists a DIRECTORY: a partitioned
    // embeddings.parquet streams directly; the single-file layout the
    // small sf dirs use streams the sf dir under a leaf-name glob
    val rootF = new java.io.File(s"$dir/embeddings.parquet")
    val reader = spark.readStream.schema(embRaw.schema)
      .option("maxFilesPerTrigger", 1)
    val streamed = (if (rootF.isDirectory) reader.parquet(rootF.toString)
      else reader.option("pathGlobFilter", "embeddings.parquet").parquet(dir))
      .select("vec_id", "embedding")
      .filter(col("vec_id") % 5 === 3 || col("vec_id") % 5 === 4)
    val asgT = streamIntoIvfIndex(spark, seed, streamed, path)
    val cellsT = graft.table.GraftTable(spark, path + "/cells")
    val batch = embeddings(spark, dir)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("n", norm(col("v")))
      .filter(col("vec_id") % 5 === 0)
    probeIndex(spark, cellsT, asgT, batch,
      scaledProbe(scaledCells(seed.count())))
  }

  /** kNN label propagation: classify every UNLABELED document by a
    * majority vote of its [[K]] nearest LABELED seed documents in
    * embedding space — the semi-supervised serving shape of
    * model-based quality labeling (label a small curated set, let the
    * embedding neighborhood extend it to the whole corpus). Seed =
    * every third vec_id, label = the document's `source`; ties break
    * (votes desc, label asc), neighbor ranking by (rounded cosine
    * desc, seed id asc) exactly as the other knn_* queries.
    *
    * Scale shape: the curated seed set is a FIXED LABELING BUDGET
    * ([[ClassifySeedCap]] — human labels don't grow with the corpus),
    * so it rides the plan as a driver-materialized flat matrix (the
    * centroid/codebook pattern) and classification is ONE codegen'd
    * map over the corpus — n rows in, n rows out, zero shuffles, zero
    * row amplification, n·cap·dim flops = LINEAR in the corpus; an
    * uncapped fractional seed would make this quadratic, and the
    * window-over-crossjoin formulation it replaces pushes n·|seed|
    * rows through an exchange besides. The vote itself is pure array
    * algebra over the K in-row neighbor labels. */
  val ClassifySeedMod = 3
  val ClassifySeedCap = 2000

  def knnClassify(spark: SparkSession, dir: String): DataFrame = {
    val emb = spread(embeddings(spark, dir), col("vec_id"), 512 * 1024)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("n", norm(col("v")))
    val seedRows = emb.filter(col("vec_id") % ClassifySeedMod === 0 &&
        col("vec_id") < ClassifySeedCap)
      .join(documents(spark, dir).select(col("doc_id"), col("source")),
        col("doc_id") === col("vec_id"))
      .orderBy("vec_id").select("vec_id", "v", "n", "source").collect()
    val dim = seedRows.head.getSeq[Double](1).size
    val flat = new Array[Double](seedRows.length * dim)
    val norms = new Array[Double](seedRows.length)
    val labels = new Array[String](seedRows.length)
    seedRows.zipWithIndex.foreach { case (r, j) =>
      val v = r.getSeq[Double](1)
      var i = 0
      while (i < dim) { flat(j * dim + i) = v(i); i += 1 }
      norms(j) = r.getDouble(2)
      labels(j) = r.getString(3)
    }
    emb.filter(!(col("vec_id") % ClassifySeedMod === 0 &&
        col("vec_id") < ClassifySeedCap))
      .withColumn("nbrs", graft.functions.CentroidKernelColumns.top_k_cells(
        col("v"), col("n"), typedLit(flat), typedLit(norms), dim, K))
      .withColumn("lbls", transform(col("nbrs"),
        j => element_at(typedLit(labels), j + 1)))
      .withColumn("best", array_min(transform(array_distinct(col("lbls")),
        l => struct((-size(filter(col("lbls"), x => x === l))).as("negc"),
          l.as("label")))))
      .select(col("vec_id"), col("best").getField("label").as("label"),
        (-col("best").getField("negc")).cast("int").as("votes"))
      .orderBy("vec_id")
  }

  /** SemDeDup-style semantic dedup: cluster the corpus into Voronoi
    * cells around the refined centroids (same √n-scaled count and
    * one-iteration k-means as [[knnIvf]]), then prune, WITHIN each
    * cell, every vector that has an earlier (lower vec_id) cell-mate
    * with cosine >= `DedupTau` — greedy keep-first pruning. The cells
    * are the scale story exactly as in the SemDeDup paper: the
    * quadratic comparison is bounded per cell (one shuffle on the cell
    * key; cells compare locally), never corpus-wide — and the √n cell
    * count keeps the bound as the corpus grows. Fully deterministic →
    * DuckDB replays the identical refinement + assignment + pruning
    * and hash-checks the survivor set. */
  val DedupTau = 0.35

  def semanticDedup(spark: SparkSession, dir: String): DataFrame = {
    val emb = spread(embeddings(spark, dir), col("vec_id"), 512 * 1024)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("n", norm(col("v")))
    val centroids = materializedCentroids(emb,
      scaledCells(embeddings(spark, dir).count()))
    // assignment feeds BOTH sides of the per-cell self-join and the
    // final anti-join: checkpoint so it computes once, not three times
    // (per-row kernel assignment — same scores/tie-break as the joined
    // form the oracle replays, none of its n·cells row explosion)
    val assigned = assignCells(emb, centroids)
      .select(col("vec_id"), col("cell"), col("v"), col("n"))
      .localCheckpoint()
    val rhs = assigned.select(col("cell").as("cellb"), col("vec_id").as("ib"),
      col("v").as("vb"), col("n").as("nb"))
    // ONE anti-join does prune-detection and survivor selection: a vector
    // survives iff NO earlier cell-mate clears tau. Anti joins evaluate
    // the extra predicate lazily and STOP at the first match, so the ~95%
    // of vectors that do get pruned (measured on the scaled corpus) pay a
    // few dot products instead of their whole cell — stage-counted at the
    // second bench decade, comparisons needed by the materialize-all-
    // pairs + distinct + anti formulation this replaces grow exactly
    // n^1.5 (2.0M → 63.1M at 10× data) while the anti-join's short-
    // circuit cut the stage 15.2 s → 1.7 s there (9×) with the identical
    // survivor set (the oracle's NOT IN (SELECT … pruned) predicate) —
    // the n^1.5 worst case remains for a duplicate-free corpus, but the
    // denser the duplication (the regime semantic dedup exists for),
    // the earlier the exit.
    assigned.join(rhs,
        col("cell") === col("cellb") && col("vec_id") > col("ib") &&
          round(dot(col("v"), col("vb")) / (col("n") * col("nb")), 6)
            >= DedupTau,
        "left_anti")
      .select(col("vec_id"), col("cell"))
      .orderBy("vec_id")
  }

  /** Corpus topic distribution — the mixture-construction view of the
    * embedding space: every vector assigned to its nearest refined
    * centroid (the [[knnIvf]] quantizer), reported per cell as size,
    * corpus share, and cohesion (mean/min cosine to the centroid).
    * Balanced shares with high cohesion say the corpus clusters cleanly;
    * a giant low-cohesion cell says "crawl noise, dedup harder".
    *
    * Determinism: the per-member cosine is rounded to the 1e-6 grid and
    * then summed as an exact scaled INTEGER (floor(cos·1e6 + 0.5) —
    * exact because the rounded double is within 2e-10 of an integer
    * multiple, so the .5 offset can never straddle a boundary), making
    * the mean summation-order-free; the share and mean divisions are
    * single IEEE ops on exact integers. Scale: assignment is the
    * per-row [[assignCells]] kernel (no row amplification), the
    * aggregate shuffles √n cells, and the share rides a window over
    * those √n rows — nothing here grows faster than the corpus scan. */
  def topicProfile(spark: SparkSession, dir: String): DataFrame = {
    val emb = spread(embeddings(spark, dir), col("vec_id"), 512 * 1024)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("n", norm(col("v")))
    val cells = scaledCells(embeddings(spark, dir).count())
    val centroids = materializedCentroids(emb, cells)
    val scored = assignCells(emb, centroids)
      .join(broadcast(centroids), Seq("cell"))
      .withColumn("cos",
        round(dot(col("v"), col("cv")) / (col("n") * col("cn")), 6))
      .withColumn("cos_s",
        floor(col("cos") * lit(1000000d) + lit(0.5)).cast("long"))
    scored.groupBy("cell")
      .agg(
        count(lit(1)).as("n_members"),
        sum("cos_s").as("ssum"),
        min("cos").as("min_cohesion"),
        min("vec_id").as("exemplar"))
      .withColumn("share", col("n_members").cast("double") /
        sum("n_members").over(Window.partitionBy()))
      .select(col("cell"), col("n_members"), col("share"),
        (col("ssum") / lit(1000000.0) / col("n_members")).as("mean_cohesion"),
        col("min_cohesion"), col("exemplar"))
      .orderBy("cell")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "topic_profile" -> topicProfile _,
    "knn_brute"   -> knnBrute _,
    "knn_lsh"     -> knnLsh _,
    "knn_ivf"     -> knnIvf _,
    "knn_incremental" -> knnIncremental _,
    "knn_stream_index" -> knnStreamIndex _,
    "knn_classify" -> knnClassify _,
    "knn_pq"      -> knnPq _,
    "cosine_dups" -> cosineDups _,
    "semantic_dedup" -> semanticDedup _,
    "embedding_quantize" -> embeddingQuantize _)

  /** Shared oracle prefix: √n cell count, seed assignment, and the
    * one-iteration k-means refinement — the list_sum over a
    * vec_id-ordered list reproduces the Spark side's order-pinned fold
    * bit-for-bit (a bare SUM would sum in scan order). range(1, 65)
    * hardcodes the 64-dim embedding fixture (DuckDB 1.0 cannot
    * lateral-range over len(v)); the Spark side derives it from the
    * data and agrees. Ends with `score`: every vector scored against
    * every REFINED centroid. */
  private val RefinedScoreCte: String = refinedScoreCte("TRUE")

  /** CTE variant with SPLIT predicates: the quantizer (cc/centn) trains
    * on the `centWhere` slice only, while `score` assigns the whole
    * `scoreWhere` set against those fixed centroids — the
    * train-on-a-sample / assign-everything contract of
    * [[knnStreamIndex]]'s streaming index. */
  private def splitScoreCte(centWhere: String, scoreWhere: String): String =
    s"""cc AS (
      |  SELECT GREATEST(4, CAST(ceil(sqrt(count(*) / 2.0)) AS BIGINT)) AS c
      |  FROM embeddings WHERE $centWhere),
      |ec AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings WHERE $centWhere),
      |nc AS (
      |  SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm FROM ec),
      |score0 AS (
      |  SELECT nc.vec_id, c.cell,
      |         list_inner_product(nc.v, c.cv) / (nc.nrm * c.cn) AS cscore
      |  FROM nc, (SELECT vec_id AS cell, v AS cv, nrm AS cn
      |           FROM nc WHERE vec_id < (SELECT c FROM cc)) c),
      |asg0 AS (SELECT vec_id, cell FROM (
      |  SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id
      |    ORDER BY cscore DESC, cell DESC) AS rn FROM score0) WHERE rn = 1),
      |sums AS (
      |  SELECT a.cell, r.i AS pos,
      |         list_sum(list(nv.v[r.i] ORDER BY nv.vec_id)) AS s,
      |         COUNT(*) AS cnt
      |  FROM asg0 a JOIN nc nv USING (vec_id),
      |       (SELECT unnest(range(1, 65)) AS i) r
      |  GROUP BY a.cell, r.i),
      |centn AS (
      |  SELECT cell, cv, sqrt(list_inner_product(cv, cv)) AS cn FROM (
      |    SELECT cell, list(s / cnt ORDER BY pos) AS cv FROM sums
      |    GROUP BY cell)),
      |e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings WHERE $scoreWhere),
      |n AS (
      |  SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm FROM e),
      |score AS (
      |  SELECT n.vec_id, c.cell,
      |         list_inner_product(n.v, c.cv) / (n.nrm * c.cn) AS cscore
      |  FROM n, centn c)""".stripMargin

  /** Same CTE with the corpus restricted by `where` — the incremental
    * index replays centroids/assignment over the INDEXED side only. */
  private def refinedScoreCte(where: String): String =
    s"""cc AS (
      |  SELECT GREATEST(4, CAST(ceil(sqrt(count(*) / 2.0)) AS BIGINT)) AS c
      |  FROM embeddings WHERE $where),
      |e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings WHERE $where),
      |n AS (
      |  SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm FROM e),
      |score0 AS (
      |  SELECT n.vec_id, c.cell,
      |         list_inner_product(n.v, c.cv) / (n.nrm * c.cn) AS cscore
      |  FROM n, (SELECT vec_id AS cell, v AS cv, nrm AS cn
      |           FROM n WHERE vec_id < (SELECT c FROM cc)) c),
      |asg0 AS (SELECT vec_id, cell FROM (
      |  SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id
      |    ORDER BY cscore DESC, cell DESC) AS rn FROM score0) WHERE rn = 1),
      |sums AS (
      |  SELECT a.cell, r.i AS pos,
      |         list_sum(list(nv.v[r.i] ORDER BY nv.vec_id)) AS s,
      |         COUNT(*) AS cnt
      |  FROM asg0 a JOIN n nv USING (vec_id),
      |       (SELECT unnest(range(1, 65)) AS i) r
      |  GROUP BY a.cell, r.i),
      |centn AS (
      |  SELECT cell, cv, sqrt(list_inner_product(cv, cv)) AS cn FROM (
      |    SELECT cell, list(s / cnt ORDER BY pos) AS cv FROM sums
      |    GROUP BY cell)),
      |score AS (
      |  SELECT n.vec_id, c.cell,
      |         list_inner_product(n.v, c.cv) / (n.nrm * c.cn) AS cscore
      |  FROM n, centn c)""".stripMargin

  val oracles: Map[String, String] = Map(
    "topic_profile" ->
      s"""WITH $RefinedScoreCte,
         |asg AS (SELECT vec_id, cell FROM (
         |  SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id
         |    ORDER BY cscore DESC, cell DESC) AS rn FROM score) WHERE rn = 1),
         |scored AS (
         |  SELECT a.vec_id, a.cell,
         |         ROUND(list_inner_product(nv.v, c.cv) / (nv.nrm * c.cn), 6)
         |           AS cos
         |  FROM asg a JOIN n nv USING (vec_id) JOIN centn c USING (cell)),
         |per AS (
         |  SELECT cell, COUNT(*) AS n_members,
         |         CAST(SUM(CAST(floor(cos * 1000000 + 0.5) AS BIGINT))
         |              AS BIGINT) AS ssum,
         |         MIN(cos) AS min_cohesion,
         |         MIN(vec_id) AS exemplar
         |  FROM scored GROUP BY 1)
         |SELECT cell, n_members,
         |       CAST(n_members AS DOUBLE) / (SELECT COUNT(*) FROM e) AS share,
         |       ssum / 1000000.0 / n_members AS mean_cohesion,
         |       min_cohesion, exemplar
         |FROM per ORDER BY cell""".stripMargin,
    "semantic_dedup" ->
      s"""WITH $RefinedScoreCte,
         |asg AS (SELECT vec_id, cell FROM (
         |  SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id
         |    ORDER BY cscore DESC, cell DESC) AS rn FROM score) WHERE rn = 1),
         |pruned AS (
         |  SELECT DISTINCT a.vec_id
         |  FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id > b.vec_id
         |  JOIN n na ON na.vec_id = a.vec_id
         |  JOIN n nb ON nb.vec_id = b.vec_id
         |  WHERE ROUND(list_inner_product(na.v, nb.v) / (na.nrm * nb.nrm), 6)
         |        >= $DedupTau)
         |SELECT vec_id, cell FROM asg
         |WHERE vec_id NOT IN (SELECT vec_id FROM pruned)
         |ORDER BY vec_id""".stripMargin,
    "embedding_quantize" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |m AS (
        |  SELECT vec_id, v,
        |         list_max(list_transform(v, x -> abs(x))) AS maxabs,
        |         sqrt(list_inner_product(v, v)) AS l2_norm
        |  FROM e)
        |SELECT vec_id, maxabs, l2_norm,
        |       list_max(list_transform(v, x ->
        |         abs(x - floor(x * 127.0 / maxabs + 0.5) * maxabs / 127.0)))
        |         AS max_err
        |FROM m ORDER BY vec_id""".stripMargin,
    "knn_brute" ->
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |n AS (
         |  SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm FROM e),
         |s AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |         ROUND(list_inner_product(c.v, q.v) / (c.nrm * q.nrm), 6) AS cos
         |  FROM n c, n q
         |  WHERE q.vec_id < $NumQueries AND c.vec_id <> q.vec_id),
         |r AS (
         |  SELECT query_id, neighbor_id, cos,
         |         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |           ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rk
         |  FROM s)
         |SELECT query_id, rk, neighbor_id, cos FROM r WHERE rk <= $K
         |ORDER BY query_id, rk""".stripMargin,
    "cosine_dups" ->
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |n AS (
         |  SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm FROM e)
         |SELECT a.vec_id AS a, b.vec_id AS b,
         |       ROUND(list_inner_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cos
         |FROM n a, n b
         |WHERE a.vec_id < $CosDupProbe AND a.vec_id < b.vec_id
         |  AND ROUND(list_inner_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= $CosDupThreshold
         |ORDER BY a, b""".stripMargin,
    "knn_ivf" ->
      s"""WITH $RefinedScoreCte,
         |asg AS (SELECT vec_id, cell FROM (
         |  SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id
         |    ORDER BY cscore DESC, cell DESC) AS rn FROM score) WHERE rn = 1),
         |probe AS (SELECT query_id, cell FROM (
         |  SELECT vec_id AS query_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id
         |    ORDER BY cscore DESC, cell) AS prk
         |  FROM score WHERE vec_id < $NumQueries)
         |  WHERE prk <= (SELECT LEAST(16, GREATEST(2, c // 4)) FROM cc)),
         |s AS (SELECT p.query_id, a.vec_id AS neighbor_id,
         |        ROUND(list_inner_product(cv2.v, qn.v) / (cv2.nrm * qn.nrm), 6) AS cos
         |      FROM asg a JOIN probe p ON a.cell = p.cell AND a.vec_id <> p.query_id
         |      JOIN n cv2 ON cv2.vec_id = a.vec_id
         |      JOIN n qn ON qn.vec_id = p.query_id),
         |r AS (SELECT query_id, neighbor_id, cos,
         |        CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |          ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rk FROM s)
         |SELECT query_id, rk, neighbor_id, cos FROM r WHERE rk <= $K
         |ORDER BY query_id, rk""".stripMargin,
    // full recompute restricted to the batch — centroids/assignment
    // replayed over the INDEXED (non-multiple-of-5) side only, exactly
    // what the standing index holds after create-or-append
    "knn_incremental" ->
      s"""WITH ${refinedScoreCte("(vec_id % 5) <> 0")},
         |asg AS (SELECT vec_id, cell FROM (
         |  SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id
         |    ORDER BY cscore DESC, cell DESC) AS rn FROM score) WHERE rn = 1),
         |q AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings WHERE (vec_id % 5) = 0),
         |qn AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm FROM q),
         |qscore AS (
         |  SELECT qn.vec_id, c.cell,
         |         list_inner_product(qn.v, c.cv) / (qn.nrm * c.cn) AS cscore
         |  FROM qn, centn c),
         |probe AS (SELECT query_id, cell FROM (
         |  SELECT vec_id AS query_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id
         |    ORDER BY cscore DESC, cell) AS prk FROM qscore)
         |  WHERE prk <= (SELECT LEAST(16, GREATEST(2, c // 4)) FROM cc)),
         |s AS (SELECT p.query_id, a.vec_id AS neighbor_id,
         |        ROUND(list_inner_product(cv2.v, q2.v) / (cv2.nrm * q2.nrm), 6) AS cos
         |      FROM asg a JOIN probe p ON a.cell = p.cell
         |      JOIN n cv2 ON cv2.vec_id = a.vec_id
         |      JOIN qn q2 ON q2.vec_id = p.query_id),
         |r AS (SELECT query_id, neighbor_id, cos,
         |        CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |          ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rk FROM s)
         |SELECT query_id, rk, neighbor_id, cos FROM r WHERE rk <= $K
         |ORDER BY query_id, rk""".stripMargin,
    // brute-force replay of the propagation: rank ALL seed members per
    // unlabeled vector by the same rounded cosine, vote, tie-break
    // (votes desc, label asc)
    "knn_classify" ->
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |n AS (
         |  SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm FROM e),
         |seed AS (
         |  SELECT n.vec_id, n.v, n.nrm, d.source
         |  FROM n JOIN documents d ON d.doc_id = n.vec_id
         |  WHERE (n.vec_id % $ClassifySeedMod) = 0
         |    AND n.vec_id < $ClassifySeedCap),
         |rest AS (SELECT * FROM n
         |  WHERE NOT ((vec_id % $ClassifySeedMod) = 0
         |    AND vec_id < $ClassifySeedCap)),
         |s AS (
         |  SELECT r.vec_id, sd.vec_id AS sid, sd.source,
         |         ROUND(list_inner_product(r.v, sd.v) / (r.nrm * sd.nrm), 6) AS cos
         |  FROM rest r, seed sd),
         |topk AS (SELECT vec_id, source FROM (
         |  SELECT vec_id, source, ROW_NUMBER() OVER (PARTITION BY vec_id
         |    ORDER BY cos DESC, sid) AS rk FROM s) WHERE rk <= $K),
         |votes AS (SELECT vec_id, source AS label, COUNT(*) AS cnt
         |          FROM topk GROUP BY vec_id, source)
         |SELECT vec_id, label, CAST(cnt AS INTEGER) AS votes FROM (
         |  SELECT vec_id, label, cnt, ROW_NUMBER() OVER (PARTITION BY vec_id
         |    ORDER BY cnt DESC, label) AS rn FROM votes) WHERE rn = 1
         |ORDER BY vec_id""".stripMargin,
    // streaming-index replay: centroids from the SEED slice only,
    // assignment over everything the index ends up holding (seed +
    // streamed), probe count from the seed-derived cell count — the
    // exact post-stream state, valid because streamed appends are
    // idempotent and centroids never move after the seed build
    "knn_stream_index" ->
      s"""WITH ${splitScoreCte("(vec_id % 5) IN (1, 2)", "(vec_id % 5) <> 0")},
         |asg AS (SELECT vec_id, cell FROM (
         |  SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id
         |    ORDER BY cscore DESC, cell DESC) AS rn FROM score) WHERE rn = 1),
         |q AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings WHERE (vec_id % 5) = 0),
         |qn AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm FROM q),
         |qscore AS (
         |  SELECT qn.vec_id, c.cell,
         |         list_inner_product(qn.v, c.cv) / (qn.nrm * c.cn) AS cscore
         |  FROM qn, centn c),
         |probe AS (SELECT query_id, cell FROM (
         |  SELECT vec_id AS query_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id
         |    ORDER BY cscore DESC, cell) AS prk FROM qscore)
         |  WHERE prk <= (SELECT LEAST(16, GREATEST(2, c // 4)) FROM cc)),
         |s AS (SELECT p.query_id, a.vec_id AS neighbor_id,
         |        ROUND(list_inner_product(cv2.v, q2.v) / (cv2.nrm * q2.nrm), 6) AS cos
         |      FROM asg a JOIN probe p ON a.cell = p.cell
         |      JOIN n cv2 ON cv2.vec_id = a.vec_id
         |      JOIN qn q2 ON q2.vec_id = p.query_id),
         |r AS (SELECT query_id, neighbor_id, cos,
         |        CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |          ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rk FROM s)
         |SELECT query_id, rk, neighbor_id, cos FROM r WHERE rk <= $K
         |ORDER BY query_id, rk""".stripMargin,
    "knn_pq" -> {
      val dcols = (0 until PqM).map(i =>
        s"MIN(CASE WHEN k.m = $i THEN a.qd END) AS d$i").mkString(",\n         |        ")
      val dsum = (0 until PqM).map(i => s"d$i").mkString(" + ")
      s"""WITH cc AS (
         |  SELECT LEAST(256,
         |    GREATEST(4, CAST(ceil(sqrt(count(*) / 2.0)) AS BIGINT))) AS c
         |  FROM embeddings),
         |e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |sub AS (
         |  SELECT vec_id, m, v[m * $PqSubDim + 1 : m * $PqSubDim + $PqSubDim] AS sub
         |  FROM e, (SELECT unnest(range(0, $PqM)) AS m)),
         |cent AS (SELECT vec_id AS code, m AS cm, sub AS csub
         |         FROM sub WHERE vec_id < (SELECT c FROM cc)),
         |enc AS (
         |  SELECT s.vec_id, s.m, c.code,
         |         list_inner_product(s.sub, s.sub)
         |           - 2.0 * list_inner_product(s.sub, c.csub)
         |           + list_inner_product(c.csub, c.csub) AS dist
         |  FROM sub s JOIN cent c ON s.m = c.cm),
         |codes AS (SELECT vec_id, m, code FROM (
         |  SELECT vec_id, m, code, ROW_NUMBER() OVER (PARTITION BY vec_id, m
         |    ORDER BY dist, code) AS rn FROM enc) WHERE rn = 1),
         |adc AS (
         |  SELECT s.vec_id AS query_id, s.m, c.code,
         |         list_inner_product(s.sub, s.sub)
         |           - 2.0 * list_inner_product(s.sub, c.csub)
         |           + list_inner_product(c.csub, c.csub) AS qd
         |  FROM sub s JOIN cent c ON s.m = c.cm WHERE s.vec_id < $NumQueries),
         |piv AS (
         |  SELECT a.query_id, k.vec_id,
         |        $dcols
         |  FROM codes k JOIN adc a ON k.m = a.m AND k.code = a.code
         |  WHERE k.vec_id <> a.query_id
         |  GROUP BY a.query_id, k.vec_id),
         |s AS (SELECT query_id, vec_id AS neighbor_id,
         |        ROUND($dsum, 6) AS approx_dist FROM piv),
         |r AS (SELECT query_id, neighbor_id, approx_dist,
         |        CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |          ORDER BY approx_dist, neighbor_id) AS INTEGER) AS rk FROM s)
         |SELECT query_id, rk, neighbor_id, approx_dist FROM r WHERE rk <= $K
         |ORDER BY query_id, rk""".stripMargin
    }) ++ Map(
    // knn_lsh: APPROXIMATE (the candidate set is signature-defined) but
    // fully DETERMINISTIC since r11's md5-derived planes — the oracle
    // replays the identical pipeline: plane matrix from md5("j:i")
    // (top-bit of first digest byte ⟺ first hex char <= '7'), the
    // projection as list_inner_product (same ascending-lane IEEE fold
    // as the kernel), bucket + hamming-1 multiprobe, cosine top-k.
    // SimilaritySpec still measures recall against knn_brute.
    "knn_lsh" ->
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |nn AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm FROM e),
         |d AS (SELECT len(v) AS nd FROM e LIMIT 1),
         |p AS (
         |  SELECT j, list_transform(range(0, d.nd),
         |    i -> CASE WHEN substr(md5(j || ':' || i), 1, 1) <= '7'
         |              THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END) AS pl
         |  FROM (SELECT unnest(range(0, $SigBits)) AS j), d),
         |pr AS (SELECT e.vec_id, p.j, list_inner_product(e.v, p.pl) AS proj
         |       FROM e, p),
         |sg AS (SELECT vec_id,
         |         CAST(SUM(CASE WHEN proj > 0
         |           THEN 1 << CAST(j AS INTEGER) ELSE 0 END) AS BIGINT) AS sig
         |       FROM pr GROUP BY vec_id),
         |q AS (
         |  SELECT nn.vec_id AS query_id, nn.v AS qv, nn.nrm AS qn,
         |         unnest(list_prepend(sg.sig,
         |           list_transform(range(0, $SigBits),
         |             jj -> xor(sg.sig,
         |               CAST((1 << CAST(jj AS INTEGER)) AS BIGINT))))) AS probe
         |  FROM nn JOIN sg ON nn.vec_id = sg.vec_id
         |  WHERE nn.vec_id < $NumQueries),
         |c AS (SELECT nn.vec_id, nn.v, nn.nrm, sg.sig
         |      FROM nn JOIN sg ON nn.vec_id = sg.vec_id),
         |sc AS (
         |  SELECT q.query_id, c.vec_id,
         |         ROUND(list_inner_product(c.v, q.qv) / (c.nrm * q.qn), 6) AS cos
         |  FROM c JOIN q ON c.sig = q.probe AND c.vec_id <> q.query_id),
         |r AS (SELECT query_id, vec_id, cos,
         |        CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |          ORDER BY cos DESC, vec_id) AS INTEGER) AS rk
         |      FROM sc)
         |SELECT query_id, rk, vec_id AS neighbor_id, cos
         |FROM r WHERE rk <= $K
         |ORDER BY query_id, rk""".stripMargin)
}
