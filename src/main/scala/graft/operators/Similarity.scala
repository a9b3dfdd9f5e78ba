package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Materialize.MaterializeOps

/** Similarity search over embedding columns (Array[Float]).
  *
  * Vector math runs through the native [[graft.functions.DotProduct]]
  * Catalyst expression: a generated tight loop inside whole-stage codegen
  * (Spark's higher-order functions are CodegenFallback — interpreted per
  * element, measured ~10× slower at sf0.1). The fold is strictly
  * sequential left-to-right in double, so results stay bit-deterministic
  * and identical to the DuckDB oracle's list_sum fold.
  */
object Similarity {

  /** Sequential-fold dot product of two float/double vectors, in double. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dot_product(a, b)

  /** Delegates to the shared [[graft.functions.VectorFunctions]] surface —
    * ONE definition of the vector math for operators and SQL callers. */
  def norm(a: Column): Column = graft.functions.VectorFunctions.vec_norm(a)

  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.cosine_sim(a, b)

  /** Cosine rounded to 6 dp — the ranking/score currency of every search
    * operator here. Ranking on the rounded value (with an id tie-break)
    * makes top-k results reproducible across engines: a last-ulp
    * difference in float summation order can never flip a rank.
    *
    * A ZERO-NORM vector scores NULL, never NaN: 0/0 is IEEE NaN, and
    * Spark sorts NaN ABOVE every real double — one all-zero padding
    * vector would rank FIRST in every cosine-desc window and pass every
    * ≥ threshold test (the poison [[labelOutliers]] documents). NULL
    * instead sorts LAST in desc windows, fails thresholds, and matches
    * DuckDB, whose 0.0/0.0 is NULL — so the oracles agree by
    * construction. */
  def score(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    Stats.canonZero(round(when(denom === 0.0, lit(null)).otherwise(
      dot(a, b) / denom), 6))
  }

  /** Brute-force top-k cosine neighbors for each query vector — the exact
    * baseline. Cost is |queries| × |corpus|; use for small query sets or as
    * the verifier for the ANN paths. Ranking is made fully deterministic by
    * tie-breaking on the corpus id.
    */
  def knnBruteForce(queries: DataFrame, corpus: DataFrame, k: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        score(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Greedy k-center coreset (Gonzalez 1985 farthest-point traversal) —
    * the diversity-maximizing data-selection pass: pick the max-norm
    * vector, then k−1 times the point FARTHEST (in squared L2) from the
    * already-chosen set. The selected set 2-approximates the optimal
    * k-center cover, so it is the standard "small but spread-out"
    * subset for labeling budgets, eval-set construction, and seeding
    * clustering; the returned `d2` sequence (distance of each pick at
    * selection time, non-increasing) IS the coverage-radius curve.
    *
    * Determinism: every distance is round(Σ(x_t−c_t)², 6) with the
    * element-order fold both engines share (the [[score]] contract);
    * argmax ties break on the lowest id; already-chosen ids are
    * excluded so exact-duplicate points can never re-select a center.
    * NULL vectors are ignored.
    *
    * Scale: k driver-coordinated rounds, each ONE distributed top-1
    * (TakeOrdered — no global sort materialization) over the corpus
    * against ≤ k broadcast literal centers; the corpus is scanned k
    * times but never shuffled or paired with itself. The collected
    * state is k vectors — control-plane by construction. */
  def kCenters(corpus: DataFrame, k: Int, idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && k <= 4096, "k out of range")
    val spark = corpus.sparkSession
    val base = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("_id"),
        col(vecCol).cast("array<double>").as("_v"))
      .materialized // scanned once per round — never recomputed
    def d2To(c: Array[Double]): Column = {
      val cl = array(c.map(lit(_)): _*)
      val diff = zip_with(col("_v"), cl, (a, b) => a - b)
      round(graft.functions.VectorFunctions.dot_product(diff, diff), 6)
    }
    val seedRow = base
      .orderBy(round(graft.functions.VectorFunctions.dot_product(col("_v"), col("_v")), 6).desc,
        col("_id").asc)
      .limit(1).collect()
    if (seedRow.isEmpty) {
      return spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("center_rank", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("vec_id", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("d2", org.apache.spark.sql.types.DoubleType))))
    }
    var chosen = Vector[(Long, Array[Double], Option[Double])](
      (seedRow(0).getLong(0), seedRow(0).getSeq[Double](1).toArray, None))
    var r = 1
    while (r < k) {
      val ids = chosen.map(_._1)
      val minD = chosen.map(c => d2To(c._2)).reduce(least(_, _))
      val next = base.filter(!col("_id").isin(ids: _*))
        .select(col("_id"), col("_v"), minD.as("_d"))
        .orderBy(col("_d").desc, col("_id").asc)
        .limit(1).collect()
      if (next.isEmpty) r = k
      else {
        chosen = chosen :+ ((next(0).getLong(0),
          next(0).getSeq[Double](1).toArray, Some(next(0).getDouble(2))))
        r += 1
      }
    }
    import spark.implicits._
    chosen.zipWithIndex
      .map { case ((id, _, d), ix) => (ix + 1L, id, d) }
      .toDF("center_rank", "vec_id", "d2")
  }

  /** Hard-negative mining for contrastive training: for each query
    * vector, the top-k most similar corpus vectors with a DIFFERENT
    * label — the "close but wrong" examples a contrastive or triplet
    * objective needs. Exact brute-force like [[knnBruteForce]] (the
    * calibration tool, and the right shape for the typical anchor-set
    * sizes); at corpus scale mine from [[annLsh]]/[[annIvf]] candidates
    * with the same label-mismatch gate before ranking. NULL labels count
    * as different from everything (null-safe inequality), so unlabeled
    * corpus rows can still serve as negatives.
    */
  /** Shared scaffold for the retrieval-eval triplet (AP / MRR / nDCG):
    * query×corpus cosine with the self-pair excluded, same-label
    * relevance flag (null-safe), and the canonical
    * (round(cos,6) desc, neighbor_id asc) rank — ONE definition of the
    * relevance/ranking rule, three metric folds on top. */
  private def rankedRelevance(queries: DataFrame, corpus: DataFrame,
                              idCol: String, vecCol: String,
                              labelCol: String): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      col(labelCol).as("query_label"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      col(labelCol).as("neighbor_label"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("query_label"),
        (col("query_label") <=> col("neighbor_label")).cast("long").as("rel"),
        score(col("qv"), col("cv")).as("cos"), col("neighbor_id"))
      .withColumn("rank", row_number().over(w).cast("long"))
  }

  def hardNegatives(queries: DataFrame, corpus: DataFrame, k: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    labelCol: String = "label"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      col(labelCol).as("query_label"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      col(labelCol).as("neighbor_label"))
    val scored = q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id") &&
        (col("query_label").isNull || col("neighbor_label").isNull ||
          col("query_label") =!= col("neighbor_label")))
      .select(col("query_id"), col("query_label"), col("neighbor_id"),
        col("neighbor_label"), score(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Retrieval-quality evaluation: average precision at `k` per query
    * over the exact cosine ranking, with "relevant" = same label — the
    * labeled-corpus eval harness (embedding-model regression tests, ANN
    * recall audits) run as a query instead of a driver-side script.
    *
    * AP@k = Σ_{i≤k, rel_i} P(i) / min(R, k) with P(i) = (relevant in
    * top i)/i and R = the query's total relevant corpus count. Each P(i)
    * is an exact small rational rounded ONCE to 6 dp and summed as
    * DECIMAL(18,6) — order-free, so any engine replays the sum
    * bit-for-bit; the final division is a single double op on exact
    * inputs. Queries with no relevant corpus rows yield NULL (not NaN).
    *
    * Cost: |queries| × |corpus| scoring (eval sets are small by
    * construction — this is the measurement tool, not the index); one
    * query-partitioned window ranks, one aggregate folds.
    */
  def retrievalAveragePrecision(queries: DataFrame, corpus: DataFrame, k: Int,
                                idCol: String = "vec_id",
                                vecCol: String = "embedding",
                                labelCol: String = "label"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    val ranked = rankedRelevance(queries, corpus, idCol, vecCol, labelCol)
      .withColumn("cumrel",
        sum(col("rel")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    ranked.groupBy(col("query_id"), col("query_label"))
      .agg(
        sum(col("rel")).as("n_relevant"),
        sum(when(col("rank") <= k && col("rel") === 1,
            round(col("cumrel").cast("double") / col("rank"), 6)
              .cast("decimal(18,6)"))
          .otherwise(lit(0).cast("decimal(18,6)"))).as("_apsum"))
      .select(col("query_id"), col("query_label"), col("n_relevant"),
        when(col("n_relevant") === 0, lit(null).cast("double"))
          .otherwise(round(col("_apsum").cast("double") /
            least(col("n_relevant"), lit(k.toLong)), 6))
          .as(s"ap_at_$k"))
  }

  /** MRR@k over the exact cosine ranking — the first-hit twin of
    * [[retrievalAveragePrecision]] (AP rewards every hit; MRR only the
    * FIRST relevant rank, the navigational-search and RAG-single-answer
    * readout). `rr_at_k = round(1 / first_rel_rank, 6)` — one double
    * division of exact integer operands, engine-identical — and NULL
    * when no relevant item lands in the top k (never 0: "no hit" and
    * "hit at rank → 0 after rounding" must stay distinguishable).
    *
    * Same plan shape as AP/nDCG: query×corpus score with the query panel
    * broadcast, ONE query-partitioned window, one grouped min — linear
    * in the corpus for a fixed panel. */
  def reciprocalRankAtK(queries: DataFrame, corpus: DataFrame, k: Int = 10,
                        idCol: String = "vec_id", vecCol: String = "embedding",
                        labelCol: String = "label"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    rankedRelevance(queries, corpus, idCol, vecCol, labelCol)
      .groupBy(col("query_id"), col("query_label"))
      .agg(min(when(col("rank") <= k && col("rel") === 1, col("rank")))
        .as("first_rel_rank"))
      .withColumn(s"rr_at_$k",
        round(lit(1.0) / col("first_rel_rank"), 6))
  }

  /** nDCG@k over the exact cosine ranking — [[retrievalAveragePrecision]]'s
    * graded-position twin (AP weights by precision at each hit; nDCG
    * discounts by 1/log₂(rank+1) and normalizes by the ideal ordering).
    *
    * The k discount weights and their prefix sums (the IDCG table) are
    * PLAN-TIME LITERALS — `round(1/log₂(i+1), 6)` computed once on the
    * driver and embedded as DECIMAL(18,6) constants — so no executor and
    * no oracle engine ever evaluates a logarithm: DCG is an exact decimal
    * dot product of relevance flags with constants, IDCG an array lookup
    * at `min(n_relevant, k)`, and nDCG one double division rounded once.
    * (The nearest literal sits ≥ 5.8e-8 from a rounding boundary, orders
    * of magnitude beyond any libm's log error — verified offline.)
    *
    * Same plan shape as AP: query×corpus score, one query-partitioned
    * window, one grouped fold. NULL nDCG when the query has no relevant
    * corpus item. */
  def ndcgAtK(queries: DataFrame, corpus: DataFrame, k: Int = 10,
              idCol: String = "vec_id", vecCol: String = "embedding",
              labelCol: String = "label"): DataFrame = {
    require(k >= 1 && k <= 64, "k out of range")
    val weights: Seq[java.math.BigDecimal] = (1 to k).map { i =>
      new java.math.BigDecimal(1.0 / (Math.log(i + 1.0) / Math.log(2.0)))
        .setScale(6, java.math.RoundingMode.HALF_UP)
    }
    val idcg = weights.scanLeft(java.math.BigDecimal.ZERO)(_.add(_)).tail
    val wLit = array(weights.map(x => lit(x).cast("decimal(18,6)")): _*)
    val idcgLit = array(idcg.map(x => lit(x).cast("decimal(18,6)")): _*)
    rankedRelevance(queries, corpus, idCol, vecCol, labelCol)
      .groupBy(col("query_id"), col("query_label"))
      .agg(
        sum(col("rel")).as("n_relevant"),
        sum(when(col("rank") <= k && col("rel") === 1,
            element_at(wLit, col("rank").cast("int")))
          .otherwise(lit(0).cast("decimal(18,6)"))).as("_dcg"))
      .select(col("query_id"), col("query_label"), col("n_relevant"),
        when(col("n_relevant") === 0, lit(null).cast("double"))
          .otherwise(round(col("_dcg").cast("double") /
            element_at(idcgLit,
              least(col("n_relevant"), lit(k.toLong)).cast("int")).cast("double"), 6))
          .as(s"ndcg_at_$k"))
  }

  /** Reciprocal-rank fusion of two per-query rankings (hybrid retrieval:
    * lexical BM25 × embedding cosine is the classic pair): fused score =
    * Σ 1/(k+rank) over the rankings that contain the item, re-ranked by
    * (score desc, id). Items on one list only still score (the absent
    * list contributes 0) — that robustness to disjoint result sets is
    * why RRF beats score-level mixing across incomparable scales.
    *
    * Each 1/(k+rank) term is rounded once to 6 dp and summed as
    * DECIMAL(18,6) (order-free, engine-replayable); ranks ride along as
    * `rank_a`/`rank_b` (NULL = absent). One full-outer join on
    * (query, id) + one query-partitioned window — rankings are top-N by
    * construction, so both are bounded by queries × N. */
  def rrfFuse(a: DataFrame, b: DataFrame, queryCol: String, idCol: String,
              k: Int = 60, rankCol: String = "rank"): DataFrame = {
    // k >= 1, not 0: with a 0-BASED ranking (common for external BM25
    // dumps) and k = 0, the top item's 1/(k+rank) is Infinity, whose
    // decimal cast is NULL, which coalesce scores as 0 — the BEST item
    // would silently sort LAST. RRF's canonical k is 60; 1 is the floor
    // at which every finite rank stays finite.
    require(k >= 1, "k must be >= 1 (k = 0 maps a 0-based top rank to 1/0)")
    val zero = lit(0).cast("decimal(18,6)")
    val ar = a.select(col(queryCol).as("_q"), col(idCol).as("_id"),
      col(rankCol).cast("long").as("rank_a"))
    val br = b.select(col(queryCol).as("_q"), col(idCol).as("_id"),
      col(rankCol).cast("long").as("rank_b"))
    val fused = ar.join(br, Seq("_q", "_id"), "full_outer")
      .select(col("_q"), col("_id"), col("rank_a"), col("rank_b"),
        (coalesce(round(lit(1.0) / (lit(k) + col("rank_a")), 6)
            .cast("decimal(18,6)"), zero) +
          coalesce(round(lit(1.0) / (lit(k) + col("rank_b")), 6)
            .cast("decimal(18,6)"), zero)).as("_rrf"))
    val w = Window.partitionBy(col("_q")).orderBy(col("_rrf").desc, col("_id").asc)
    fused.withColumn("fused_rank", row_number().over(w).cast("long"))
      .select(col("_q").as(queryCol), col("_id").as(idCol),
        col("rank_a"), col("rank_b"),
        col("_rrf").cast("double").as("rrf"), col("fused_rank"))
  }

  /** Per-label embedding dispersion — the diversity metric
    * diversity-aware data selection ranks labels/sources by: mean squared
    * distance to the label centroid, via the centroid identity
    * `E‖x−c‖² = E‖x‖² − ‖c‖²`, so ONE pass computes it (a VectorSumAgg
    * centroid + a decimal sum of once-rounded ‖x‖² per label) — no
    * pairwise anything, no second scan. Low dispersion = near-duplicate
    * mass (a SemDeDup candidate); high = heterogeneous content.
    *
    * Determinism: ‖x‖² is the codegen'd sequential-fold dot_product
    * rounded once to 6 dp and summed as DECIMAL (order-free);
    * centroid components round(Σ/n, 6) like q96; the final subtraction
    * is one double expression rounded to 6. Returns one row per label:
    * (label, n_vecs, mean_sq_norm, centroid_sq_norm, dispersion). */
  def labelDispersion(emb: DataFrame, dims: Int,
                      vecCol: String = "embedding",
                      labelCol: String = "label"): DataFrame = {
    val m2 = round(graft.functions.VectorFunctions.dot_product(col(vecCol), col(vecCol)), 6)
      .cast("decimal(18,6)")
    // count only rows with a vector: count(lit(1)) would divide
    // NULL-skipping sums by an inflated n and bias both the centroid
    // and the dispersion (the VectorSumAgg caveat, applied here too)
    emb.filter(col(vecCol).isNotNull)
      .select(col(labelCol).as("label"), col(vecCol).as("_v"), m2.as("_m2"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("_m2")).as("_s2"),
        graft.functions.VectorSumAgg.vectorSum(col("_v"), dims).as("_sum"))
      .withColumn("_c", expr("transform(_sum, x -> round(x / n_vecs, 6))"))
      .select(col("label"), col("n_vecs"),
        round(col("_s2").cast("double") / col("n_vecs"), 6).as("mean_sq_norm"),
        round(graft.functions.VectorFunctions.dot_product(col("_c"), col("_c")), 6)
          .as("centroid_sq_norm"))
      .withColumn("dispersion",
        Stats.canonZero(round(col("mean_sq_norm") - col("centroid_sq_norm"), 6)))
  }

  /** Deterministic pseudo-random hyperplane component for (plane p, d):
    * a value in [-7.5, 7.5] derived from an md5 hex digit — engine-portable
    * and seed-stable, so bucket assignment is reproducible everywhere.
    */
  def planeComponent(p: Int, d: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"plane:$p:$d".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    Integer.parseInt(hex.substring(0, 1), 16) - 7.5
  }

  /** Random-hyperplane LSH bucket signature: `planes` sign bits (planes
    * drawn from hash table `table` — each table uses an independent plane
    * set). Vectors in the same bucket are cosine-close with high
    * probability. This is the 100 TB path: one narrow shuffle on the
    * bucket key instead of an all-pairs cross join.
    */
  def lshBucket(vec: Column, dims: Int, planes: Int, table: Int = 0): Column = {
    val bits = (0 until planes).map { p =>
      val plane = array((0 until dims).map(d =>
        lit(planeComponent(table * planes + p, d))): _*)
      when(dot(vec, plane) >= 0, lit("1")).otherwise(lit("0"))
    }
    // a NULL vector gets a NULL bucket (dot(NULL, plane) is NULL → every
    // `>= 0` falls to "0"): it must not collide with real all-negative-dot
    // vectors and surface as an unscorable NULL-cos candidate
    when(vec.isNull, lit(null).cast("string")).otherwise(concat(bits: _*))
  }

  /** (id, table, bucket) rows across `tables` independent hash tables —
    * each vector shuffles `tables` times, the standard recall lever:
    * a true neighbor is a candidate if it collides in ANY table. */
  private def bucketed(df: DataFrame, idOut: String, vecOut: String,
                       dims: Int, planes: Int, tables: Int,
                       idCol: String, vecCol: String): DataFrame = {
    val entries = (0 until tables).map(t => struct(
      lit(t).as("table"), lshBucket(col(vecCol), dims, planes, t).as("bucket")))
    df.select(col(idCol).as(idOut), col(vecCol).as(vecOut),
        explode(array(entries: _*)).as("tb"))
      .select(col(idOut), col(vecOut), col("tb.table").as("table"),
        col("tb.bucket").as("bucket"))
  }

  /** ANN top-k via multi-table LSH: candidates = pairs sharing a bucket in
    * any of `tables` hash tables, ranked by exact (rounded) cosine.
    * Approximate by design — AnnRecallSpec measures recall against
    * knnBruteForce. Cost: each side shuffles `tables` times on the bucket
    * key; candidates are deduplicated before scoring.
    */
  def annLsh(queries: DataFrame, corpus: DataFrame, k: Int, dims: Int, planes: Int,
             tables: Int = 1,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = bucketed(queries, "query_id", "qv", dims, planes, tables, idCol, vecCol)
    val c = bucketed(corpus, "neighbor_id", "cv", dims, planes, tables, idCol, vecCol)
    val scored = q.join(c, Seq("table", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("qv"), col("neighbor_id"), col("cv"))
      .dropDuplicates("query_id", "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        score(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Deterministic seed centroids — the ONE shared implementation of
    * "first `nCells` non-NULL vectors in id order, keyed by their own id
    * (cell = vec id)". The seeds are oracle-visible (every IVF/PQ/SemDeDup
    * oracle replays exactly this frame), so the former five hand-kept
    * copies of this logic were one edit away from an oracle-parity bug;
    * any variant (renumbered cells, pre-cast vectors) derives from this
    * frame, never re-states the filter/order/limit. */
  private[operators] def seedCentroids(corpus: DataFrame, nCells: Int,
                                       idCol: String, vecCol: String): DataFrame =
    corpus.filter(col(vecCol).isNotNull).orderBy(col(idCol)).limit(nCells)
      .select(col(idCol).as("cell"), col(vecCol).as("cvec"))

  /** Deterministic Lloyd iterations for IVF centroid training: seed with
    * the first `nCells` corpus vectors (by id — reproducible), then
    * `iters` rounds of broadcast-assign + per-cell mean. Each round is one
    * broadcast join + one partial-aggregated groupBy — no driver-side
    * loops over data, only over the (tiny) centroid set. Empty cells keep
    * their previous centroid. Returns (cell_id, centroid) with centroids
    * as Array[Double].
    */
  def trainIvfCentroids(corpus: DataFrame, nCells: Int, iters: Int,
                        idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    val v = corpus.select(col(idCol).as("_id"),
      col(vecCol).cast("array<double>").as("_v"))
    // empty corpus: no dims to infer and nothing to train — empty centroids.
    // Dims come from a NON-NULL vector (a NULL first row would make size()
    // NULL and getInt throw), and NULL-vector rows never seed a centroid.
    val dimsRow = v.filter(col("_v").isNotNull).select(size(col("_v"))).head(1)
    if (dimsRow.isEmpty)
      return v.limit(0).select(col("_id").cast("int").as("cell"), col("_v").as("cvec"))
    val dims = dimsRow.head.getInt(0)
    // dense 0..n-1 cells numbered by the TRUE id order — renumbering on
    // an int-cast id would wrap/collide past 2^31 and make the window
    // tie-break (hence every downstream assignment) run-dependent
    var cents = seedCentroids(v, nCells, "_id", "_v")
      .materialized
      // renumber to dense 0..n-1 in TRUE id order ("cell" holds the raw
      // id here); an int-cast id would wrap/collide past 2^31. Control-
      // plane frame: ≤ nCells rows (the seed limit)
      .select((row_number().over(Window.orderBy(col("cell"))) - 1)
        .cast("int").as("cell"), col("cvec"))
    for (_ <- 0 until iters) {
      val assigned = v.crossJoin(broadcast(cents))
        .withColumn("d", score(col("_v"), col("cvec")))
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("_id")).orderBy(col("d").desc, col("cell").asc)))
        .filter(col("rnk") === 1)
      // per-cell mean via the element-wise VectorSumAgg: ONE aggregation
      // pass whose shuffle carries a double[dims] per (cell, partition) —
      // the previous posexplode + groupBy(cell, dim) + reassembly paid a
      // ×dims row explosion and a second shuffle
      val means = assigned
        .groupBy(col("cell"))
        .agg(graft.functions.VectorSumAgg.vectorSum(col("_v"), dims).as("_s"),
          // count the vectors the sum actually saw — count(lit(1)) would
          // count NULL-vector members too and bias the mean low
          count(col("_v")).as("_n"))
        .select(col("cell"), expr("transform(_s, x -> x / _n)").as("cvec"))
      // keep previous centroid for cells that lost all members
      cents = cents.select(col("cell"), col("cvec").as("prev"))
        .join(means.withColumnRenamed("cvec", "next"), Seq("cell"), "left")
        .select(col("cell"), coalesce(col("next"), col("prev")).as("cvec"))
        .materialized
    }
    cents
  }

  /** IVF-style ANN: deterministic centroids (seed = first `nCells` corpus
    * vectors; optionally Lloyd-trained via [[trainIvfCentroids]]), assign
    * every vector to its nearest centroid (one broadcast join), probe
    * `nProbe` nearest cells per query. One shuffle on cell id; the
    * standard inverted-file trade-off.
    */
  def annIvf(queries: DataFrame, corpus: DataFrame, k: Int, nCells: Int, nProbe: Int,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    annIvfWith(seedCentroids(corpus, nCells, idCol, vecCol),
      queries, corpus, k, nProbe, idCol, vecCol)

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup inside
    * k-means cells. Every vector is assigned to its nearest centroid (one
    * broadcast join — nCells rows), then a vector is marked a duplicate iff
    * ANY lower-id vector in the SAME cell has cosine ≥ `threshold`. The
    * lower-id rule is order-independent and one-pass-parallel; like
    * [[Dedup.dedupCorpus]]'s greedy pairwise drop it can over-delete on
    * transitive chains, which SemDeDup accepts by construction (the paper
    * prunes within-cluster ε-balls the same way).
    *
    * Differs from [[Dedup.embeddingNearDupLsh]] in the bucketing geometry:
    * k-means cells adapt to the data distribution (dense regions get their
    * own cells), while random hyperplanes are data-oblivious — the paper's
    * argument for clustering first. Candidate pairs are bounded by
    * Σ|cell|², so nCells scales with the corpus (√N cells keeps expected
    * cell size √N); pass Lloyd-trained centroids from
    * [[trainIvfCentroids]] for real runs, or omit for the deterministic
    * seed-centroid variant (first nCells vectors by id — reproducible and
    * oracle-mirrorable).
    *
    * Returns one row per input vector: (idCol, cell, kept) with kept
    * 1/0 as BIGINT.
    */
  def semDedup(emb: DataFrame, nCells: Int, threshold: Double,
               centroids: Option[DataFrame] = None,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = centroids.getOrElse(seedCentroids(emb, nCells, idCol, vecCol))
    val v = emb.select(col(idCol).as("_id"), col(vecCol).as("_v"))
    // assigned is referenced by BOTH pair sides — materialize once so the
    // corpus×centroid assignment isn't recomputed per reference
    val assigned = v.crossJoin(broadcast(cents))
      .withColumn("d", score(col("_v"), col("cvec")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("_id")).orderBy(col("d").desc, col("cell").asc)))
      .filter(col("rnk") === 1)
      .select(col("_id"), col("_v"), col("cell"))
      .materialized
    val lo = assigned.select(col("cell"), col("_id").as("_ida"), col("_v").as("_va"))
    val hi = assigned.select(col("cell"), col("_id").as("_idb"), col("_v").as("_vb"))
    val dups = lo.join(hi, Seq("cell"))
      .filter(col("_ida") < col("_idb"))
      .filter(score(col("_va"), col("_vb")) >= threshold)
      .select(col("_idb").as("_id")).distinct()
    assigned.join(dups.withColumn("_dup", lit(1L)), Seq("_id"), "left")
      .select(col("_id").as(idCol), col("cell").cast("long").as("cell"),
        when(col("_dup").isNull, lit(1L)).otherwise(lit(0L)).as("kept"))
  }

  /** Embedding-space label outliers: per-vector cosine to the vector's OWN
    * label centroid, z-scored against the label's cosine distribution —
    * the mislabel/contamination detector that runs before training a
    * classifier on labeled embeddings (a vector far from its label's
    * centroid relative to its peers is a labeling error, a near-dup from
    * another class, or genuine tail — all worth a look). Per-VECTOR
    * deviation is the point: q96/q107's centroids describe labels, this
    * flags members.
    *
    * Engine parity: centroid components and cosines round(·,6); the
    * label's mean/std come from exact DECIMAL sums of the rounded cosines
    * (Σcos, Σcos² — order-free), combined in one fixed double expression;
    * z rounds to 6. Degenerate labels (std = 0, e.g. singletons) emit
    * NULL z and never flag.
    *
    * Scale: one VectorSumAgg pass for centroids (labels-sized, broadcast
    * back), one map-only cosine, one labels-sized stats aggregate
    * (broadcast back), one map-only z — the corpus is scanned once and
    * never pairs. Returns (idCol, label, cos_sim, z, is_outlier) with
    * is_outlier = 1 iff z ≤ -zCut.
    */
  def labelOutliers(emb: DataFrame, dims: Int, zCut: Double = 2.0,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    labelCol: String = "label"): DataFrame = {
    // NULL vectors can't be scored; excluding them keeps row membership
    // aligned with the oracle mirror (whose unnest drops them anyway)
    // label kept at ITS OWN type: the old cast("long") turned string
    // labels into NULL, the centroid join matched nothing, and the
    // detector returned an EMPTY result with no error — callers with
    // "lang"-style labels got a clean-corpus report for an unchecked one
    val v = emb.select(col(idCol).as("_id"), col(labelCol).as("label"),
        col(vecCol).cast("array<double>").as("_v"))
      .filter(col("_v").isNotNull)
    val cents = v.groupBy(col("label"))
      .agg(graft.functions.VectorSumAgg.vectorSum(col("_v"), dims).as("_s"),
        count(col("_v")).as("_n"))
      .select(col("label"), expr("transform(_s, x -> round(x / _n, 6))").as("_c"))
      .filter(col("_c").isNotNull)
    // zero-norm guard: a zero vector (or all-zero centroid) makes the
    // cosine 0/0 → NaN, which would poison the label's DECIMAL stats on
    // one side and crash the oracle's DECIMAL cast on the other. Unscoreable
    // members carry NULL cos_sim: excluded from mean/std, NULL z, never flag.
    val cosr = v.join(broadcast(cents), Seq("label"))
      .select(col("_id"), col("label"),
        when(norm(col("_v")) > 0 && norm(col("_c")) > 0,
          score(col("_v"), col("_c"))).as("cos_sim"))
    val stats = cosr.groupBy(col("label")).agg(
      sum(col("cos_sim").cast("decimal(18,6)")).as("_s1"),
      sum(col("cos_sim").cast("decimal(18,6)") * col("cos_sim").cast("decimal(18,6)")).as("_s2"),
      count(col("cos_sim")).as("_nc"))
    cosr.join(broadcast(stats), Seq("label"))
      .withColumn("_mean", col("_s1").cast("double") / col("_nc").cast("double"))
      .withColumn("_std", sqrt(greatest(
        col("_s2").cast("double") / col("_nc").cast("double") - col("_mean") * col("_mean"),
        lit(0.0))))
      .withColumn("z",
        when(col("_std") > 0,
          Stats.canonZero(round((col("cos_sim") - col("_mean")) / col("_std"), 6))))
      .select(col("_id").as(idCol), col("label"), col("cos_sim"), col("z"),
        when(col("z") <= -zCut, 1L).otherwise(0L).as("is_outlier"))
  }

  /** Top-`n` nearest centroids per row (broadcast centroid table, window
    * partitioned by the ID column alone — never by the vector, a wide
    * partition key would hash the whole array per row for nothing).
    * Shared by [[annIvfWith]] and [[hardNegativesAnn]]. */
  /** The IVF candidate join (probed queries × cell-assigned corpus) with
    * PINNED-width partitioning on both sides: the per-candidate cosine
    * downstream is CPU per row, not bytes, and AQE's byte-based
    * coalescing under-parallelizes exactly that stage (the q200 lesson;
    * measured q167 2.1 → ~1.1 s at sf0.1 on 32 cores with coalescing
    * disabled). The explicit count disables the coalesce at the
    * session's configured width; candidate volume ∝ queries × probes ×
    * cell size — never corpus². */
  private def cellJoin(qProbed: DataFrame, cAssigned: DataFrame): DataFrame = {
    val nPart = qProbed.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    qProbed.repartition(nPart, col("cell_id"))
      .join(cAssigned.repartition(nPart, col("cell_id")), Seq("cell_id"))
  }

  private[operators] def nearestCellsWith(cents: DataFrame, df: DataFrame, idc: String,
                                          vcol: String, out: String, n: Int): DataFrame = {
    val scored = df.crossJoin(broadcast(cents))
      .withColumn("d", score(col(vcol), col("cvec")))
    val w = Window.partitionBy(col(idc)).orderBy(col("d").desc, col("cell").asc)
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= n)
      .select(df.columns.toIndexedSeq.map(col) :+ col("cell").as(out): _*)
  }

  /** IVF search against an explicit (cell, cvec) centroid table — e.g. one
    * produced by [[trainIvfCentroids]]. */
  def annIvfWith(centroids: DataFrame, queries: DataFrame, corpus: DataFrame,
                 k: Int, nProbe: Int,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = centroids
    val cAssigned = nearestCellsWith(cents,
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")),
      "neighbor_id", "cv", "cell_id", 1)
    val qProbed = nearestCellsWith(cents,
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")),
      "query_id", "qv", "cell_id", nProbe)
    val scored = cellJoin(qProbed, cAssigned)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), score(col("qv"), col("cv")).as("cos"))
      .groupBy(col("query_id"), col("neighbor_id")).agg(max(col("cos")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long")).filter(col("rank") <= k)
  }

  /** ANN-gated hard-negative mining — the corpus-scale composition of
    * [[hardNegatives]]' different-label top-k with [[annIvfWith]]'s IVF
    * candidate gate, closing the one remaining cartesian a production
    * pipeline would actually run at scale: contrastive-training prep mines
    * negatives for queries ≈ the whole training set, where the exact
    * cross join is O(N²) and this is one broadcast cell assignment per
    * side + one equi-join on cell id.
    *
    * Candidates = corpus vectors sharing any of the query's `nProbe`
    * nearest cells (corpus assigned to its 1 nearest); the same label
    * gate as the exact path (NULL-safe inequality — unlabeled corpus rows
    * still serve as negatives) filters BEFORE ranking, and the top-k
    * window ranks by round(cosine, 6) with an id tie-break. Approximate
    * by design: a true hard negative in a cell the query never probes is
    * missed — AnnRecallSpec measures recall against [[hardNegatives]] at
    * the fixed candidate budget. Centroids default to the deterministic
    * seed variant (first `nCells` corpus vectors by id — reproducible and
    * oracle-mirrorable); pass Lloyd-trained centroids from
    * [[trainIvfCentroids]] for real runs.
    */
  def hardNegativesAnn(queries: DataFrame, corpus: DataFrame, k: Int,
                       nCells: Int, nProbe: Int,
                       centroids: Option[DataFrame] = None,
                       idCol: String = "vec_id", vecCol: String = "embedding",
                       labelCol: String = "label"): DataFrame = {
    val cents = centroids.getOrElse(seedCentroids(corpus, nCells, idCol, vecCol))
    val cAssigned = nearestCellsWith(cents,
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        col(labelCol).as("neighbor_label")),
      "neighbor_id", "cv", "cell_id", 1)
    val qProbed = nearestCellsWith(cents,
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        col(labelCol).as("query_label")),
      "query_id", "qv", "cell_id", nProbe)
    val scored = cellJoin(qProbed, cAssigned)
      .filter(col("query_id") =!= col("neighbor_id") &&
        (col("query_label").isNull || col("neighbor_label").isNull ||
          col("query_label") =!= col("neighbor_label")))
      .select(col("query_id"), col("query_label"), col("neighbor_id"),
        col("neighbor_label"), score(col("qv"), col("cv")).as("cos"))
      // corpus rows sit in exactly one cell so a pair appears at most once;
      // the agg is the same idempotent collapse annIvfWith carries, kept so
      // multi-assignment centroid tables (if ever passed) stay correct
      .groupBy(col("query_id"), col("query_label"), col("neighbor_id"),
        col("neighbor_label"))
      .agg(max(col("cos")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** kNN label-agreement audit — the Cleanlab-style label-noise
    * detector beside q113's centroid-distance outliers: for each
    * LABELED vector, the share of its top-k nearest neighbors carrying
    * the SAME label. Low agreement flags probable mislabels (confident-
    * learning's core signal); the `suspect` verdict is integer
    * cross-multiplied (2·n_same < n_neighbors — strict minority), so
    * the decision never touches a float.
    *
    * Built on the IVF candidate gate from the start (the
    * [[hardNegativesAnn]] shape with queries = the labeled corpus) —
    * never a cartesian: neighbors come from each query's nProbe nearest
    * cells, scored with the exact rounded cosine and ranked with the id
    * tie-break. Unlabeled rows are audited as nothing but still SERVE
    * as neighbors (they agree with no label, diluting agreement — the
    * conservative choice for a mixed corpus).
    *
    * Scale: [[annIvfWith]]'s law — broadcast ≤√N centroid table, cell
    * equi-join, per-query top-k window partitioned by query. */
  def knnLabelAgreement(corpus: DataFrame, k: Int, nCells: Int, nProbe: Int,
                        centroids: Option[DataFrame] = None,
                        idCol: String = "vec_id", vecCol: String = "embedding",
                        labelCol: String = "label"): DataFrame = {
    val cents = centroids.getOrElse(seedCentroids(corpus, nCells, idCol, vecCol))
    val cAssigned = nearestCellsWith(cents,
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        col(labelCol).as("neighbor_label")),
      "neighbor_id", "cv", "cell_id", 1)
    val qProbed = nearestCellsWith(cents,
      corpus.filter(col(labelCol).isNotNull)
        .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
          col(labelCol).as("query_label")),
      "query_id", "qv", "cell_id", nProbe)
    val scored = cellJoin(qProbed, cAssigned)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("query_label"), col("neighbor_id"),
        col("neighbor_label"), score(col("qv"), col("cv")).as("cos"))
      .groupBy(col("query_id"), col("query_label"), col("neighbor_id"),
        col("neighbor_label"))
      .agg(max(col("cos")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .groupBy(col("query_id").as("vec_id"),
        col("query_label").cast("long").as("label"))
      .agg(count(lit(1)).as("n_neighbors"),
        sum(when(col("query_label") <=> col("neighbor_label"), 1L)
          .otherwise(0L)).as("n_same"))
      .withColumn("agreement",
        round(col("n_same").cast("double") / col("n_neighbors"), 6))
      .withColumn("suspect", col("n_same") * 2 < col("n_neighbors"))
  }

  /** Product-quantization encoding (Jégou et al. 2011, "Product
    * Quantization for Nearest Neighbor Search"): split each vector into
    * `subspaces` contiguous subvectors and replace every subvector with
    * the id of its nearest codeword in that subspace's codebook —
    * compressing dims×4 bytes to `subspaces` small ints (the compression
    * that makes billion-vector ANN indexes fit in RAM; asymmetric
    * distance computation then scans codes against per-query lookup
    * tables). Codebooks here are the deterministic seed variant the IVF
    * path (q33) also uses — the first `codebookSize` vectors' subvectors,
    * dense code ids 0..codebookSize−1; Lloyd refinement composes via
    * [[trainIvfCentroids]]-style iterations if needed.
    *
    * Output is (vec_id, subspace, code) — comparator-safe, 1 row per
    * subvector. Nearest is squared-L2 via the codegen'd dot Expression
    * (|a−b|² = a·a + b·b − 2a·b), ties broken by code asc so the argmin
    * replays exactly.
    *
    * Scale: the codebook is `subspaces`×`codebookSize` rows — a broadcast
    * — and each vector fans out to `subspaces` rows map-side; one window
    * ranks codewords PER (vector, subspace), never globally. Cost is
    * linear in vectors × subspaces × codebookSize, all broadcast-local.
    */
  private def pqSubVecs(vc: Column, d0: Int, subspaces: Int): Column =
    explode(array((0 until subspaces).map { s =>
      struct(lit(s.toLong).as("s"), slice(vc, s * d0 + 1, d0).as("sv"))
    }: _*))

  /** Seed codebooks shared by [[pqEncode]] and [[annPq]]: the first
    * `codebookSize` vectors' subvectors, dense code ids 0..size−1. */
  private[operators] def pqCodebook(emb: DataFrame, dims: Int, subspaces: Int,
                                    codebookSize: Int, idCol: String,
                                    vecCol: String): DataFrame = {
    val d0 = dims / subspaces
    emb.select(col(idCol).as("_id"), col(vecCol).cast("array<double>").as("_v"))
      .filter(col("_v").isNotNull)
      .orderBy(col("_id")).limit(codebookSize)
      .materialized
      // control-plane frame: ≤ codebookSize rows (the limit above)
      .withColumn("code", (row_number().over(Window.orderBy(col("_id"))) - 1)
        .cast("long"))
      .select(col("code"), pqSubVecs(col("_v"), d0, subspaces).as("_x"))
      .select(col("code"), col("_x.s").as("s"), col("_x.sv").as("cv"))
  }

  def pqEncode(emb: DataFrame, dims: Int, subspaces: Int, codebookSize: Int,
               idCol: String = "vec_id", vecCol: String = "embedding",
               codebook: Option[DataFrame] = None): DataFrame = {
    require(dims % subspaces == 0, "subspaces must divide dims")
    val d0 = dims / subspaces
    val sub = emb.select(col(idCol).as("vec_id"),
        col(vecCol).cast("array<double>").as("_v"))
      .filter(col("_v").isNotNull)
      .select(col("vec_id"), pqSubVecs(col("_v"), d0, subspaces).as("_x"))
      .select(col("vec_id"), col("_x.s").as("s"), col("_x.sv").as("sv"))
    val code = codebook.getOrElse(
      pqCodebook(emb, dims, subspaces, codebookSize, idCol, vecCol))
    // round(…, 6) like lloydPq's assignment and annIvfPq's encoder: the
    // shipped codes must match the partition the codebook was TRAINED on
    // — an unrounded argmin can flip a rounded tie the last Lloyd round
    // broke toward the lower code id
    val dist = round(dot(col("sv"), col("sv")) + dot(col("cv"), col("cv")) -
      lit(2.0) * dot(col("sv"), col("cv")), 6)
    val w = Window.partitionBy(col("vec_id"), col("s"))
      .orderBy(dist.asc, col("code").asc)
    sub.join(broadcast(code), Seq("s"))
      .withColumn("_rnk", row_number().over(w))
      .filter(col("_rnk") === 1)
      .select(col("vec_id"), col("s").cast("long").as("subspace"), col("code"))
  }

  /** Lloyd rounds over per-subspace codewords — the shared k-means core
    * of [[trainPqCodebook]] (raw subvectors) and [[annIvfPq]]'s
    * `codebookIters` (residual subvectors). `sub` is (idc, s, sv);
    * the assignment argmin rounds to 6 dp with a code tie-break like
    * every rank here, the per-(s, code) mean rides VectorSumAgg (one
    * aggregation pass), and codewords that lose all members keep their
    * previous value. Trained codebooks are spec-measured, not
    * oracle-replayed — double means are order-sensitive in the last ulp,
    * the same contract as [[trainIvfCentroids]]. */
  private def lloydPq(sub: DataFrame, idc: String, cbInit: DataFrame,
                      d0: Int, iters: Int): DataFrame = {
    var cb = cbInit
    for (_ <- 0 until iters) {
      val assigned = sub.join(broadcast(cb), Seq("s"))
        .withColumn("_d", round(dot(col("sv"), col("sv")) +
          dot(col("cv"), col("cv")) - lit(2.0) * dot(col("sv"), col("cv")), 6))
        .withColumn("_rnk", row_number().over(Window
          .partitionBy(col(idc), col("s"))
          .orderBy(col("_d").asc, col("code").asc)))
        .filter(col("_rnk") === 1)
      val means = assigned.groupBy(col("s"), col("code"))
        .agg(graft.functions.VectorSumAgg.vectorSum(col("sv"), d0).as("_sm"),
          count(col("sv")).as("_n"))
        .select(col("s"), col("code"),
          expr("transform(_sm, x -> x / _n)").as("_next"))
      cb = cb.withColumnRenamed("cv", "_prev")
        .join(means, Seq("s", "code"), "left")
        .select(col("code"), col("s"),
          coalesce(col("_next"), col("_prev")).as("cv"))
        .materialized
    }
    cb
  }

  /** Lloyd-trained PQ codebooks (Jégou et al. 2011 §III trains per-
    * subspace k-means; the seed variant [[pqCodebook]] is the
    * deterministic oracle path): refine the first-k seeds with `iters`
    * assignment/mean rounds per subspace. Feed the result to
    * [[pqEncode]]/[[annPq]] via their `codebook` parameter —
    * AnnRecallSpec measures what training buys at a fixed budget. */
  def trainPqCodebook(corpus: DataFrame, dims: Int, subspaces: Int,
                      codebookSize: Int, iters: Int,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): DataFrame = {
    require(dims % subspaces == 0, "subspaces must divide dims")
    val d0 = dims / subspaces
    val sub = corpus.select(col(idCol).as("_id"),
        col(vecCol).cast("array<double>").as("_v"))
      .filter(col("_v").isNotNull)
      .select(col("_id"), pqSubVecs(col("_v"), d0, subspaces).as("_x"))
      .select(col("_id"), col("_x.s").as("s"), col("_x.sv").as("sv"))
      .materialized // re-scanned every Lloyd round
    lloydPq(sub, "_id",
      pqCodebook(corpus, dims, subspaces, codebookSize, idCol, vecCol)
        .materialized,
      d0, iters)
  }

  /** PQ asymmetric-distance ANN (the search half of [[pqEncode]], Jégou
    * et al. 2011 §IV): each query builds a `subspaces`×`codebookSize`
    * lookup table of exact query-subvector→codeword distances, and every
    * corpus vector's approximate distance is the sum of `subspaces` table
    * entries selected by its stored codes — the corpus is scanned as
    * small ints, never floats, which is the entire point of PQ at scale.
    *
    * Determinism: each table entry is rounded once to DECIMAL(18,6), so
    * the per-vector sum is order-free; ranking ties break by neighbor id.
    *
    * Scale: codes and the LUT join on (subspace, code) — the LUT is
    * queries×subspaces×codebookSize rows, broadcast; one partial-agg
    * shuffle on (query, vector); top-k is a per-QUERY window. Approximate
    * by construction: recall/compression trades via `subspaces` and
    * `codebookSize` — the exact kNN (q26) and IVF (q33) paths sit beside
    * it in the catalog.
    */
  def annPq(queries: DataFrame, corpus: DataFrame, k: Int, dims: Int,
            subspaces: Int, codebookSize: Int,
            idCol: String = "vec_id", vecCol: String = "embedding",
            codebook: Option[DataFrame] = None): DataFrame = {
    require(dims % subspaces == 0, "subspaces must divide dims")
    val d0 = dims / subspaces
    val cb = codebook.getOrElse(
      pqCodebook(corpus, dims, subspaces, codebookSize, idCol, vecCol))
    val codes = pqEncode(corpus, dims, subspaces, codebookSize, idCol, vecCol,
        codebook = Some(cb))
      .withColumnRenamed("subspace", "s")
    val qsub = queries.select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("_q"))
      .filter(col("_q").isNotNull)
      .select(col("query_id"), pqSubVecs(col("_q"), d0, subspaces).as("_x"))
      .select(col("query_id"), col("_x.s").as("s"), col("_x.sv").as("qv"))
    val lut = qsub.join(broadcast(cb), Seq("s"))
      .select(col("query_id"), col("s"), col("code"),
        round(dot(col("qv"), col("qv")) + dot(col("cv"), col("cv")) -
          lit(2.0) * dot(col("qv"), col("cv")), 6)
          .cast("decimal(18,6)").as("_d"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("_ad").asc, col("vec_id").asc)
    codes.join(broadcast(lut), Seq("s", "code"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("_d")).as("_ad"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("_ad").cast("double").as("approx_dist"), col("rank"))
  }

  /** Nearest cell by squared L2 (the IVF-PQ coarse quantizer's metric —
    * the residual r = v − c the PQ stage encodes is only meaningful under
    * the same L2 geometry that picked c). Keeps the centroid vector on
    * the row so the caller can form the residual without a second join.
    * Broadcast centroids, window per id — same scale shape as
    * [[nearestCellsWith]]. */
  private def nearestCellsL2(cents: DataFrame, df: DataFrame, idc: String,
                             vcol: String, n: Int): DataFrame = {
    val d2 = round(dot(col(vcol), col(vcol)) + dot(col("cvec"), col("cvec")) -
      lit(2.0) * dot(col(vcol), col("cvec")), 6)
    val w = Window.partitionBy(col(idc)).orderBy(d2.asc, col("cell").asc)
    df.crossJoin(broadcast(cents))
      .withColumn("_rnk", row_number().over(w)).filter(col("_rnk") <= n)
      .select(df.columns.toIndexedSeq.map(col) :+ col("cell").as("cell_id") :+
        zip_with(col(vcol), col("cvec"), (a, b) => a - b).as("_res"): _*)
  }

  /** IVF-PQ ANN (Jégou et al. 2011 §V, the FAISS `IndexIVFPQ` shape —
    * the composition production billion-vector search actually deploys):
    * a coarse quantizer routes every vector to its nearest cell, PQ
    * encodes the RESIDUAL v − centroid (residuals concentrate around 0,
    * so the same codebook budget quantizes them far more finely than raw
    * vectors), and a query scans only its `nProbe` nearest cells, scoring
    * candidates by asymmetric-distance lookup-table sums over their
    * stored codes — never touching a corpus float.
    *
    * Determinism (oracle-replayable end to end): centroids are the first
    * `nCells` corpus vectors by id (or pass Lloyd-trained ones), the
    * residual codebook seeds from a deterministic md5-ordered sample of
    * residuals (order by md5("ivfpq:" + id) — a uniform draw, the
    * standard k-means init; measured recall@10 0.46 vs 0.37 for a
    * largest-norm rule whose outlier codewords quantize typical
    * residuals poorly, and never the centroid seeds' own zero residuals,
    * which a first-by-id rule would pick and collapse the codebook
    * onto), every distance that feeds a rank is rounded once to
    * 6 dp (cell argmin, code argmin) or summed as DECIMAL(18,6) (ADC),
    * and every window ties break on the id.
    *
    * Scale: centroids and the residual codebook are broadcasts; corpus
    * encoding is one windowed argmin per (vector, subspace) over a
    * broadcast join — linear in N×subspaces×codebookSize, no shuffle of
    * vectors against vectors; the ADC tables are
    * queries×nProbe×subspaces×codebookSize rows (per-query constant,
    * broadcast); candidate scoring is ONE equi-join on cell id followed
    * by a (query, neighbor) partial agg and a per-query top-k window.
    * Nothing is quadratic in the corpus. Approximate on two axes
    * (cells missed by probing, PQ quantization error) — AnnRecallSpec
    * measures recall against the exact path at the fixed budget.
    */
  def annIvfPq(queries: DataFrame, corpus: DataFrame, k: Int,
               nCells: Int, nProbe: Int, dims: Int, subspaces: Int,
               codebookSize: Int, centroids: Option[DataFrame] = None,
               idCol: String = "vec_id", vecCol: String = "embedding",
               codebookIters: Int = 0): DataFrame = {
    require(dims % subspaces == 0, "subspaces must divide dims")
    val d0 = dims / subspaces
    val cents = centroids.getOrElse(seedCentroids(
        corpus.select(col(idCol).as("_id"), col(vecCol).cast("array<double>").as("_v")),
        nCells, "_id", "_v"))
      .materialized
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("_cv")).filter(col("_cv").isNotNull)
    // corpus → 1 nearest cell, residual attached; materialized once —
    // both the codebook seed scan and the encode scan read this frame
    val cAssigned = nearestCellsL2(cents, c, "neighbor_id", "_cv", 1)
      .select(col("neighbor_id"), col("cell_id"), col("_res"))
      .materialized
    val cbSeed = cAssigned.withColumn("_hk",
        md5(concat(lit("ivfpq:"), col("neighbor_id").cast("string"))))
      .orderBy(col("_hk"), col("neighbor_id")).limit(codebookSize)
      .materialized
      // control-plane frame: ≤ codebookSize rows (the limit above)
      .withColumn("code", (row_number().over(
        Window.orderBy(col("_hk"), col("neighbor_id"))) - 1).cast("long"))
      .select(col("code"), pqSubVecs(col("_res"), d0, subspaces).as("_x"))
      .select(col("code"), col("_x.s").as("s"), col("_x.sv").as("cv"))
    val sub = cAssigned
      .select(col("neighbor_id"), col("cell_id"),
        pqSubVecs(col("_res"), d0, subspaces).as("_x"))
      .select(col("neighbor_id"), col("cell_id"),
        col("_x.s").as("s"), col("_x.sv").as("sv"))
    // optional Lloyd refinement of the residual codebook (codebookIters
    // > 0): spec-measured like every trained path — the oracle rows stay
    // on the deterministic seed
    val cb =
      if (codebookIters <= 0) cbSeed
      else lloydPq(sub, "neighbor_id", cbSeed.materialized,
        d0, codebookIters)
    val encW = Window.partitionBy(col("neighbor_id"), col("s"))
      .orderBy(round(dot(col("sv"), col("sv")) + dot(col("cv"), col("cv")) -
        lit(2.0) * dot(col("sv"), col("cv")), 6).asc, col("code").asc)
    val codes = sub.join(broadcast(cb), Seq("s"))
      .withColumn("_rnk", row_number().over(encW)).filter(col("_rnk") === 1)
      .select(col("neighbor_id"), col("cell_id"), col("s"), col("code"))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("_qv")).filter(col("_qv").isNotNull)
    val qProbed = nearestCellsL2(cents, q, "query_id", "_qv", nProbe)
      .select(col("query_id"), col("cell_id"),
        pqSubVecs(col("_res"), d0, subspaces).as("_x"))
      .select(col("query_id"), col("cell_id"), col("_x.s").as("s"),
        col("_x.sv").as("qv"))
    val lut = qProbed.join(broadcast(cb), Seq("s"))
      .select(col("query_id"), col("cell_id"), col("s"), col("code"),
        round(dot(col("qv"), col("qv")) + dot(col("cv"), col("cv")) -
          lit(2.0) * dot(col("qv"), col("cv")), 6)
          .cast("decimal(18,6)").as("_d"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("_ad").asc, col("neighbor_id").asc)
    codes.join(broadcast(lut), Seq("cell_id", "s", "code"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("_d")).as("_ad"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("_ad").cast("double").as("approx_dist"), col("rank"))
  }

  /** Johnson–Lindenstrauss random projection: reduce `dims`-dim embeddings
    * to `outDims` components with a ±1 sign matrix (Achlioptas 2003,
    * "Database-friendly random projections" — the dense ±1 variant
    * preserves pairwise distances/cosines within 1±ε at
    * outDims ≈ 8·ln(n)/ε², no Gaussians needed). The matrix is never
    * stored: sign(d, j) is the parity of md5("rp:d:j"), so any executor —
    * or the SQL oracle — regenerates the identical matrix from nothing.
    *
    * Output is EXPLODED (vec_id, j, component) rows — the shape every
    * downstream op here consumes (and the comparator-safe one); pivot to
    * arrays at the edge if a dense layout is needed. Components divide by
    * √outDims so cosine/dot magnitudes stay comparable pre/post.
    *
    * Determinism: values are once-rounded to DECIMAL(12,6) before the
    * sign multiply, so each component's sum is order-free exact decimal;
    * the output is that exact decimal pushed through ONE IEEE division —
    * deliberately NOT re-rounded, because a 6-dp decimal divided by
    * √outDims lands exactly on half-ulp ties where engines' round()
    * tie-rules diverge (Spark rounds the canonical decimal string, DuckDB
    * the binary value), while the unrounded doubles are bit-identical.
    *
    * Scale: MAP-ONLY — the sign matrix is a dims×outDims literal int
    * array (computed driver-side from the same md5 parity), each row
    * folds its own vector into `outDims` exact-decimal components via a
    * sequential HOF aggregate, and the only non-map node is the final
    * posexplode to the output shape. No join, no shuffle, nothing but
    * the scan — the earlier posexplode + sign-join + (vec, j) partial-agg
    * formulation shuffled vectors × outDims rows and measured ~5× slower
    * at sf0.1 for the identical (order-free decimal) result.
    */
  def randomProjection(emb: DataFrame, dims: Int, outDims: Int,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    require(dims >= 1 && outDims >= 1 && outDims <= dims,
      "need 1 <= outDims <= dims")
    require(dims.toLong * outDims <= (1 << 20), "sign matrix must stay literal-sized")
    // sign(d, j) = parity of md5("rp:d:j") — identical to the oracle's
    // regeneration; flattened row-major as [(d-1)·outDims + j]
    val signArr: Array[Int] = Array.tabulate(dims * outDims) { r =>
      val d = r / outDims + 1
      val j = r % outDims
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"rp:$d:$j".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1 else -1
    }
    // per-element round+cast staged ONCE in Catalyst (identical value to
    // the old per-(d,j) evaluation — round is deterministic), then the
    // dims×outDims signed dot products run compiled in SignedProjection:
    // the HOF transform×aggregate chain evaluated interpreted lambdas
    // with boxed decimal adds per (row, d, j) — the dominant cost of the
    // operator at sf0.1 (RandomProjectionEquivalenceSpec pins
    // bit-identity, incl. null-vector / null-component propagation)
    val staged = transform(col(vecCol),
      x => round(x.cast("double"), 6).cast("decimal(12,6)"))
    val projected =
      graft.functions.SignedProjection(staged, signArr.toSeq, dims, outDims)
    emb.select(col(idCol).as("vec_id"), posexplode(projected).as(Seq("j", "_s")))
      .select(col("vec_id"), col("j").cast("long").as("j"),
        (col("_s").cast("double") / lit(math.sqrt(outDims.toDouble)))
          .as("component"))
  }
}
