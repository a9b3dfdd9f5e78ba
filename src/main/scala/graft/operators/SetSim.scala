package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Materialize.MaterializeOps

/** EXACT set-similarity self-join via prefix filtering (AllPairs/PPJoin
  * family — Bayardo et al. WWW'07, Xiao et al. WWW'08): every unordered
  * document pair whose SHINGLE-set Jaccard is ≥ τ, with NO false
  * negatives and no approximation. The repo's MinHash/LSH family (q24,
  * q112) is the probabilistic scale path; this is the exact complement
  * for thresholds high enough that prefix filtering prunes the
  * candidate space.
  *
  * The set universe is word `shingleLen`-grams (distinct, space-joined),
  * NOT unigrams: a natural-language corpus has a heavy-tailed but SMALL
  * unigram vocabulary (this repo's synthetic docs: 31 distinct words at
  * sf0.1), which makes every unigram common and the prefix filter
  * useless (measured 177M candidate pairs); shingling restores a large
  * sparse universe (27k 3-grams, 0.7M candidates — 240× fewer) and is
  * what production near-dup systems hash anyway.
  *
  * The filter: order every document's distinct shingles by GLOBAL
  * ascending document frequency (rarest first, ties broken by the
  * shingle string — a total order, no rank assignment needed). A pair
  * with Jaccard ≥ τ MUST share at least one shingle inside each side's
  * length-(n − ⌈τ·n⌉ + 1) prefix, and must satisfy
  * τ·max(na,nb) ≤ min(na,nb). Candidates come from an equi-join on
  * prefix shingles only — prefixes hold the RAREST shingles, so the
  * join-key skew is self-limiting — then verified exactly with one
  * `array_intersect` over the two full shingle arrays.
  *
  * τ is taken as integer percent `tauPct` so every threshold test is
  * integer arithmetic, bit-identical on any engine:
  * J(a,b) ≥ τ  ⇔  inter·(100 + t) ≥ t·(na + nb).
  *
  * Returns (doc_a, doc_b, inter, n_union, jac) with doc_a < doc_b,
  * jac rounded to 6 dp (always > 0 — no zero-sign hazard). Documents
  * with fewer than `shingleLen` tokens have no shingles and are dropped.
  *
  * Scale: one shingle explode + one df aggregate + one shuffle join to
  * attach dfs + one per-doc collapse; the candidate join shuffles on
  * prefix shingles (rare by construction); the verify is a pair-keyed
  * join back to the two shingle arrays. No all-pairs anywhere: the
  * quadratic term is Σ_prefix-shingle df², the quantity prefix filtering
  * is designed to keep near-linear at high τ.
  */
object SetSim {

  def jaccardSelfJoin(df: DataFrame, idCol: String, textCol: String,
                      tauPct: Int, shingleLen: Int = 3): DataFrame = {
    require(tauPct >= 1 && tauPct <= 100, "tauPct must be in [1, 100]")
    require(shingleLen >= 1, "shingleLen must be positive")
    val t = tauPct
    // shingles via the MAP-ONLY native generator (one pass per row), NOT
    // a transform() lambda over element_at(tokens(text), i) — interpreted
    // HOFs re-evaluate the token split per element, O(tokens²) regex work
    // (measured 12.7 s of a 26 s run at sf0.1) — and NOT the earlier
    // posexplode + lead() windows, which paid a corpus-wide shuffle+sort
    // on doc_id just to reassemble adjacent words (the exact shape
    // NGramsGenerator's scaladoc names as what it replaces). Same
    // normalization, byte-identical shingles, zero shuffles here.
    val toks = Spread.toCores(df) // shingle Generate: never pin to 1 core
      .filter(!Packing.isBlank(col(textCol)))
      .select(col(idCol).as("_id"),
        graft.functions.NGramsGenerator.ngrams(col(textCol), shingleLen))
      .withColumnRenamed("shingle", "_tok")
      .distinct()
    val dfreq = toks.groupBy(col("_tok")).agg(count(lit(1)).as("_df"))
    // per doc: distinct shingles sorted by (df, shingle) ascending — the
    // global rarest-first total order the prefix theorem needs
    val docs = toks.join(dfreq, "_tok")
      .groupBy(col("_id"))
      .agg(
        transform(
          array_sort(collect_list(struct(col("_df"), col("_tok")))),
          s => s.getField("_tok")).as("_arr"),
        count(lit(1)).as("_n"))
      .materialized // reused by prefix explode AND the verify join
    // prefix length p = n − ⌈t·n/100⌉ + 1 (integer ceiling division)
    val pref = docs
      .withColumn("_p", col("_n") - expr(s"(_n * $t + 99) DIV 100") + lit(1L))
      .select(col("_id"), col("_n"),
        explode(slice(col("_arr"), lit(1), col("_p").cast("int"))).as("_ptok"))
    val a = pref.select(col("_ptok"), col("_id").as("doc_a"), col("_n").as("_na"))
    val b = pref.select(col("_ptok"), col("_id").as("doc_b"), col("_n").as("_nb"))
    // pinned-count repartition before the verify: the intersect stage's
    // cost is CPU per pair, not bytes, and AQE's byte-based coalescing
    // collapses the tiny pair rows onto 1-2 tasks (measured: verify
    // 4.3 s → 1.7 s at sf0.1 on 32 cores). An explicit count disables
    // the coalesce; the session's shuffle-partition setting keeps it
    // cluster-appropriate. Cost ∝ candidate pairs — never the corpus.
    // numShufflePartitions resolves non-numeric settings (e.g. "auto" on
    // managed platforms) where a raw conf .toInt would throw
    val nPart = df.sparkSession.sessionState.conf.numShufflePartitions
    val cand = a.join(b, "_ptok")
      .filter(col("doc_a") < col("doc_b") &&
        lit(t) * greatest(col("_na"), col("_nb")) <=
          lit(100) * least(col("_na"), col("_nb")))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
      .repartition(nPart, col("doc_a"))
    val inter = size(array_intersect(col("_aa"), col("_ab"))).cast("long")
    cand
      .join(docs.select(col("_id").as("doc_a"), col("_arr").as("_aa"),
        col("_n").as("_na")), "doc_a")
      .join(docs.select(col("_id").as("doc_b"), col("_arr").as("_ab"),
        col("_n").as("_nb")), "doc_b")
      .withColumn("inter", inter)
      .withColumn("n_union", col("_na") + col("_nb") - col("inter"))
      // integer-exact threshold: inter/(na+nb−inter) ≥ t/100
      .filter(col("inter") * (100 + t) >= lit(t.toLong) * (col("_na") + col("_nb")))
      .select(col("doc_a"), col("doc_b"), col("inter"), col("n_union"),
        round(col("inter").cast("double") / col("n_union").cast("double"), 6)
          .as("jac"))
  }
}
