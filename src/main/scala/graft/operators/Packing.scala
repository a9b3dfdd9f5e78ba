package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Materialize.MaterializeOps

/** Sequence packing + context chunking — the two layout transforms that
  * sit between a cleaned corpus and a training loader.
  *
  * [[packSequences]] is GPT-style concatenate-then-chunk: every
  * document's token stream laid end-to-end in ascending id order, the
  * stream cut into fixed `blockLen`-token training blocks; each document
  * reads back its global token offset and the block span it occupies
  * (reference has no packing surface — extension per the LLM-pipeline
  * mandate, like the sampling/dedup families).
  *
  * [[blockOccupancy]] inverts that map: per training block, how many
  * documents contribute, how many tokens land in it, and how many of its
  * documents straddle a block boundary — the "attention-mask pollution"
  * readout a packing policy is judged by.
  *
  * [[chunkDocuments]] is the RAG-side transform: per-document sliding
  * token windows of `window` tokens at `stride` (< window ⇒ overlap), the
  * standard retrieval-index chunking.
  *
  * All three are pure Column expressions over
  * [[TextAnalysis.tokens]]' ONE normalized token-stream definition, so
  * the DuckDB oracle replays them bit-for-bit.
  */
object Packing {

  /** Normalized token count with the empty-document guard:
    * [[TextAnalysis.tokens]] of an all-whitespace/NULL text yields [""]
    * (size 1), so blank docs are pinned to 0 tokens explicitly.
    * NOT the same as [[TextAnalysis.tokenCount]] (raw space-split size,
    * no normalization/guard — q69's legacy per-shard packer); new layout
    * code should use THIS one. */
  def tokenCount(text: Column): Column = nTok(text)

  /** True iff the text has NO non-whitespace character. `trim` (both
    * engines) strips only ASCII space, so a tab/newline-only doc would
    * pass a trim-based guard and leak phantom "" tokens into the layout
    * — strip the \s class instead. */
  private[operators] def isBlank(text: Column): Column =
    text.isNull || length(regexp_replace(text, "\\s", "")) === 0

  /** KNOWN BOUND, mirrored in every oracle: `tokens` trims only ASCII
    * spaces (both engines), so a doc with edge `\t`/`\n` keeps one
    * phantom "" token per side after the internal `\s+`→' ' collapse —
    * inflating n_tok by ≤ 2. The DuckDB replays share the identical
    * normalization, so every layout count stays engine-consistent; a
    * deployment wanting exact word counts normalizes edge whitespace
    * upstream (one regexp_replace) rather than forking the shared
    * tokenizer contract mid-catalog. */
  private def nTok(text: Column): Column =
    when(isBlank(text), lit(0L))
      .otherwise(size(TextAnalysis.tokens(text)).cast("long"))

  /** Concatenate-then-chunk packing map. Documents are laid out in
    * ascending `idCol` order; the token stream is cut into
    * `blockLen`-token blocks. Returns one row per document:
    * (`idCol`, `n_tok`, `tok_start`, `block_first`, `block_last`,
    * `crosses_block`) — block columns NULL for empty documents (they
    * occupy no span).
    *
    * Scale: the global running sum is NOT one global window (that
    * single-partitions the corpus) — it is the classic two-pass prefix
    * sum: (1) one aggregate of per-range token sums keyed by
    * id DIV `rangeWidth`; (2) an ordered cumulative over the TINY range
    * frame (one row per `rangeWidth` ids — control plane, the one
    * documented unpartitioned window here); (3) range offsets broadcast
    * back and a within-range cumulative window PARTITIONED by range.
    * Ids must be unique; gaps are fine (order, not density, defines the
    * layout). */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    blockLen: Int, rangeWidth: Long = 1L << 16): DataFrame =
    packCounts(df.select(col(idCol), nTok(col(textCol)).as("_ntok")),
      idCol, "_ntok", blockLen, rangeWidth)

  /** [[packSequences]]'s layout core over PRE-COMPUTED per-doc counts —
    * the entry point for layouts whose unit is not whitespace tokens
    * (subword pieces from [[TextAnalysis.unigramEncode]], BPE symbols,
    * sample frames): same two-pass prefix sum, same output shape
    * (`n_tok` is the count column regardless of its input name). */
  def packCounts(df: DataFrame, idCol: String, nTokCol: String,
                 blockLen: Int, rangeWidth: Long = 1L << 16): DataFrame = {
    require(blockLen >= 1, "blockLen must be positive")
    require(rangeWidth >= 2, "rangeWidth must be >= 2")
    val tf = df.select(col(idCol).as("_id"),
        col(nTokCol).cast("long").as("n_tok"))
      .withColumn("_rng", expr(s"_id DIV $rangeWidth"))
    val rsums = tf.groupBy(col("_rng")).agg(sum(col("n_tok")).as("_rsum"))
    // tiny control-plane frame (one row per rangeWidth ids): the ordered
    // cumulative here is the documented unpartitioned window
    val roff = rsums
      .withColumn("_roff", coalesce(
        sum(col("_rsum")).over(Window.orderBy(col("_rng"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("_rsum")
      .materialized
    val ww = Window.partitionBy(col("_rng")).orderBy(col("_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    tf.join(broadcast(roff), "_rng")
      .withColumn("tok_start",
        col("_roff") + coalesce(sum(col("n_tok")).over(ww), lit(0L)))
      .withColumn("block_first",
        when(col("n_tok") > 0, expr(s"tok_start DIV $blockLen")))
      .withColumn("block_last",
        when(col("n_tok") > 0, expr(s"(tok_start + n_tok - 1) DIV $blockLen")))
      .withColumn("crosses_block",
        when(col("n_tok") > 0, col("block_last") > col("block_first")))
      .select(col("_id").as(idCol), col("n_tok"), col("tok_start"),
        col("block_first"), col("block_last"), col("crosses_block"))
  }

  /** Per-block packing stats over [[packSequences]]' layout: one row per
    * `blockLen`-token block with `n_docs` (documents contributing ≥ 1
    * token), `n_tokens` (the block's fill — `blockLen` everywhere except
    * the final partial block), and `n_straddlers` (contributing documents
    * that also extend beyond this block on either side).
    *
    * Scale: each document explodes to its own span of blocks —
    * Σ (n_tok/blockLen + 1) rows ≈ corpus_tokens/blockLen + n_docs,
    * linear — then ONE (block) count aggregate. */
  def blockOccupancy(df: DataFrame, idCol: String, textCol: String,
                     blockLen: Int, rangeWidth: Long = 1L << 16): DataFrame = {
    val packed = packSequences(df, idCol, textCol, blockLen, rangeWidth)
      .filter(col("n_tok") > 0)
    val end = col("tok_start") + col("n_tok") // exclusive
    packed
      .select(col("n_tok"), col("tok_start"),
        explode(sequence(col("block_first"), col("block_last"))).as("block_id"))
      .withColumn("_contrib",
        least(end, (col("block_id") + 1) * blockLen) -
          greatest(col("tok_start"), col("block_id") * lit(blockLen.toLong)))
      .withColumn("_straddles",
        (col("tok_start") < col("block_id") * lit(blockLen.toLong)) ||
          (end > (col("block_id") + 1) * blockLen))
      .groupBy(col("block_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_contrib")).as("n_tokens"),
        sum(when(col("_straddles"), 1L).otherwise(0L)).as("n_straddlers"))
  }

  /** NO-SPLIT next-fit packing — the SFT-style layout where documents are
    * never cut across sequence boundaries: walk documents in ascending
    * `idCol` order, keep appending to the current `capacity`-token bin,
    * open a new bin when the next document does not fit. A document longer
    * than `capacity` sits alone in its own (overflowing) bin — next-fit
    * semantics, no truncation, flagged by `fill_before = 0 ∧ n_tok >
    * capacity` at the readout. Empty documents occupy no bin and are
    * dropped.
    *
    * The walk is a SEQUENTIAL recurrence (bin fill is not a prefix sum —
    * the reset-on-overflow makes it non-associative), so this is the one
    * operator family where `mapPartitions` is the right tool, per the
    * design hierarchy's clause (d): the recurrence runs independently per
    * `rangeWidth`-id range (each range STARTS A FRESH BIN — that is part
    * of the operator's definition, which makes the layout deterministic,
    * partition-count-independent, and embarrassingly parallel), and
    * global bin ids are assigned by prefix-summing per-range bin counts
    * over the tiny range frame (one row per rangeWidth ids — control
    * plane) exactly like [[packSequences]].
    *
    * Returns one row per non-empty document: (`idCol`, `n_tok`, `bin_id`,
    * `fill_before`) — `fill_before` the bin's token load before this
    * document was placed.
    *
    * Scale: one shuffle to co-locate ranges + an in-partition sorted walk
    * (O(docs) state O(1)), one tiny range aggregate, one broadcast join
    * back. 100 TB holds: ranges are independent, nothing is global. */
  def nextFitPack(df: DataFrame, idCol: String, textCol: String,
                  capacity: Long, rangeWidth: Long = 1L << 16): DataFrame = {
    require(capacity >= 1, "capacity must be positive")
    require(rangeWidth >= 2, "rangeWidth must be >= 2")
    val spark = df.sparkSession
    import spark.implicits._
    val tf = df.select(col(idCol).as("_id"), nTok(col(textCol)).as("_n"))
      .filter(col("_n") > 0)
      .withColumn("_rng", expr(s"_id DIV $rangeWidth"))
      .select(col("_rng"), col("_id"), col("_n"))
      .as[(Long, Long, Long)]
    // co-locate each range in one partition, walk ranges in sorted order;
    // state resets at every range change, so which ranges SHARE a
    // partition cannot affect the output
    val walked = tf
      .repartition(col("_rng"))
      .sortWithinPartitions(col("_rng"), col("_id"))
      .mapPartitions { it =>
        var curRng = Long.MinValue
        var fill = 0L
        var lbin = -1L
        it.map { case (rng, id, n) =>
          if (rng != curRng) { curRng = rng; fill = 0L; lbin = -1L }
          if (lbin < 0 || fill + n > capacity) { lbin += 1; fill = 0L }
          val before = fill
          fill += n
          (rng, id, n, lbin, before)
        }
      }
      .toDF("_rng", "_id", "_n", "_lbin", "fill_before")
      .materialized // walked twice (bin counts + readout)
    val roff = walked.groupBy(col("_rng"))
      .agg((max(col("_lbin")) + 1L).as("_nb"))
      // control-plane frame: one row per id RANGE (n_ids / rangeWidth),
      // not per id — the unpartitioned cumulative is O(ranges)
      .withColumn("_boff", coalesce(
        sum(col("_nb")).over(Window.orderBy(col("_rng"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("_nb")
    walked.join(broadcast(roff), "_rng")
      .select(col("_id").as(idCol), col("_n").as("n_tok"),
        (col("_boff") + col("_lbin")).as("bin_id"), col("fill_before"))
  }

  /** Context-window assembly: per `userCol`, keep the MOST RECENT rows
    * whose newest-first cumulative `costCol` stays within `budget` — the
    * "fit the latest turns into the model's context" truncation every
    * conversational/SFT loader runs. Rows are walked newest-first
    * (`tsCol` desc, `idCol` desc as the deterministic tie-break); because
    * costs are non-negative the cumulative is monotone, so "stop at the
    * first overflow" and "keep every prefix row with cum ≤ budget" are
    * the same rule, and the latter is one window + one filter.
    *
    * Returns the kept rows: (`userCol`, `idCol`, `costCol`, `cum_cost`,
    * `turns_back`) with `turns_back` = 0 for the newest kept row.
    *
    * Scale: ONE window partitioned by user (fans out), no join, no
    * state — a single shuffle on the user key. */
  def contextWindow(df: DataFrame, userCol: String, idCol: String,
                    tsCol: String, costCol: String, budget: Long): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    val order = Seq(col(tsCol).desc, col(idCol).desc)
    val wnd = Window.partitionBy(col(userCol)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rk = Window.partitionBy(col(userCol)).orderBy(order: _*)
    // a NULL cost coalesces to 0: sum().over skips NULLs, so a raw sum
    // would DROP the null-cost row while keeping OLDER rows — breaking
    // the "most recent rows" prefix property this operator is for
    val cost = coalesce(col(costCol).cast("long"), lit(0L))
    df.select(col(userCol), col(idCol), col(tsCol),
        cost.as("_cost"))
      .withColumn("cum_cost", sum(col("_cost")).over(wnd))
      .withColumn("turns_back", (row_number().over(rk) - 1).cast("long"))
      .filter(col("cum_cost") <= budget)
      .select(col(userCol), col(idCol), col("_cost").as(costCol),
        col("cum_cost"), col("turns_back"))
  }

  /** Balanced shard assignment: rows ranked by `weightCol` DESC (ties by
    * `idCol` ASC) and dealt onto `nShards` shards SERPENTINE (pass 0 left
    * to right, pass 1 right to left, …) — the deterministic longest-
    * processing-time-style heuristic that keeps per-shard weight sums
    * within one max-weight of each other, used to balance token counts
    * across training shards / workers.
    *
    * The global rank is NOT one unpartitioned window: per distinct
    * weight, a count aggregate; an ordered cumulative over the DISTINCT-
    * WEIGHT frame (control plane — token counts are bounded integers, so
    * this frame is small by construction: one row per distinct length);
    * offsets broadcast back; within-weight ranks via a window PARTITIONED
    * by weight. Identical to row_number() OVER (ORDER BY w DESC, id) — 1.
    *
    * Returns (`idCol`, `weightCol`, `shard`). */
  def balancedShards(df: DataFrame, idCol: String, weightCol: String,
                     nShards: Int): DataFrame = {
    require(nShards >= 1, "nShards must be positive")
    // weights compare as LONGs (token counts — the intended domain;
    // fractional weights rank by their truncation, ties by id). A NULL
    // weight is a real row that must land on exactly one shard, not
    // vanish through a null≠null join: it groups, joins (<=>) and ranks
    // (desc = nulls last) like any other weight.
    val w = df.select(col(idCol).as("_id"), col(weightCol).cast("long").as("_w"))
    val off = w.groupBy(col("_w")).agg(count(lit(1)).as("_c"))
      // control-plane frame: one row per DISTINCT weight value (token
      // counts — bounded by the context length, not by the corpus)
      .withColumn("_off", coalesce(
        sum(col("_c")).over(Window.orderBy(col("_w").desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("_c")
      .materialized
    val within = Window.partitionBy(col("_w")).orderBy(col("_id"))
    val rn = w.join(broadcast(off.withColumnRenamed("_w", "_w2")),
        col("_w") <=> col("_w2")).drop("_w2")
      .withColumn("_rn", col("_off") + row_number().over(within) - 1)
    val pos = pmod(col("_rn"), lit(nShards.toLong))
    val pass = expr(s"_rn DIV $nShards")
    rn.withColumn("shard",
        when(pmod(pass, lit(2L)) === 0L, pos).otherwise(lit(nShards - 1L) - pos))
      .select(col("_id").as(idCol), col("_w").as(weightCol), col("shard"))
  }

  /** Materialized training blocks — the actual loader output of
    * [[packSequences]]' layout: one row per `blockLen`-token block with
    * its full concatenated token text, assembled from each contributing
    * document's overlap slice in stream order. `n_tokens` = `blockLen`
    * everywhere except the final partial block.
    *
    * Scale: one id-keyed join of the packing map against the token
    * arrays, the bounded span explode (Σ rows ≈ corpus_tokens/blockLen +
    * n_docs), then ONE block-keyed aggregate; within a block the
    * contributing slices are disjoint, so sorting the collected
    * (tok_start, piece) structs is exact and per-block state is ≤
    * blockLen tokens. Linear in the corpus, shuffles ∝ corpus tokens. */
  def materializeBlocks(df: DataFrame, idCol: String, textCol: String,
                        blockLen: Int, rangeWidth: Long = 1L << 16): DataFrame = {
    val packed = packSequences(df, idCol, textCol, blockLen, rangeWidth)
      .filter(col("n_tok") > 0)
    val toksDf = df
      .filter(!isBlank(col(textCol)))
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("_toks"))
    val bstart = col("block_id") * blockLen
    val bend = bstart + blockLen
    val s = greatest(col("tok_start"), bstart)
    val e = least(col("tok_start") + col("n_tok"), bend)
    packed.join(toksDf, idCol)
      .select(col("_toks"), col("tok_start"), col("n_tok"),
        explode(sequence(col("block_first"), col("block_last"))).as("block_id"))
      .withColumn("_s", s)
      .withColumn("_len", e - s)
      .withColumn("_piece", array_join(
        slice(col("_toks"), (col("_s") - col("tok_start") + 1).cast("int"),
          col("_len").cast("int")), " "))
      .groupBy(col("block_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("_len")).as("n_tokens"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("_s").as("s"),
              col("_piece").as("p")))),
            x => x.getField("p")),
          " ").as("block_text"))
  }

  /** Sliding-window chunking: per document, token windows of `window`
    * tokens starting every `stride` tokens (stride < window ⇒ overlap,
    * the RAG default). The last window starts at the smallest multiple
    * of `stride` that still reaches the end — i.e. chunk indices
    * 0 .. ceil((n_tok − window)/stride) (0 alone when n_tok ≤ window) —
    * so every token is covered and no fully-redundant tail chunk is
    * emitted. Empty/NULL documents yield no chunks.
    *
    * Returns (`idCol`, `chunk_id`, `chunk_start`, `chunk_len`,
    * `chunk_text`). Map-only: one projection + one bounded explode
    * (Σ chunks ≈ corpus_tokens/stride), no shuffle at all. */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
                     window: Int, stride: Int): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      "need 1 <= stride <= window")
    // ONE tokenizer pass: _n derives from the staged array — nTok would
    // re-run the whole lower/trim/regexp/split per row, and its blank
    // guard is already enforced by the filter above
    val base = df
      .filter(!isBlank(col(textCol)))
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("_toks"))
      .select(col(idCol), col("_toks"), size(col("_toks")).cast("long").as("_n"))
    val lastChunk = when(col("_n") > window,
        expr(s"(_n - $window + $stride - 1) DIV $stride")).otherwise(lit(0L))
    base
      .select(col(idCol), col("_toks"), col("_n"),
        explode(sequence(lit(0L), lastChunk)).as("chunk_id"))
      .withColumn("chunk_start", col("chunk_id") * stride)
      .withColumn("chunk_len", least(lit(window.toLong), col("_n") - col("chunk_start")))
      .withColumn("chunk_text",
        array_join(slice(col("_toks"), (col("chunk_start") + 1).cast("int"),
          col("chunk_len").cast("int")), " "))
      .select(col(idCol), col("chunk_id"), col("chunk_start"),
        col("chunk_len"), col("chunk_text"))
  }
}
