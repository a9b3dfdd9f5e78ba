package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.Materialize.MaterializeOps
import graft.operators.Html
import graft.plans.TableStore

/** Continuous host-graph maintenance — the streaming twin of
  * [[Html.linkEdges]]: a stream of fetched pages (doc_id, src_host, html)
  * is, per micro-batch, href-extracted and folded to per-DOCUMENT edge
  * contributions ([[Html.linkEdgesByDoc]]), which MERGE into a registry
  * keyed (src_domain, dst_domain, doc_id, content_fp) — insert-only per
  * content generation. The cumulative graph is the
  * fold of the registry ([[readEdges]]), byte-identical to running the
  * batch operator over every document's LATEST content.
  *
  * Ownership is by CONTENT FINGERPRINT (the r14 ADVICE fix): merges
  * cannot delete rows by omission, so a re-crawl whose content DROPPED a
  * link (or changed src_host) would leave the doc's stale (src, dst, doc)
  * rows in the registry forever. Instead, every edge row carries the
  * md5 of the html it came from, and a tiny per-doc registry
  * (`docsTable`, keyed doc_id, last-write-wins) records each doc's
  * CURRENT fingerprint. [[readEdges]] folds only edge rows whose
  * fingerprint matches their doc's current one — a changed re-crawl
  * flips the doc row and every stale edge row goes dark at once, no
  * tombstones, no watermark. Byte-identical re-deliveries (crash
  * replays, fresh-checkpoint re-slicing) merge onto themselves exactly
  * as before. Dark rows are storage, not truth; [[compact]] rewrites
  * the registry to live rows when their fraction warrants it.
  *
  * Scale: the per-batch work is the batch operator's map+agg shape on
  * batch bytes only plus one doc-cardinality merge; the registry grows
  * with distinct (edge, doc, content) triples — proportional to the
  * crawl like every ownership registry here, with [[compact]] + the
  * store's vacuum bounding dead weight. [[readEdges]] is one
  * (doc_id, fp)-keyed equi-join and a partial-aggregated fold at read
  * time, domain-graph output cardinality.
  *
  * PageRank policy — RECOMPUTE ON EPOCH, not incremental maintenance:
  * the PR prior (q264/q267) is `Dedup.pageRankDirected` over
  * [[readEdges]], a deterministic decimal-exact function of the settled
  * fold, so the streaming readout is bit-identical to the batch walk on
  * the same corpus state and replay-stable by construction
  * (StreamingLinkGraphSpec proves both). The damped walk runs on
  * DOMAIN-graph cardinality — domains, not documents, at any corpus
  * size — so recomputation per scheduling epoch costs the same 8
  * bounded iterations whether one page or a billion changed;
  * incremental damped-walk maintenance (which approximates and drifts)
  * buys nothing at this cardinality and is deliberately not done. */
object StreamingLinkGraph {

  private def fingerprinted(batch: DataFrame): DataFrame =
    batch.select(col("doc_id"), col("src_host"), col("html"),
        md5(coalesce(col("html"), lit(""))).as("content_fp"))
      // a NULL doc_id can't be re-crawl-tracked (no identity to own rows)
      .filter(col("doc_id").isNotNull)
      // one winner per doc WITHIN a batch: two different bodies for one
      // doc_id in one slice are ambiguous — max fingerprint wins, a
      // deterministic order-free tie-break (re-slicing can't flip it
      // unless it also splits the pair across batches, where the later
      // batch wins like any re-crawl)
      .groupBy(col("doc_id"))
      .agg(max_by(struct(col("src_host"), col("html"), col("content_fp")),
        col("content_fp")).as("_w"))
      .select(col("doc_id"), col("_w.src_host").as("src_host"),
        col("_w.html").as("html"), col("_w.content_fp").as("content_fp"))

  /** Start draining `pages` (a streaming DataFrame with doc_id /
    * src_host / html columns) into the `edgesTable` registry, with the
    * per-doc current-fingerprint registry in `docsTable`.
    * AvailableNow by default; pass ProcessingTime for a resident query. */
  def start(pages: DataFrame, store: TableStore, edgesTable: String,
            docsTable: String, checkpointDir: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    require(pages.isStreaming, "pages must be a streaming DataFrame")
    pages.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // per-batch block sweep: see BlockSweep's contract
        BlockSweep.swept(batch.sparkSession.sparkContext) {
          val w = fingerprinted(batch)
            .materialized // read by the edge slice AND the doc merge
          if (!w.isEmpty) {
            val slice = Html.linkEdgesByDoc(w)
              .join(w.select(col("doc_id"), col("content_fp")), Seq("doc_id"))
            // edges BEFORE docs, and content_fp IS part of the merge key
            // (the r15 ADVICE fix): edge rows are insert-only per content
            // generation — an edge present in both the old and new html
            // lands as a NEW row under the new fp instead of overwriting
            // the old generation's row. A crash between the two merges
            // (or a concurrent readEdges mid-batch) therefore sees the
            // OLD generation complete — never a doc whose common edges
            // went dark while its doc row still points at the old fp.
            // Replay/doc-merge flips visibility per doc atomically;
            // compact() reclaims the superseded generation's rows.
            if (!slice.isEmpty)
              store.mergeFact(edgesTable, slice,
                Seq("src_domain", "dst_domain", "doc_id", "content_fp"))
            store.mergeFact(docsTable,
              w.select(col("doc_id"), col("content_fp")), Seq("doc_id"))
          }
          ()
        }
      }
      .start()
  }

  /** The cumulative host graph: (src_domain, dst_domain, n_links,
    * n_docs) — the exact [[Html.linkEdges]] readout over every
    * document's LATEST absorbed content (stale re-crawl rows excluded
    * by the fingerprint join). */
  def readEdges(store: TableStore, edgesTable: String,
                docsTable: String): DataFrame =
    store.read(edgesTable)
      .join(store.read(docsTable), Seq("doc_id", "content_fp"))
      .groupBy(col("src_domain"), col("dst_domain"))
      .agg(sum(col("n_links")).as("n_links"),
        count(lit(1)).as("n_docs"))

  /** Rewrite the edge registry down to LIVE rows (current-fingerprint
    * matches) — the maintenance pass that reclaims the dark rows
    * re-crawls leave behind. Atomic (replaceTable); serialize against a
    * running [[start]] query on the same tables.
    *
    * Bound, stated exactly (revised for the r16 insert-only-generation
    * merge key): between successful compact() runs, dark residue grows
    * by ONE superseded generation's edge rows PER re-crawl — the
    * insert-only key that makes the crash window read-consistent also
    * means generations accumulate instead of overwriting in place, so
    * compaction cadence, not the merge, is what bounds storage. When
    * ZERO edge rows are live — every doc's latest re-crawl dropped all
    * its links — the store's non-empty replaceTable contract forces a
    * skip and everything since the last successful compact stays dark
    * until the next batch lands a live row (readEdges stays correct —
    * empty — throughout). */
  def compact(store: TableStore, edgesTable: String,
              docsTable: String): Unit = {
    val live = store.read(edgesTable)
      .join(store.read(docsTable), Seq("doc_id", "content_fp"))
      // the merge slice's column order, so the rewrite round-trips
      .select(col("doc_id"), col("src_domain"), col("dst_domain"),
        col("n_links"), col("content_fp"))
      .materialized // snapshot BEFORE the swap reads it back
    if (!live.isEmpty)
      store.replaceTable(edgesTable, live,
        Seq("src_domain", "dst_domain", "doc_id", "content_fp"))
  }
}
