package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Html
import graft.plans.TableStore

/** Continuous host-graph maintenance — the streaming twin of
  * [[Html.linkEdges]]: a stream of fetched pages (doc_id, src_host, html)
  * is, per micro-batch, href-extracted and folded to per-DOCUMENT edge
  * contributions ([[Html.linkEdgesByDoc]]), which MERGE into a registry
  * keyed (src_domain, dst_domain, doc_id). The cumulative graph is the
  * fold of the registry ([[readEdges]]), byte-identical to running the
  * batch operator over everything seen so far.
  *
  * Exactly-once by CONTENT, not by batch-id watermark (the
  * [[StreamingParagraphDedup]] lesson): a document's edge contribution is
  * a deterministic function of its bytes, so the keyed MERGE absorbs
  * crash replays, fresh-checkpoint re-deliveries with DIFFERENT batch
  * slicing, and re-crawls of the same doc_id (last-write-wins refreshes
  * the row — the re-crawl is the new truth for that page).
  *
  * Scale: the per-batch work is the batch operator's map+agg shape on
  * batch bytes only; the registry grows with distinct (edge, doc) pairs —
  * the same order as the crawl's total link count, i.e. proportional to
  * the corpus like every ownership registry here; the store's vacuum
  * bounds dead versions. [[readEdges]] is one partial-aggregated fold at
  * read time, domain-graph output cardinality. */
object StreamingLinkGraph {

  /** Start draining `pages` (a streaming DataFrame with doc_id /
    * src_host / html columns) into the `edgesTable` registry.
    * AvailableNow by default; pass ProcessingTime for a resident query. */
  def start(pages: DataFrame, store: TableStore, edgesTable: String,
            checkpointDir: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    require(pages.isStreaming, "pages must be a streaming DataFrame")
    pages.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // per-batch block sweep: see BlockSweep's contract
        BlockSweep.swept(batch.sparkSession.sparkContext) {
          val slice = Html.linkEdgesByDoc(batch)
          if (!slice.isEmpty)
            store.mergeFact(edgesTable, slice,
              Seq("src_domain", "dst_domain", "doc_id"))
          ()
        }
      }
      .start()
  }

  /** The cumulative host graph: (src_domain, dst_domain, n_links,
    * n_docs) — the exact [[Html.linkEdges]] readout over everything the
    * stream has absorbed. */
  def readEdges(store: TableStore, edgesTable: String): DataFrame =
    store.read(edgesTable)
      .groupBy(col("src_domain"), col("dst_domain"))
      .agg(sum(col("n_links")).as("n_links"),
        count(lit(1)).as("n_docs"))
}
