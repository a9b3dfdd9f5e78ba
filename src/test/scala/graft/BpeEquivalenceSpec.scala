package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.DataFrame

/** The r18 optimization contract for the BPE trainer: the compiled
  * merge-application form ([[graft.functions.BpeSymbols]] behind
  * `bpeTrain`) must be BIT-IDENTICAL to the per-round windowed
  * gaps-and-islands rewrite it replaced (`bpeTrainRounds`, kept as the
  * reference) — same merge table (round, left, right, pair_count) and
  * same final symbol table (w, freq, pos, sym) — on run-heavy corpora
  * (where the leftmost-nonoverlapping even-offset rule decides), unicode
  * (multi-byte + supplementary code points), tie-heavy pair counts, and
  * early-stop (fully merged) corpora. A drift here would silently change
  * two oracle-checked catalog rows (q154/q155). */
class BpeEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  private def tableRows(df: DataFrame): List[(Long, String, String, Long)] =
    df.collect().map(r => (r.getAs[Long]("round"), r.getAs[String]("left"),
      r.getAs[String]("right"), r.getAs[Long]("pair_count")))
      .toList.sortBy(_._1)

  private def symRows(df: DataFrame): Set[(String, Long, Int, String)] =
    df.collect().map(r => (r.getAs[String]("w"), r.getAs[Long]("freq"),
      r.getAs[Int]("pos"), r.getAs[String]("sym"))).toSet

  private def assertSame(docs: DataFrame, rounds: Int): Unit = {
    // checkpoint = true: the rounds form's kept lineage grows a deep
    // window-over-window plan whose ANALYSIS dominated this suite
    // (~65 s at rounds 4-5, measured r18); equivalence is about values,
    // and the checkpointing path is the shipped one anyway
    val (tF, sF) = TextAnalysis.bpeTrain(docs, rounds, "text")
    val (tR, sR) = TextAnalysis.bpeTrainRounds(docs, rounds, "text")
    assert(tableRows(tF) === tableRows(tR), "merge tables must be bit-identical")
    assert(symRows(sF) === symRows(sR), "symbol tables must be bit-identical")
    assert(tF.schema.map(f => (f.name, f.dataType)) ===
      tR.schema.map(f => (f.name, f.dataType)), "table schema must match")
  }

  test("stock Sennrich corpus: compiled merges == windowed rewrite") {
    assertSame(Seq(
      (1L, "low low low low low lower lower"),
      (2L, "newest newest newest newest newest newest"),
      (3L, "widest widest widest")
    ).toDF("doc_id", "text"), rounds = 4)
  }

  test("equal-symbol runs: even-offset rule decides identically") {
    // aaaa/aaaaa/aaaaaa force the l==r chain rule every round: the merge
    // (a,a) must apply at even offsets within each run in BOTH forms,
    // and the post-merge runs of "aa" re-chain in later rounds
    assertSame(Seq(
      (1L, "aaaa aaaaa aaaaaa a aa aaa"),
      (2L, "aaaaaaa aaaaaaaa aaaa aaaa"),
      (3L, "baab abba aabbaa bbaabb")
    ).toDF("doc_id", "text"), rounds = 5)
  }

  test("unicode corpus (multi-byte + supplementary code points)") {
    // é = 2 UTF-8 bytes / 1 code point; 𝄞 (U+1D11E) = surrogate pair in
    // UTF-16 / 1 code point — the initial symbol split must match the
    // relational substring(w, pos, 1) code-point semantics, and the
    // (count, left, right) argmax must order merged strings identically
    assertSame(Seq(
      (1L, "café café café naïve naïve"),
      (2L, "𝄞𝄞note 𝄞𝄞note note𝄞𝄞 𝄞𝄞𝄞𝄞"),
      (3L, "ααββ ααββ βααβ")
    ).toDF("doc_id", "text"), rounds = 4)
  }

  test("tie-heavy pair counts: (count desc, left, right) breaks identically") {
    // every bigram appears the same number of times — the lexicographic
    // tie-break picks the winner in both forms
    assertSame(Seq(
      (1L, "ab cd ef gh"),
      (2L, "ba dc fe hg"),
      (3L, "xy xy zw zw")
    ).toDF("doc_id", "text"), rounds = 3)
  }

  test("early stop: a fully-merged corpus truncates the table in both") {
    // single repeated 2-char word: round 1 merges (a,b), round 2 (ab,</w>),
    // round 3 finds no pairs — later rounds must be no-ops, not wipes
    assertSame(Seq((1L, "ab ab ab")).toDF("doc_id", "text"), rounds = 6)
  }

  test("job-count evidence: the compiled trainer collapses the per-round stage groups") {
    // the r17 verdict asked stage-collapse claims to show the TRAINING
    // DAG, not just readout plans (which hide behind checkpoints): count
    // scheduler jobs for a full train + readout under both forms. The
    // round form pays, per round, a checkpoint of the winner, an isEmpty
    // probe and a checkpoint of the rewritten symbol table (plus window
    // stages inside each); the compiled form pays ONE aggregate job per
    // round. Assert a strict improvement with headroom, not an exact
    // count (AQE may add or merge jobs across Spark versions).
    val docs = Seq((1L, "low low lower newest newest widest"),
      (2L, "aaaa aaaaa low newest widest aaaa")).toDF("doc_id", "text")
    def jobs(body: => Unit): Int = {
      val n = new java.util.concurrent.atomic.AtomicInteger
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          n.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(l)
      try { body; Thread.sleep(800) } // listener bus posts async
      finally spark.sparkContext.removeSparkListener(l)
      n.get()
    }
    def force(t: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)): Unit = {
      t._1.collect(); t._2.collect()
    }
    val newJobs = jobs(force(TextAnalysis.bpeTrain(docs, 4, "text")))
    val oldJobs = jobs(force(TextAnalysis.bpeTrainRounds(docs, 4, "text")))
    info(s"training jobs: compiled=$newJobs rounds-form=$oldJobs")
    assert(newJobs * 2 <= oldJobs,
      s"compiled trainer should need well under half the jobs: new=$newJobs old=$oldJobs")
  }

  test("degenerate corpora: empty, null text, empty-token word") {
    assertSame(Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text"), rounds = 2)
    // whitespace-only text: tokens() yields the empty word, whose only
    // symbol is </w> — both forms must carry it without pairs
    assertSame(Seq((1L, "   "), (2L, "x y")).toDF("doc_id", "text"), rounds = 2)
  }
}
