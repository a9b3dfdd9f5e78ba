package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}
import graft.functions.VectorFunctions

/** Training-data-pipeline operators: dedup family, vector math (native
  * DotProduct expression), text analysis, multimodal plumbing. */
class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat"), // near dup of 1
    (4L, "completely different text about spark engines and data")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical normalized text") {
    val out = Dedup.exact(docs).collect()
      .map(r => (r.getAs[Long]("keep_id"), r.getAs[Long]("n_dups"))).sortBy(_._1)
    assert(out.toSeq === Seq((1L, 2L), (3L, 1L), (4L, 1L)))
  }

  test("NFC fingerprint collapses composed/decomposed unicode; plain fingerprint splits them") {
    val composed = "café au lait"          // é as U+00E9
    val decomposed = "café au lait"       // e + combining acute
    val d = Seq((1L, composed), (2L, decomposed), (3L, "cafe au lait"))
      .toDF("doc_id", "text")
    val nfc = Dedup.exactBy(d, TextAnalysis.fingerprintNfc(col("text"))).collect()
      .map(r => (r.getAs[Long]("keep_id"), r.getAs[Long]("n_dups"))).sortBy(_._1)
    assert(nfc.toSeq === Seq((1L, 2L), (3L, 1L)),
      "NFC: composed and decomposed encodings are ONE duplicate class")
    val plain = Dedup.exact(d).collect()
    assert(plain.length === 3, "plain fingerprint splits the encodings (the failure NFC fixes)")
    // the expression must stay inside whole-stage codegen (no fallback);
    // check over a parquet scan — a LocalRelation plan skips codegen anyway
    val p = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(graft.functions.NfcNormalize.nfc(col("text")).as("n"))
      .queryExecution.executedPlan
    assert(p.toString.contains("WholeStageCodegen") || p.toString.contains("*("),
      s"nfc_normalize must codegen:\n$p")
    val hasFallback = p.expressions.exists(_.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback]))
    assert(!hasFallback, "NfcNormalize must implement doGenCode, not CodegenFallback")
  }

  test("shinglePairs produces size-n word windows, distinct per doc") {
    val sh = Dedup.shinglePairs(docs.filter(col("doc_id") === 1), 3)
      .collect().map(_.getAs[String]("shingle")).sorted
    assert(sh.length === 7) // 9 words -> 7 trigrams (all distinct here)
    assert(sh.contains("the quick brown") && sh.contains("the lazy dog"))
  }

  test("heavyHitters output is EXACT: equals naive groupBy over the threshold") {
    // power-law-ish stream: item i appears ~1000/i times; k=10 → exact
    // answer is every item with cnt*10 > N. MG must never miss one
    // (guarantee) and the recount must never over-report (exactness).
    val items = (1 to 60).flatMap(i => Seq.fill(1000 / i)(s"item_$i"))
    val df = spark.sparkContext.parallelize(scala.util.Random.shuffle(items), 7)
      .toDF("item")
    val n = items.size.toLong
    val expected = items.groupBy(identity).map { case (it, xs) => (it, xs.size.toLong) }
      .filter(_._2 * 10 > n).toMap
    val got = graft.operators.HeavyHitters.heavyHitters(df, "item", 10)
      .collect().map(r => r.getAs[String]("item") -> r.getAs[Long]("cnt")).toMap
    assert(got === expected)
  }

  test("mgSummary keeps every item above the 1/k frequency guarantee") {
    val xs = Seq.fill(400)("hot") ++ (1 to 900).map(i => s"cold_$i")
    val out = graft.operators.HeavyHitters.mgSummary(8, xs.iterator).toSet
    assert(out.contains("hot")) // 400/1300 > 1/8 — must survive any order
  }

  test("blocklistGate: case-folded set membership, counts, NULL-text excluded") {
    val d = Seq(
      (1L, "The SLOW fox and the slow dog"), // 'slow' twice (case-folded), 'the' not listed
      (2L, "clean text only"),
      (3L, null.asInstanceOf[String]),
      (4L, "assault is not ass plus fault")) // substring must NOT match
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .blocklistGate(d, Seq("Slow", "ass", "missing"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size === 3, "NULL text excluded")
    assert(out(1L).getAs[Long]("n_blocked") === 2L)
    assert(out(1L).getAs[Long]("n_blocked_distinct") === 1L)
    assert(out(1L).getAs[Long]("blocked") === 1L)
    assert(out(2L).getAs[Long]("blocked") === 0L)
    assert(out(4L).getAs[Long]("n_blocked") === 1L,
      "whole-token 'ass' hits once; 'assault' must not (set membership, not substring)")
  }

  test("gopherFilter verdicts: word bounds, mean length, stopwords") {
    val d = Seq(
      (1L, ("the quick brown fox and a dog " * 6).trim),     // passes all
      (2L, "short text"),                                    // too few words
      (3L, (("a " * 40) + "the end").trim)                   // mean word len < 2
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.gopherFilter(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("ok_words"), r.getAs[Boolean]("ok_mean_len"),
          r.getAs[Boolean]("pass"))).toMap
    assert(out(1L) === ((true, true, true)))
    assert(out(2L)._1 === false && out(2L)._3 === false)
    assert(out(3L)._2 === false && out(3L)._3 === false)
  }

  test("packSequences: pack ids are contiguous per shard, offsets wrap at capacity") {
    val d = (1L to 10L).map(i => (i, "s0", ("w " * 100).trim))
      .toDF("doc_id", "source", "text") // 100 tokens each, capacity 256
    val out = graft.operators.TextAnalysis.packSequences(d, 256).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pack_id"), r.getAs[Long]("pack_offset")))
      .sortBy(_._1)
    // doc i starts at (i-1)*100: packs 0,0,0(+overflow),1,1,...
    for ((id, pack, off) <- out) {
      val before = (id - 1) * 100
      assert(pack === before / 256, s"doc $id")
      assert(off === before % 256, s"doc $id")
    }
  }

  test("boilerplateStats counts high-df shingles per doc") {
    val common = "alpha beta gamma delta epsilon"
    val docs = (1L to 5L).map(i => (i, s"$common unique_$i words here now end"))
      .toDF("doc_id", "text")
    // 'alpha beta gamma delta epsilon' appears in all 5 docs; minDf=5
    val out = graft.operators.Dedup.boilerplateStats(docs, 5, 5).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_boiler"))).toMap
    assert(out.keySet === (1L to 5L).toSet)
    assert(out.values.forall(_ === 1L), s"exactly the shared 5-gram is boilerplate: $out")
  }

  test("Scd2.history collapses runs and closes intervals at the next change") {
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2021-01-01 00:$m%02d:00")
    val ev = Seq(
      (1L, ts(1), 10L, "view"), (2L, ts(2), 10L, "view"), (3L, ts(3), 10L, "purchase"),
      (4L, ts(4), 10L, "view"), (5L, ts(1), 20L, "signup")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = graft.plans.Scd2.history(ev, "user_id", "event_type", "ts", "event_id")
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[String]("state"),
        r.getAs[Long]("version"), r.getAs[Boolean]("is_current"),
        Option(r.getAs[java.sql.Timestamp]("effective_to")))).sortBy(x => (x._1, x._3))
    assert(out === Seq(
      (10L, "view", 1L, false, Some(ts(3))),
      (10L, "purchase", 2L, false, Some(ts(4))),
      (10L, "view", 3L, true, None),
      (20L, "signup", 1L, true, None)))
  }

  test("decontaminate flags docs sharing an n-gram with the benchmark set") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "prefix words alpha beta gamma delta epsilon zeta suffix"), // contains bench 6-gram
      (2L, "totally unrelated content with no overlap at all here")
    ).toDF("doc_id", "text")
    val out = graft.operators.Dedup.decontaminate(corpus, bench, 6).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_contaminated")).toMap
    assert(out === Map(1L -> 1L), s"only doc 1 shares the 6-gram: $out")
  }

  test("repetitionStats counts occurrences (not distinct) and flags heavy repeats") {
    val d = Seq(
      (1L, "spam ham " * 20 + "end"),            // 'spam ham' dominates
      (2L, (1 to 40).map(i => s"w$i").mkString(" "))  // all 2-grams unique
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.repetitionStats(d, 2).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("max_gram"), r.getAs[Boolean]("repetitive")))
      .toMap
    assert(out(1L)._2 === 20L && out(1L)._3 === true, s"doc 1: ${out(1L)}")
    assert(out(2L)._2 === 1L && out(2L)._3 === false)
  }

  test("connectedComponents labels every node with the min reachable id") {
    // chain 1-2-3 plus 2-4 (star), disjoint pair 10-11: min-label
    // propagation must cross multiple hops, not just direct neighbors
    val edges = Seq((2L, 3L), (1L, 2L), (2L, 4L), (10L, 11L)).toDF("doc_a", "doc_b")
    val out = Dedup.connectedComponents(edges).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents converges on a long chain (multi-round fixpoint)") {
    val edges = (1L until 12L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val out = Dedup.connectedComponents(edges).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(out === (1L to 12L).map(_ -> 1L).toMap)
  }

  test("connectedComponentsMinLabel raises (never silently mislabels) past maxRounds") {
    val chain = (1L until 8L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val e = intercept[IllegalStateException](
      Dedup.connectedComponentsMinLabel(chain, maxRounds = 2).collect())
    assert(e.getMessage.contains("did not converge"))
  }

  test("connectedComponents converges on a 300-chain where min-label's " +
    "50-round default would throw (hybrid escalates to star)") {
    // diameter 299: min-label needs 299 rounds; large-star/small-star
    // halves distances every round and must finish in O(log n)
    val chain = (1L until 300L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    intercept[IllegalStateException](
      Dedup.connectedComponentsMinLabel(chain).collect())
    val out = Dedup.connectedComponents(chain).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(out === (1L to 300L).map(_ -> 1L).toMap)
  }

  test("connectedComponents property: hybrid and star match union-find on random graphs") {
    // deterministic seeded random graphs vs an in-memory union-find —
    // independent of ANY of the three distributed implementations
    def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      nodes.map(x => x -> find(x)).toMap
    }
    val rnd = new scala.util.Random(123)
    (1 to 3).foreach { trial =>
      val nNodes = 30 + rnd.nextInt(60)
      val nEdges = nNodes / 2 + rnd.nextInt(2 * nNodes)
      val edges = (1 to nEdges).map(_ =>
        (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong))
      val expected = unionFind(nNodes, edges)
      val df = edges.toDF("doc_a", "doc_b")
      def got(r: org.apache.spark.sql.DataFrame) = r.collect()
        .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("cluster_id")).toMap
      assert(got(Dedup.connectedComponents(df)) === expected,
        s"hybrid disagrees with union-find on trial $trial")
      assert(got(Dedup.connectedComponentsStar(df)) === expected,
        s"star disagrees with union-find on trial $trial")
    }
  }

  test("connectedComponents hybrid ≡ star ≡ min-label on a mixed random graph") {
    val rnd = new scala.util.Random(7)
    // 3 planted components over ids 0..149 (mod-3 classes), random extra
    // intra-component edges, some self-loops and duplicate edges
    val edges = ((0L until 147L).map(i => (i, i + 3)) ++
      (1 to 60).map { _ =>
        val c = rnd.nextInt(3); val a = rnd.nextInt(50) * 3 + c
        val b = rnd.nextInt(50) * 3 + c; (a.toLong, b.toLong)
      } ++ Seq((9L, 9L), (0L, 3L), (3L, 0L))).toDF("doc_a", "doc_b")
    def toMapOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    val hybrid = toMapOf(Dedup.connectedComponents(edges))
    val star = toMapOf(Dedup.connectedComponentsStar(edges))
    val minl = toMapOf(Dedup.connectedComponentsMinLabel(edges))
    assert(hybrid === minl)
    assert(star === minl)
    assert(hybrid === (0L until 150L).map(i => i -> (i % 3)).toMap)
  }

  test("heavyHitters ignores NULL items (counts and threshold exclude them)") {
    val df = (Seq.fill(30)(Some("hot")) ++ Seq.fill(60)(Option.empty[String]) ++
      (1 to 10).map(i => Some(s"cold_$i"))).toDF("item")
    val got = graft.operators.HeavyHitters.heavyHitters(df, "item", 3)
      .collect().map(r => r.getAs[String]("item") -> r.getAs[Long]("cnt")).toMap
    // non-null N = 40; hot: 30*3 > 40 → in; nulls must neither appear nor
    // inflate N (with nulls counted, N=100 and hot would fail 30*3 > 100)
    assert(got === Map("hot" -> 30L))
  }

  test("jaccardPairs and minhashLsh both surface the planted near-dup pair") {
    val j = Dedup.jaccardPairs(docs, 2, 0.5).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(j.contains((1L, 2L)) && j.contains((1L, 3L)) && j.contains((2L, 3L)))
    assert(!j.exists(p => p._1 == 4L || p._2 == 4L))

    val lsh = Dedup.minhashLsh(docs, 2, 12, 4, 0.5).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(lsh.contains((1L, 2L)), "exact dup must always share all bands")
    assert(!lsh.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("dedupCorpus keeps the smallest id per duplicate cluster, drops the rest") {
    val kept = Dedup.dedupCorpus(docs, n = 2, k = 12, bands = 4, threshold = 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(kept.contains(1L), "cluster representative (smallest id) survives")
    assert(kept.contains(4L), "unrelated doc survives")
    assert(!kept.contains(2L), "exact duplicate drops")
    assert(!kept.contains(3L), "near duplicate drops (jaccard > threshold)")
  }

  test("decontaminateNearDup flags paraphrased benchmark copies that exact " +
    "n-gram overlap at 8-grams would score low") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "completely unrelated text about spark shuffle partitions and joins"),
      (3L, "the quick brown fox jumps over the lazy dog near the river bank soon")
      ).toDF("doc_id", "text") // 3 is a light edit of 1
    val bench = Seq(
      (100L, "the quick brown fox jumps over the lazy dog near the river bank today"))
      .toDF("doc_id", "text")
    val out = graft.operators.Dedup.decontaminateNearDup(
      corpus, bench, n = 3, k = 12, bands = 4, threshold = 0.4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    assert(out.contains(1L) && out(1L)._2 === 1.0, s"verbatim copy: $out")
    assert(out.contains(3L), s"paraphrased near-dup must flag: $out")
    assert(!out.contains(2L), "unrelated doc must not flag")
  }

  test("uniformFramePlan: integer-exact uniform indices, short clips keep all frames") {
    val decoded = Seq(
      (1L, 100),  // 100 frames, budget 8 -> centers of 8 segments
      (2L, 5),    // fewer than budget -> all 5, ix = j
      (3L, 0)     // zero frames -> no rows
      ).toDF("asset_id", "n_frames")
    val out = graft.operators.Multimodal.uniformFramePlan(decoded, maxFrames = 8, fps = 25)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    val byAsset = out.groupBy(_._1)
    // (2j+1)*100/16 floored: 6, 18, 31, 43, 56, 68, 81, 93
    assert(byAsset(1L).map(_._3).toSeq.sorted === Seq(6L, 18L, 31L, 43L, 56L, 68L, 81L, 93L))
    assert(byAsset(2L).map(_._3).toSeq.sorted === (0L until 5L), "short clip keeps every frame")
    assert(!byAsset.contains(3L), "zero-frame asset emits nothing")
    // ts at 25 fps: frame 6 -> 240 ms
    assert(byAsset(1L).find(_._3 == 6L).get._4 === 240L)
  }

  test("vocabCoverageCurve: monotone coverage, exact fractions, stable ties") {
    // "a" x6, "b" x3, "c" x1 -> total 10; top-1 covers .6, top-2 .9, top-3 1.0
    val d = Seq((1L, "a a a b b c"), (2L, "a a a b")).toDF("doc_id", "text")
    val out = TextAnalysis.vocabCoverageCurve(d, Seq(1, 2, 3, 10))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out(1L) === (3L, 10L, 6L, 0.6))
    assert(out(2L) === (3L, 10L, 9L, 0.9))
    assert(out(3L) === (3L, 10L, 10L, 1.0))
    assert(out(10L) === (3L, 10L, 10L, 1.0), "V past n_types covers everything")
  }

  test("charClassProfile: class counts partition n_chars") {
    val d = Seq((1L, "Ab1 c!"), (2L, "12345"), (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.charClassProfile(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), Option(r.get(6)))).toMap
    assert(out(1L) === (6L, 3L, 1L, 1L, 1L, Some(0.5)))   // "ab1 c!" lowered
    assert(out(2L) === (5L, 0L, 5L, 0L, 0L, Some(0.0)))
    assert(out(3L) === (0L, 0L, 0L, 0L, 0L, None), "empty doc: NULL fraction")
  }

  test("duplicateSpans: merges overlapping windows, splits on gaps, counts within-doc repeats") {
    val d = Seq(
      (1L, "a b c d e f"),                       // shares "a b c","b c d" with doc 2
      (2L, "z z a b c d z"),
      (3L, "p q r x1 x2 x3 x4 x5 p q r"),        // within-doc repeat, gap 8 > 3
      (4L, "totally unique words only here")
    ).toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(d, n = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(out === Seq(
      (1L, 1L, 4L, 4L),   // windows at pos 0,1 merge -> tokens 1..4
      (2L, 3L, 6L, 4L),   // windows at pos 2,3 merge -> tokens 3..6
      (3L, 1L, 3L, 3L),   // "p q r" at pos 0 and 8: gap > n splits
      (3L, 9L, 11L, 3L)))
    // doc 4 emits nothing
  }

  test("duplicateSpans: randomized brute-force equivalence") {
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 1 to 5) {
      val n = 2 + rnd.nextInt(2) // 2..3
      val docs = (1L to 8L).map { id =>
        val toks = Seq.fill(rnd.nextInt(12))("t" + rnd.nextInt(6))
        (id, toks.mkString(" "))
      }
      // plain-Scala oracle: global window counts, per-doc island merge
      val wins = docs.flatMap { case (id, text) =>
        val ts = text.trim.toLowerCase.split("\\s+", -1).toSeq
        if (ts.length < n) Nil
        else (0 to ts.length - n).map(i => (id, i, ts.slice(i, i + n).mkString(" ")))
      }
      val counts = wins.groupBy(_._3).map { case (g, xs) => g -> xs.size }
      val expected = wins.filter(w => counts(w._3) >= 2).groupBy(_._1).flatMap {
        case (id, xs) =>
          val ps = xs.map(_._2).sorted
          val spans = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long, Long)]
          var start = ps.head; var last = ps.head
          for (p <- ps.tail) {
            if (p - last > n) {
              spans += ((id, start + 1L, last + n.toLong, (last + n - start).toLong))
              start = p
            }
            last = p
          }
          spans += ((id, start + 1L, last + n.toLong, (last + n - start).toLong))
          spans
      }.toSet
      val got = Dedup.duplicateSpans(docs.toDF("doc_id", "text"), n = n).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got === expected, s"trial $trial n=$n docs=$docs")
    }
  }

  test("duplicateSpans: a repeat longer than n reports the full merged span") {
    // 5-token phrase repeated across docs, n=3 -> 3 overlapping windows
    // each, merged into ONE span of 5 tokens per doc
    val d = Seq(
      (1L, "u1 u2 alpha beta gamma delta eps u3"),
      (2L, "alpha beta gamma delta eps v1 v2 v3 v4")
    ).toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(d, n = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1).toSeq
    assert(out === Seq((1L, 3L, 7L, 5L), (2L, 1L, 5L, 5L)))
  }

  test("duplicateSpans: the n-boundary — n IS the minimum repeat length (documented bound)") {
    // one exactly-n repeat (3 tokens: "a b c") and one (n-1) repeat
    // (2 tokens: "x y") across two docs; filler tokens are all unique
    val d = Seq(
      (1L, "f1 a b c f2 x y f3"),
      (2L, "g1 g2 a b c g3 x y")
    ).toDF("doc_id", "text")
    val at3 = Dedup.duplicateSpans(d, n = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1).toSeq
    // the 3-token repeat is found span-exactly; the 2-token repeat is
    // INVISIBLE at n=3 — the contract's explicit bound
    assert(at3 === Seq((1L, 2L, 4L, 3L), (2L, 3L, 5L, 3L)),
      "repeats shorter than n must not surface, repeats of exactly n must")
    // lowering n to the length of interest makes the short repeat
    // visible — n is the min-match-length knob, not an approximation
    val at2 = Dedup.duplicateSpans(d, n = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(at2.contains((1L, 6L, 7L, 2L)) && at2.contains((2L, 7L, 8L, 2L)),
      "the 2-token repeat surfaces at n=2")
    assert(at2.contains((1L, 2L, 4L, 3L)) && at2.contains((2L, 3L, 5L, 3L)),
      "every length-2 subwindow of the 3-token repeat is repeated, so the " +
        "full span still reports identically at the smaller n")
  }

  test("semDedup: drops only lower-id cell-mates above threshold, keeps cross-cell twins") {
    val emb = Seq(
      (1L, Seq(1.0, 0.0)),   // seed centroid of cell 1
      (2L, Seq(0.0, 1.0)),   // seed centroid of cell 2
      (3L, Seq(0.7, 0.7)),   // equidistant -> tie-break to cell 1; cos vs v1 = .707 < τ
      (4L, Seq(1.0, 0.0)),   // exact dup of v1, cell 1 -> dropped
      (5L, Seq(0.0, 1.0)),   // exact dup of v2, cell 2 -> dropped
      (6L, Seq(-1.0, 0.0))   // cell 2 (cos 0 beats cos -1); no close cell-mate -> kept
    ).toDF("vec_id", "embedding")
    val out = Similarity.semDedup(emb, nCells = 2, threshold = 0.95).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) === (1L, 1L) && out(4L) === (1L, 0L), "exact dup in cell 1 dropped")
    assert(out(2L) === (2L, 1L) && out(5L) === (2L, 0L), "exact dup in cell 2 dropped")
    assert(out(3L) === (1L, 1L), "tie-break assigns the lower cell; .707 under threshold")
    assert(out(6L) === (2L, 1L), "opposite vector survives in cell 2")
  }

  test("containmentPairs: catches a contained doc that the Jaccard gate misses") {
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"), // superset: +1 token
      (3L, "completely unrelated content about spark engines here")
    ).toDF("doc_id", "text")
    // n=3: doc1 has 7 shingles, all contained in doc2's 8 -> containment 1.0,
    // jaccard 7/8 = 0.875
    val out = Dedup.containmentPairs(d, n = 3, k = 12, bands = 4,
      minContainment = 0.9, maxBucket = 100).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out.contains((1L, 2L)), "contained pair must surface")
    assert(out((1L, 2L)) === ((7L, 8L, 1.0)))
    assert(out.size === 1, "unrelated doc must not pair")
    // the symmetric gate at 0.9 misses the same pair (jaccard 0.875)
    val jac = Dedup.minhashLsh(d, n = 3, k = 12, bands = 4,
      threshold = 0.9, maxBucket = 100).collect()
    assert(!jac.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L),
      "jaccard >= 0.9 must miss the asymmetric pair containment catches")
  }

  test("labelOutliers: far-from-centroid member flags, tight members don't, singleton NULLs") {
    // label 1: 8 vectors at (1,0) + one at (0,1). Deviations: tight d/9,
    // outlier -8d/9; std = d*sqrt(8)/9 -> z_outlier = -sqrt(8) = -2.8284
    val emb = ((1L to 8L).map(i => (i, 1L, Seq(1.0, 0.0))) :+
      (9L, 1L, Seq(0.0, 1.0)) :+
      (10L, 2L, Seq(0.5, 0.5))).toDF("vec_id", "label", "embedding")
    val out = Similarity.labelOutliers(emb, dims = 2).collect()
      .map(r => r.getLong(0) -> (Option(r.get(3)).map(_.asInstanceOf[Double]), r.getLong(4))).toMap
    assert(out(9L)._2 === 1L, "the (0,1) member must flag")
    assert(math.abs(out(9L)._1.get - (-math.sqrt(8))) < 1e-3)
    for (i <- 1L to 8L) {
      assert(out(i)._2 === 0L)
      assert(math.abs(out(i)._1.get - (1.0 / math.sqrt(8))) < 1e-3)
    }
    assert(out(10L)._1.isEmpty && out(10L)._2 === 0L,
      "singleton label: std 0 -> NULL z, never flags")
    // a zero vector is unscoreable (0/0 cosine): NULL cos/z, never flags,
    // and it must NOT poison its label's mean/std for the other members
    val withZero = emb.union(Seq((11L, 1L, Seq(0.0, 0.0))).toDF("vec_id", "label", "embedding"))
    val out2 = Similarity.labelOutliers(withZero, dims = 2).collect()
      .map(r => r.getLong(0) -> (Option(r.get(2)), Option(r.get(3)), r.getLong(4))).toMap
    assert(out2(11L)._1.isEmpty && out2(11L)._2.isEmpty && out2(11L)._3 === 0L)
    assert(out2(9L)._3 === 1L, "peers' z-scores unchanged by the unscoreable member")
  }

  test("naiveBayesClassify: separable labels classify correctly, mislabeled doc flips") {
    val d = Seq(
      (1L, "a", "x x y"),
      (2L, "a", "x y"),
      (3L, "b", "z z w"),
      (4L, "b", "z w"),
      (5L, "a", "z z z")   // token mass is pure 'b' vocabulary -> predicted b
    ).toDF("doc_id", "source", "text")
    val out = TextAnalysis.naiveBayesClassify(d).collect()
      .map(r => r.getLong(0) -> (r.getString(2), r.getLong(4))).toMap
    assert(out(1L) === ("a", 1L) && out(2L) === ("a", 1L))
    assert(out(3L) === ("b", 1L) && out(4L) === ("b", 1L))
    assert(out(5L) === ("b", 0L), "z-only doc must classify as b despite its a label")
    // NULL text: no token rows, but the doc must still emit exactly one
    // scored row (all-NULL score -> first label by tie-break), matching
    // the oracle's row membership
    val withNull = d.union(Seq((6L, "b", null.asInstanceOf[String])).toDF("doc_id", "source", "text"))
    val r6 = TextAnalysis.naiveBayesClassify(withNull).filter(col("doc_id") === 6).collect()
    assert(r6.length === 1, "NULL-text doc must not vanish from the output")
    assert(r6.head.getString(2) === "a" && r6.head.isNullAt(3),
      "all-NULL scores tie-break to the first label with a NULL score")
    // hand-computed argmax margin for doc 5: score_b - score_a =
    // (-0.916291 - 3*2.197225 + 3*1.386294) - (-0.510826 - 3*2.484907 + 3*1.386294)
    val row5 = TextAnalysis.naiveBayesClassify(d).filter(col("doc_id") === 5).head()
    assert(math.abs(row5.getDouble(3) - (-3.349084)) < 1e-6)
  }

  test("paragraphDedup: global first-occurrence keep, case-folded fingerprints, rebuild md5") {
    val docs = Seq(
      (1L, "alpha one\n\nSHARED FOOTER\n\nbody a"),
      (2L, "beta two\n\nshared footer\n\nbody b"),   // case variant collapses
      (3L, "gamma\n\ngamma"),                        // intra-doc repeat
      (4L, "  \n\nonly\n\n\n\nend")                  // blank para dropped; \n{2,} runs = one separator
    ).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        Option(r.getAs[String]("kept_md5")))).toMap
    assert(out(1L)._1 === 3 && out(1L)._2 === 3, "doc 1 keeps everything (first)")
    assert(out(2L)._1 === 3 && out(2L)._2 === 2,
      "doc 2 loses the footer to doc 1 despite the case difference")
    assert(out(3L)._1 === 2 && out(3L)._2 === 1,
      "intra-doc repeat: second occurrence dropped")
    assert(out(4L)._1 === 2 && out(4L)._2 === 2, "blank paragraph dropped")
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(2L)._3 === Some(md5("beta two\n\nbody b")),
      "rebuilt text = surviving ORIGINAL paragraphs rejoined")
    assert(out(1L)._3 === Some(md5("alpha one\n\nSHARED FOOTER\n\nbody a")))
    // a doc that is ENTIRELY duplicates rebuilds to NULL
    val all = docs.union(Seq((5L, "SHARED footer")).toDF("doc_id", "text"))
    val r5 = Dedup.paragraphDedup(all).filter(col("doc_id") === 5L).head()
    assert(r5.getLong(2) === 0L && r5.isNullAt(3))
  }

  test("langIdNgram: char-trigram profiles separate scripts the heuristic can't") {
    // distinct character shapes per language; doc 5 carries German
    // trigrams under an 'en' tag — the mislabel the trained profile flags
    val d = Seq(
      (1L, "en", "the quick thing there then"),
      (2L, "en", "the other thing here"),
      (3L, "de", "schneller durch schwarzwald schnee"),
      (4L, "de", "schnell schwer durchschnitt"),
      (5L, "en", "schnellschwarz durchschnee schwer")
    ).toDF("doc_id", "lang", "text")
    val out = TextAnalysis.langIdNgram(d).collect()
      .map(r => r.getLong(0) -> (r.getString(2), r.getLong(4))).toMap
    assert(out(1L) === ("en", 1L) && out(2L) === ("en", 1L))
    assert(out(3L) === ("de", 1L) && out(4L) === ("de", 1L))
    assert(out(5L) === ("de", 0L),
      "sch/rch trigram mass must out-vote the declared en tag")
    // short/NULL text: < 3 chars → zero trigrams, still exactly one row
    val edge = d.union(Seq((6L, "de", "ab"), (7L, "en", null.asInstanceOf[String]))
      .toDF("doc_id", "lang", "text"))
    val rows = TextAnalysis.langIdNgram(edge)
      .filter(col("doc_id") >= 6).collect().sortBy(_.getLong(0))
    assert(rows.length === 2, "degenerate docs must not vanish")
    assert(rows(0).getString(2) !== null, "0-trigram doc scores on priors alone")
    assert(rows(1).isNullAt(3), "NULL text scores NULL, tie-break label")
    // partition-count independence (the decimal-fold order-free contract)
    val wide = TextAnalysis.langIdNgram(d.repartition(7)).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(wide === out.map { case (k, v) => k -> v._1 })
  }

  test("dsirWeights/dsirSample: target-like docs outweigh off-target, deterministic Gumbel") {
    val d = Seq(
      (1L, "tgt", "x x y x"),     // target exemplars: x-heavy
      (2L, "tgt", "x y x"),
      (3L, "raw", "x x x y"),     // raw, target-like -> high weight
      (4L, "raw", "z z w z"),     // raw, off-target -> low weight
      (5L, "raw", null.asInstanceOf[String]) // no features -> logw 0, row kept
    ).toDF("doc_id", "source", "text")
    val w = TextAnalysis.dsirWeights(d, col("source") === "tgt", buckets = 64)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), r.getDecimal(2).doubleValue())).toMap
    assert(w.keySet === Set(3L, 4L, 5L), "only raw-pool docs are scored")
    assert(w(3L)._2 > w(4L)._2,
      "doc made of target vocabulary must outweigh the off-target doc")
    assert(w(5L)._1.isEmpty && w(5L)._2 === 0.0,
      "NULL-text raw doc keeps its row with logw 0")
    // Gumbel-top-k: deterministic across runs, k bounds the output, and
    // every kept row is from the raw pool
    val s1 = TextAnalysis.dsirSample(d, col("source") === "tgt", 64, k = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    val s2 = TextAnalysis.dsirSample(d, col("source") === "tgt", 64, k = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    assert(s1.toSeq === s2.toSeq, "md5-derived Gumbel keys replay exactly")
    assert(s1.length === 2 && s1.map(_._1).forall(Set(3L, 4L, 5L)))
    // with k >= pool size the sample is the whole pool ordered by gkey desc
    val all = TextAnalysis.dsirSample(d, col("source") === "tgt", 64, k = 10)
      .collect().map(_.getDouble(3))
    assert(all.length === 3 && all.sameElements(all.sorted(Ordering[Double].reverse)))
  }

  test("tokenizerFertility: multibyte bytes>chars, NULL text counts docs only, zero guards") {
    val d = Seq(
      (1L, "a", "en", "cats and dogs"),        // 3 words, 3 bpe tokens
      (2L, "a", "en", "state-of-the-art"),     // 1 word, 7 bpe tokens (4 runs + 3 hyphens)
      (3L, "b", "de", "straße größe"),         // multibyte ß: bytes > chars
      (4L, "b", "de", null.asInstanceOf[String]) // counts as a doc, no token mass
    ).toDF("doc_id", "source", "lang", "text")
    val out = TextAnalysis.tokenizerFertility(d)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val a = out(("a", "en"))
    assert(a.getAs[Long]("n_docs") === 2L && a.getAs[Long]("n_words") === 4L)
    assert(a.getAs[Long]("n_bpe_tokens") === 10L)
    assert(a.getAs[Double]("fertility") === 2.5)
    val b = out(("b", "de"))
    assert(b.getAs[Long]("n_docs") === 2L, "NULL-text doc still counts")
    assert(b.getAs[Long]("n_bytes") > b.getAs[Long]("n_chars"),
      "UTF-8 multibyte chars must make bytes exceed chars")
    // all-NULL group: ratios NULL, not a crash or a zero-division
    val nullOnly = Seq((5L, "c", "zz", null.asInstanceOf[String]))
      .toDF("doc_id", "source", "lang", "text")
    val c = TextAnalysis.tokenizerFertility(nullOnly).collect().head
    assert(c.getAs[Long]("n_docs") === 1L && c.isNullAt(c.fieldIndex("fertility")))
  }

  test("langConfusion: cells count declared-vs-predicted, match flag set") {
    val d = Seq(
      (1L, "en", "the cat and the dog"),   // en predicted
      (2L, "en", "der hund ist und das"),  // de predicted but declared en
      (3L, "de", "der die das und ist"),   // de/de
      (4L, "xx", "qqq zzz www")            // no stopword hits -> 'und'
    ).toDF("doc_id", "lang", "text")
    val cells = TextAnalysis.langConfusion(d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(cells(("en", "en")) === ((1L, 1L)))
    assert(cells(("en", "de")) === ((1L, 0L)))
    assert(cells(("de", "de")) === ((1L, 1L)))
    assert(cells(("xx", "und")) === ((1L, 0L)))
  }

  test("perplexityBuckets: per-source bands, sizes balanced, ordering by fluency") {
    val mk = (i: Long, s: String, t: String) => (i, s, t)
    // source A: 6 docs; source B: 3 docs — bands computed independently
    val d = Seq(
      mk(1, "A", "the cat sat on the mat"),
      mk(2, "A", "the cat sat on the rug"),
      mk(3, "A", "the dog sat on the mat"),
      mk(4, "A", "mat the on sat cat the"),
      mk(5, "A", "zq wv xk pj qq zz"),
      mk(6, "A", "the cat sat"),
      mk(7, "B", "the cat sat on the mat"),
      mk(8, "B", "cat the sat"),
      mk(9, "B", "zz qq xk")
    ).toDF("doc_id", "source", "text")
    val out = TextAnalysis.perplexityBuckets(d, nBuckets = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3), r.getString(4)))
    val a = out.filter(_._2 == "A")
    assert(a.count(_._5 == "head") === 2 && a.count(_._5 == "middle") === 2 &&
      a.count(_._5 == "tail") === 2, "6 docs -> 2/2/2 bands")
    val b = out.filter(_._2 == "B")
    assert(b.map(x => (x._4, x._5)).sorted.toSeq ===
      Seq((1L, "head"), (2L, "middle"), (3L, "tail")), "3 docs -> one per band")
    // banding must agree with the score ordering inside each source
    for (grp <- Seq(a, b)) {
      val byScore = grp.sortBy(x => (-x._3, x._1)).map(_._4).toSeq
      assert(byScore === byScore.sorted, "bucket must be monotone in (score desc, doc_id)")
    }
    // the gibberish doc is A's tail
    assert(out.find(_._1 == 5L).get._5 === "tail")
  }

  test("simhash: 64 bits, identical for identical docs, differs for unrelated") {
    val m = Dedup.simhash(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("simhash")).toMap
    assert(m.values.forall(_.length === 64))
    assert(m.values.forall(_.forall(c => c == '0' || c == '1')))
    assert(m(1L) === m(2L))
    assert(m(1L) !== m(4L))
    // near-dup hamming distance < unrelated hamming distance
    def ham(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    assert(ham(m(1L), m(3L)) < ham(m(1L), m(4L)))
  }

  test("simhash packed-lane aggregate matches an independent oracle, incl. multi-chunk docs") {
    // one doc inside a single 16384-token chunk sub-group, one spanning
    // three (33000 tokens) — both signatures must equal a majority vote
    // computed from the raw MD5s in plain Scala, proving the packed
    // lanes never carry across chunk boundaries
    val mk = (na: Int, nb: Int) =>
      (Seq.fill(na)("a") ++ Seq.fill(nb)("b")).mkString(" ")
    val d = Seq((1L, mk(9000, 5000)),     // 14000 tokens -> one chunk
                (2L, mk(20000, 13000)))   // 33000 tokens -> three chunks
      .toDF("doc_id", "text")
    def md5bits(tok: String): IndexedSeq[Int] = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (0 until 64).map { b =>
        (Character.digit(hex.charAt(b / 4), 16) >> (b % 4)) & 1
      }
    }
    val (va, vb) = (md5bits("a"), md5bits("b"))
    def expected(na: Int, nb: Int): String = (0 until 64).map { b =>
      if ((na * va(b) + nb * vb(b)) * 2 >= na + nb) '1' else '0'
    }.mkString
    val got = Dedup.simhash(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("simhash")).toMap
    assert(got(1L) === expected(9000, 5000), "single-chunk doc")
    assert(got(2L) === expected(20000, 13000), "multi-chunk doc")
  }

  test("simhashNearDup pairs exact and near duplicates, skips unrelated docs") {
    val pairs = Dedup.simhashNearDup(docs, maxHamming = 3).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("hamming")))
    val byPair = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(byPair.get((1L, 2L)) === Some(0L), "exact dup has hamming 0")
    assert(!byPair.keySet.exists(p => p._1 == 4L || p._2 == 4L),
      "unrelated doc must not pair")
    // chunks agree with the string signature bit-for-bit
    val str = Dedup.simhash(docs.filter(col("doc_id") === 1)).collect().head.getAs[String]("simhash")
    val ch = Dedup.simhashChunks(docs.filter(col("doc_id") === 1)).collect().head
    val fromChunks = (0 until 4).flatMap { j =>
      val c = ch.getAs[Long](s"c$j")
      (0 until 16).map(i => if (((c >> i) & 1L) == 1L) '1' else '0')
    }.mkString
    assert(fromChunks === str)
  }

  test("native dot_product matches hand-computed values and HOF fold") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(1.5f, -2.0f), Array(2.0f, 0.5f))
    ).toDF("a", "b")
    val out = df.select(VectorFunctions.dot_product(col("a"), col("b"))).collect()
      .map(_.getDouble(0))
    assert(out(0) === 32.0)
    assert(out(1) === 2.0)
    // exact equality with the HOF formulation (same fold order)
    val hof = df.select(aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)).collect().map(_.getDouble(0))
    assert(out.toSeq === hof.toSeq)
  }

  test("dot_product null semantics: length mismatch and null elements give NULL") {
    val df = Seq(
      (Array[java.lang.Float](1.0f, 2.0f), Array[java.lang.Float](1.0f)),
      (Array[java.lang.Float](1.0f, null), Array[java.lang.Float](1.0f, 2.0f))
    ).toDF("a", "b")
    val out = df.select(VectorFunctions.dot_product(col("a"), col("b"))).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("knnBruteForce returns deterministic ranked neighbors") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.knnBruteForce(emb.filter(col("vec_id") === 0), emb, 2)
      .orderBy(col("rank")).collect()
      .map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Long]("rank")))
    assert(out.toSeq === Seq((1L, 1L), (2L, 2L)))
  }

  test("hardNegatives: nearest same-label excluded, NULL label is a negative") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), Some("a")),
      (1L, Array(0.99f, 0.01f), Some("a")),  // closest overall but same label
      (2L, Array(0.9f, 0.1f), Some("b")),    // hardest negative
      (3L, Array(0.5f, 0.5f), Option.empty[String]), // NULL label: negative
      (4L, Array(-1.0f, 0.0f), Some("b")))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(emb.filter(col("vec_id") === 0), emb, k = 2)
      .orderBy(col("rank")).collect()
      .map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Long]("rank")))
    assert(out.toSeq === Seq((2L, 1L), (3L, 2L)),
      "same-label twin must be skipped; NULL-label row serves as a negative")
  }

  test("retrievalAveragePrecision: hand-computed AP, zero-relevant query is NULL") {
    // query 0 (label a): ranking by cosine is 1 (a), 2 (b), 3 (a), 4 (b)
    // rel = 1,0,1,0 -> AP@10 = (round(1/1,6) + round(2/3,6))/min(2,10)
    //                        = 1.666667/2 = 0.8333335 -> round 6 = 0.833334
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), "a"),
      (1L, Array(0.99f, 0.01f), "a"),
      (2L, Array(0.9f, 0.1f), "b"),
      (3L, Array(0.5f, 0.5f), "a"),
      (4L, Array(-1.0f, 0.0f), "b"),
      (9L, Array(0.7f, 0.7f), "solo"))  // no other 'solo' rows -> NULL AP
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.retrievalAveragePrecision(
        emb.filter(col("vec_id") === 0 || col("vec_id") === 9), emb, k = 10)
      .collect().map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Long]("n_relevant"), Option(r.get(3)).map(_.asInstanceOf[Double])))
      .toMap
    assert(out(0L)._1 === 2L)
    assert(out(0L)._2.exists(v => math.abs(v - 0.833334) < 1e-9),
      s"AP must be (1 + 2/3)/2 rounded: got ${out(0L)._2}")
    assert(out(9L) === ((0L, None)), "no relevant corpus rows -> NULL, not NaN")
  }

  test("standardize: hand-computed z and minmax, constant group NULLs, NULL passthrough") {
    val d = Seq(("g", Some(1.0)), ("g", Some(2.0)), ("g", Some(3.0)),
      ("g", Option.empty[Double]),
      ("c", Some(7.0)), ("c", Some(7.0))).toDF("grp", "v")
    val out = graft.operators.Stats.standardize(d, "grp", "v")
      .collect().map(r => (r.getString(0), Option(r.get(1)).map(_.asInstanceOf[Double])) ->
        (Option(r.get(2)).map(_.asInstanceOf[Double]),
          Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    // g: mean 2, pop var = (1+4+9)/3 - 4 = 2/3, sigma = sqrt(2/3)
    val sigma = math.sqrt(2.0 / 3.0)
    assert(out(("g", Some(2.0)))._1.contains(0.0), "mean value z = 0")
    assert(out(("g", Some(3.0)))._1.exists(z => math.abs(z - math.round(1 / sigma * 1e6) / 1e6) < 1e-9))
    assert(out(("g", Some(1.0)))._2.contains(0.0) && out(("g", Some(3.0)))._2.contains(1.0),
      "minmax endpoints are 0 and 1")
    assert(out(("g", None)) === ((None, None)), "NULL value stays NULL")
    assert(out(("c", Some(7.0))) === ((None, None)),
      "constant group: zero variance and mn=mx must NULL, never NaN")
  }

  test("robustScale: median centers, IQR scales, outlier does not move the bounds") {
    // 1..9 plus a wild outlier: median 5.5, q1 3.25, q3 7.75 over 10 values
    val d = ((1 to 9).map(i => ("g", i.toDouble)) :+ ("g", 1e9))
      .toDF("grp", "v")
    val out = graft.operators.Stats.robustScale(d, "grp", "v")
      .collect().map(r => r.getDouble(1) -> Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    // quantile_cont over sorted 1..9,1e9: q1 = 3.25, med = 5.5, q3 = 7.75, iqr = 4.5
    assert(out(5.0).exists(v => math.abs(v - ((5.0 - 5.5) / 4.5 * 1e6).round / 1e6) < 1e-9))
    assert(out(1e9).exists(_ > 1e8 / 4.5 / 2), "the outlier lands far out without poisoning the scale")
    // constant group: zero IQR -> NULL
    val c = Seq(("c", 5.0), ("c", 5.0), ("c", 5.0)).toDF("grp", "v")
    assert(graft.operators.Stats.robustScale(c, "grp", "v")
      .collect().forall(_.isNullAt(2)), "zero-IQR group must NULL, never Inf")
  }

  test("temporalSplit: boundary semantics and NULL timestamps") {
    import java.sql.Timestamp
    val d = Seq(
      (1L, Some(Timestamp.valueOf("2024-01-17 23:59:59"))), // train (< split-2d)
      (2L, Some(Timestamp.valueOf("2024-01-18 00:00:00"))), // embargo (== split-2d)
      (3L, Some(Timestamp.valueOf("2024-01-19 12:00:00"))), // embargo
      (4L, Some(Timestamp.valueOf("2024-01-20 00:00:00"))), // test (== split)
      (5L, Option.empty[Timestamp]))
      .toDF("id", "ts")
    val out = graft.operators.Sampling
      .temporalSplit(d, "ts", "2024-01-20 00:00:00", "2 days")
      .collect().map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    assert(out(1L).contains("train") && out(2L).contains("embargo") &&
      out(3L).contains("embargo") && out(4L).contains("test"))
    assert(out(5L).isEmpty, "NULL ts labels NULL, never silently trains")
  }

  test("featureHash: same token same bucket, counts exact, bounded index space") {
    val d = Seq((1L, "alpha beta alpha"), (2L, "beta"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val rows = graft.operators.TextAnalysis.featureHash(d, dims = 64).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.forall(t => t._2 >= 0 && t._2 < 64), "indexes inside the space")
    val d1 = rows.filter(_._1 == 1L)
    assert(d1.map(_._3).sum === 3L, "doc 1 has 3 tokens")
    val betaIx1 = d1.filter(_._3 == 1L).map(_._2)  // beta appears once in doc 1
    val betaIx2 = rows.filter(_._1 == 2L).map(_._2)
    assert(betaIx1.toSeq === betaIx2.toSeq, "same token must hash to the same bucket")
    assert(!rows.exists(_._1 == 3L), "NULL text contributes no rows")
  }

  test("rrfFuse: hand-computed fusion, one-list items still score") {
    val a = Seq(("q", 10L, 1L), ("q", 11L, 2L)).toDF("qid", "id", "rank")
    val b = Seq(("q", 11L, 1L), ("q", 12L, 2L)).toDF("qid", "id", "rank")
    val out = graft.operators.Similarity.rrfFuse(a, b, "qid", "id", k = 60)
      .collect().map(r => r.getLong(1) -> (r.getDouble(4), r.getLong(5))).toMap
    // 11: 1/62 + 1/61 -> round each to 6: 0.016129 + 0.016393 = 0.032522
    assert(math.abs(out(11L)._1 - 0.032522) < 1e-9, s"got ${out(11L)._1}")
    assert(out(11L)._2 === 1L, "item on both lists wins")
    // 10: only list a rank 1 -> 1/61 = 0.016393; 12: only list b rank 2 -> 1/62 = 0.016129
    assert(out(10L)._2 === 2L && out(12L)._2 === 3L,
      "one-list items rank by their single contribution")
  }

  test("labelDispersion: duplicates disperse 0, opposite vectors disperse ||x||^2") {
    val emb = Seq(
      (0L, Array(3.0f, 4.0f), 1L), (1L, Array(3.0f, 4.0f), 1L),  // identical: c = x
      (2L, Array(3.0f, 4.0f), 2L), (3L, Array(-3.0f, -4.0f), 2L)) // opposite: c = 0
      .toDF("vec_id", "embedding", "label")
    val out = graft.operators.Similarity.labelDispersion(emb, dims = 2)
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(out(1L) === ((25.0, 25.0, 0.0)), "identical vectors: E||x||^2 = ||c||^2")
    assert(out(2L) === ((25.0, 0.0, 25.0)), "opposite vectors: zero centroid, full dispersion")
  }

  test("curriculumPhases matches a per-group sequential fold on randomized frames") {
    val rng = new scala.util.Random(11)
    val rows = (1 to 500).map { i =>
      (s"s${rng.nextInt(4)}", i.toLong, 1L + rng.nextInt(100).toLong) }
    val budget = 150L
    val got = graft.operators.Sampling
      .curriculumPhases(rows.toDF("src", "id", "toks"), "src", "id", "toks", "toks", budget)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    // reference: plain fold over each group's (toks, id)-sorted stream
    val want = rows.groupBy(_._1).flatMap { case (src, g) =>
      var cum = 0L
      g.sortBy(r => (r._3, r._2)).map { r =>
        val phase = cum / budget; cum += r._3; (src, r._2) -> phase }
    }.toMap
    assert(got === want, "operator must equal the sequential fold exactly")
  }

  test("annLsh buckets are stable and same-bucket for identical vectors") {
    val emb = Seq(
      (0L, Array.fill(8)(0.5f)), (1L, Array.fill(8)(0.5f)),
      (2L, Array.fill(8)(-0.5f))
    ).toDF("vec_id", "embedding")
    val b = emb.select(col("vec_id"),
      Similarity.lshBucket(col("embedding"), 8, 4).as("bucket"))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[String]("bucket")).toMap
    assert(b(0L) === b(1L))
    assert(b(0L) !== b(2L)) // opposite vectors flip every sign bit
  }

  test("text profile metrics are sane on known text") {
    val d = Seq((1L, "the cat and the dog sat", "en", "src", 23L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextAnalysis.profile(d).collect().head
    assert(r.getAs[Long]("n_tokens") === 6L)
    assert(r.getAs[Long]("n_bpe_tokens") === 6L)
    assert(r.getAs[String]("lang_pred") === "en")
    assert(r.getAs[String]("fp").length === 32)
  }

  test("multimodal: decode batch shape + zero-frame sampling guard") {
    val assets = Multimodal.toAssets(docs, "doc_id", "text", "text")
    val decoded = Multimodal.decodeAll(assets, Multimodal.StubDecoder).toDF()
    assert(decoded.count() === 4)
    assert(decoded.filter(col("width") < 16 || col("n_frames") < 1).count() === 0)
    // identical payloads decode identically (deterministic stub)
    val dims = decoded.filter(col("asset_id").isin(1, 2))
      .select(col("width"), col("height")).distinct().count()
    assert(dims === 1)

    val zero = Multimodal.sampleFrames(
      Seq((1L, 0), (2L, 5)).toDF("asset_id", "n_frames"), 2)
      .collect().map(r => r.getAs[Long]("asset_id") -> r.getAs[Seq[Int]]("sampled_frames")).toMap
    assert(zero(1L) === Seq.empty)
    assert(zero(2L) === Seq(0, 2, 4))
  }

  test("document chunking tiles text with overlap and loses no content") {
    val d = Seq(
      (1L, "a" * 100),            // single short chunk
      (2L, "b" * 256),            // exactly one full chunk
      (3L, "c" * 257),            // one char past -> second (overlap) chunk
      (4L, ("x" * 224) + ("y" * 224) + "z") // 449 chars -> two chunks
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunk(d).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_ix")) ->
        r.getAs[Long]("chunk_len")).toMap
    assert(out.keys.count(_._1 == 1L) === 1 && out((1L, 0L)) === 100)
    assert(out.keys.count(_._1 == 2L) === 1 && out((2L, 0L)) === 256)
    assert(out.keys.count(_._1 == 3L) === 2 && out((3L, 1L)) === 33)
    // len 449: chunk 0 = chars 1-256, chunk 1 = chars 225-449 (stride 224
    // tiles the text with 32 shared chars; nothing lost at the boundary)
    assert(out.keys.count(_._1 == 4L) === 2)
    assert(out((4L, 1L)) === 449L - 224L)
  }

  test("int8 quantization: error bounded by scale/254, zero vectors safe") {
    val d = Seq(
      (1L, Array(1.0f, -2.0f, 0.5f, 127.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)), // zero vector: no div-by-zero
      (3L, Array(-0.001f, 0.001f, 0.0005f, -0.0002f))
    ).toDF("vec_id", "embedding")
    val out = graft.operators.Quantize.int8Stats(d).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Double]("scale"), r.getAs[Double]("max_err"), r.getAs[Long]("n_dims")))
      .toMap
    assert(out(1L)._1 === 127.0 && out(1L)._3 === 4)
    // half-step bound: |err| <= scale/127/2 (+ rounding of the 6-dp output)
    assert(out(1L)._2 <= 127.0 / 127 / 2 + 1e-6)
    assert(out(2L) === ((0.0, 0.0, 4L)))
    assert(out(3L)._2 <= 0.001 / 127 / 2 + 1e-6)
  }

  test("redactPii scrubs emails/IPs/phones in order; piiProfile counts them") {
    val d = Seq(
      (1L, "mail alice.smith+x@corp.example.org and bob@x.io from 192.168.1.254 call +44 123 4567"),
      (2L, "no pii here just words"),
      (3L, "version 1.2.3 is not an ip, 10.0.0.1 is; 999 9999 lacks the +cc")
    ).toDF("doc_id", "text")
    val red = d.select(col("doc_id"), TextAnalysis.redactPii(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(red(1L) === "mail <EMAIL> and <EMAIL> from <IP> call <PHONE>")
    assert(red(2L) === "no pii here just words")
    // 1.2.3 has only three octets -> untouched; bare 999 9999 is not a phone
    assert(red(3L) === "version 1.2.3 is not an ip, <IP> is; 999 9999 lacks the +cc")
    val prof = TextAnalysis.piiProfile(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(prof(1L) === ((2L, 1L, 1L)))
    assert(prof(2L) === ((0L, 0L, 0L)))
    assert(prof(3L) === ((0L, 1L, 0L)))
  }

  test("bm25: tf raises a doc's score, rarity raises a term's weight") {
    val d = Seq(
      (1L, "spark spark spark filler filler filler filler filler"),
      (2L, "spark filler filler filler filler filler filler filler"),
      (3L, "quartz filler filler filler filler filler filler filler"),
      (4L, "filler filler filler filler filler filler filler filler")
    ).toDF("doc_id", "text")
    val s = TextAnalysis.bm25(d, Seq("spark", "quartz")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(s(1L)._2 > s(2L)._2, "higher tf outranks at equal dl")
    // quartz: df=1 vs spark's df=2 -> bigger idf at the same tf and dl
    assert(s(3L)._2 > s(2L)._2, "rarer term outweighs at equal tf")
    assert(!s.contains(4L), "docs matching no query term get no row")
    assert(s.values.forall(v => v._2 > 0.0))
  }

  test("ewmaSmooth: hand-computed weights, gap days renormalize, horizon truncates") {
    val daily = Seq(
      ("a", 0L, 10.0), ("a", 1L, 20.0), ("a", 3L, 40.0), // gap at day 2
      ("b", 0L, 5.0)
    ).toDF("series", "day", "v")
    val out = graft.operators.TimeSeries.ewmaSmooth(
        daily, "series", "day", "v", alpha = 0.5, horizonDays = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(out(("a", 0L)) === 10.0, "first day is its own mean")
    // day1: (20*1 + 10*0.5) / 1.5
    assert(math.abs(out(("a", 1L)) - 16.666667) < 1e-6)
    // day3: day2 absent -> weights renormalize to just w0; day1 is past
    // the 2-day horizon and must NOT leak in
    assert(out(("a", 3L)) === 40.0)
    assert(out(("b", 0L)) === 5.0, "series do not cross-contaminate")
    // horizon 3 reaches across the gap: (40*1 + 20*0.25) / 1.25
    val h3 = graft.operators.TimeSeries.ewmaSmooth(
        daily, "series", "day", "v", alpha = 0.5, horizonDays = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(math.abs(h3(("a", 3L)) - 36.0) < 1e-6)
    // output has exactly one row per observed (series, day) — no phantom days
    assert(out.size === 4)
  }

  test("pqEncode: seed vectors self-assign, one code per subspace, mixed vectors mix codes") {
    // 4 dims, 2 subspaces of 2; seeds = vecs 1..2 (codebookSize=2)
    val d = Seq(
      (1L, Seq(0f, 0f, 0f, 0f)),    // codeword 0 in both subspaces
      (2L, Seq(9f, 9f, 9f, 9f)),    // codeword 1 in both subspaces
      (3L, Seq(0.1f, 0f, 9f, 9.1f)) // near code 0 in s=0, code 1 in s=1
    ).toDF("vec_id", "embedding")
    val codes = graft.operators.Similarity.pqEncode(d, dims = 4, subspaces = 2,
        codebookSize = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(codes.size === 6, "every (vector, subspace) gets exactly one code")
    assert(codes((1L, 0L)) === 0L && codes((1L, 1L)) === 0L,
      "seed vector 1 reconstructs itself as codeword 0")
    assert(codes((2L, 0L)) === 1L && codes((2L, 1L)) === 1L)
    assert(codes((3L, 0L)) === 0L && codes((3L, 1L)) === 1L,
      "subspaces quantize independently")
    // real embeddings: codes stay in range and the encoding is total
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pq = graft.operators.Similarity.pqEncode(emb, 64, 8, 16).collect()
    assert(pq.length === emb.count() * 8)
    assert(pq.forall(r => r.getLong(2) >= 0 && r.getLong(2) < 16))
  }

  test("winnowing: w+k-1 shared run guarantees a shared fingerprint, hot cap drops boilerplate") {
    val k = 3; val w = 3 // guarantee threshold: runs of >= 5 tokens
    // docs 1,2 share an 8-token run embedded in different contexts;
    // docs 1,3 share only a 4-token run (below w+k-1=5: no guarantee)
    val run = "alpha beta gamma delta epsilon zeta eta theta"
    val d = Seq(
      (1L, s"one two $run three four"),
      (2L, s"five six seven $run eight"),
      (3L, "nine alpha beta gamma ten eleven twelve thirteen")
    ).toDF("doc_id", "text")
    val fp = graft.operators.Dedup.winnowFingerprints(d, k, w)
    val byDoc = fp.collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getLong(1)).toSet }
    assert((byDoc(1L) & byDoc(2L)).nonEmpty,
      "a shared run of >= w+k-1 tokens MUST share a fingerprint")
    // expected density 2/(w+1) = 0.5 of positions; allow a wide band
    val nGrams1 = d.filter(col("doc_id") === 1).head.getString(1).split(" ").length - k + 1
    assert(byDoc(1L).size <= nGrams1 && byDoc(1L).size >= nGrams1 / 5)
    // overlap pairs: (1,2) present; determinism across runs
    val pairs = graft.operators.Dedup.winnowOverlap(d, k, w, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    // hot cap: a fingerprint present in EVERY doc is dropped when the cap
    // is below the doc count — identical text across 4 docs, cap 3
    val boiler = (1L to 4L).map(i => (i, "common common common common common"))
      .toDF("doc_id", "text")
    assert(graft.operators.Dedup.winnowOverlap(boiler, k, w,
      minShared = 1, maxDocsPerFp = 3).count() === 0L,
      "fingerprints above the hot cap must not pair anything")
  }

  test("randomProjection: basis vectors hit ±1/√k, linearity, cosine roughly preserved") {
    // dims=2, outDims=2: projecting basis vectors exposes the sign matrix
    val basis = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(2.0f, 3.0f))).toDF("vec_id", "embedding")
    val p = graft.operators.Similarity.randomProjection(basis, dims = 2, outDims = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val s = math.sqrt(2.0)
    for (j <- 0L to 1L; i <- 1L to 2L)
      assert(math.abs(math.abs(p((i, j))) - 1.0 / s) < 1e-9,
        s"basis vector $i, component $j must be ±1/√2")
    // linearity: p(2·e1 + 3·e2) = 2·p(e1) + 3·p(e2)
    for (j <- 0L to 1L)
      assert(math.abs(p((3L, j)) - (2 * p((1L, j)) + 3 * p((2L, j)))) < 1e-9)
    // JL quality on real vectors: 64 -> 16 keeps pairwise cosine within a
    // loose tolerance on average (sign-matrix projection, Achlioptas 2003)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(col("vec_id") < 40)
    val proj = graft.operators.Similarity.randomProjection(emb, 64, 16)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.sortBy(_.getLong(1)).map(_.getDouble(2)) }
    val orig = emb.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val ids = orig.keys.toSeq.sorted
    def meanErr(pr: Map[Long, Array[Double]]) = {
      val errs = for (a <- ids; b <- ids if a < b)
        yield math.abs(cos(orig(a), orig(b)) - cos(pr(a), pr(b)))
      errs.sum / errs.size
    }
    val e16 = meanErr(proj)
    assert(e16 < 0.3, f"mean cosine distortion $e16%.3f too high for 64->16")
    // the budget dial: doubling outDims must cut distortion (measured
    // ~0.19 at k=16 vs ~0.13 at k=32 on this fixture)
    val proj32 = graft.operators.Similarity.randomProjection(emb, 64, 32)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.sortBy(_.getLong(1)).map(_.getDouble(2)) }
    assert(meanErr(proj32) < e16,
      f"k=32 distortion ${meanErr(proj32)}%.3f must beat k=16's $e16%.3f")
  }

  test("pageRank: hub outranks leaves, symmetry ties, mass conserved, deterministic") {
    // star 1-{2,3,4} plus a disconnected symmetric pair 10-11
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val pr = graft.operators.Dedup.pageRank(edges)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr.size === 6)
    assert(pr(1L) > pr(2L), "hub must outrank its leaves")
    assert(pr(2L) === pr(3L) && pr(3L) === pr(4L), "symmetric leaves tie exactly")
    assert(pr(10L) === pr(11L), "symmetric pair ties exactly")
    // total mass stays ~1 (undirected graph: no dangling leak; only
    // 12-dp rounding residue)
    assert(math.abs(pr.values.sum - 1.0) < 1e-6)
    val again = graft.operators.Dedup.pageRank(edges)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(again === pr, "fixed-iteration decimal path replays exactly")
  }

  test("pageRankDirected: direction respected, dangling mass conserved, simple-graph") {
    // a→b, a→c, b→c: c is DANGLING (no out-edges) — without the
    // dangling-mass redistribution, total rank leaks every iteration
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c")).toDF("src", "dst")
    val pr = graft.operators.Dedup.pageRankDirected(edges)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pr.size === 3)
    assert(math.abs(pr.values.sum - 1.0) < 1e-6,
      s"dangling mass must be redistributed, not leaked: $pr")
    assert(pr("c") > pr("b"), "c receives from both a and b")
    assert(pr("b") > 0.0 && pr("a") > 0.0)
    // parallel edges collapse, self-loops drop: same result
    val noisy = edges.union(Seq(("a", "b"), ("c", "c")).toDF("src", "dst"))
    val pr2 = graft.operators.Dedup.pageRankDirected(noisy)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pr2 === pr, "duplicate edge and self-loop must not move rank")
    // direction matters: reversing the chain flips the ordering
    val rev = Seq(("b", "a"), ("c", "a"), ("c", "b")).toDF("src", "dst")
    val pr3 = graft.operators.Dedup.pageRankDirected(rev)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pr3("a") > pr3("c"), "reversed edges must reverse the flow")
  }

  test("poissonBootstrap: constant group has zero spread, CI brackets the mean, deterministic") {
    val const = (1L to 200L).map(i => ("c", i, 42.0))
    val varied = (1L to 200L).map(i => ("v", i, (i % 10).toDouble))
    val d = (const ++ varied).toDF("g", "id", "x")
    val out = graft.operators.Stats.poissonBootstrap(d, "g", "id", col("x"))
      .collect().map(r => r.getString(0) -> r).toMap
    val c = out("c")
    assert(c.getAs[Long]("n") === 200L && c.getAs[Double]("mean") === 42.0)
    assert(c.getAs[Double]("se_boot") === 0.0,
      "every resample of a constant has the same mean")
    assert(c.getAs[Double]("ci_lo") === 42.0 && c.getAs[Double]("ci_hi") === 42.0)
    val v = out("v")
    assert(v.getAs[Double]("se_boot") > 0.0)
    // SE of the mean of 200 draws from {0..9} (sigma~2.87) is ~0.2 — the
    // bootstrap spread must land in that ballpark, not at 0 or sigma
    assert(v.getAs[Double]("se_boot") > 0.05 && v.getAs[Double]("se_boot") < 0.8)
    assert(v.getAs[Double]("ci_lo") < v.getAs[Double]("mean") &&
      v.getAs[Double]("mean") < v.getAs[Double]("ci_hi"))
    assert(v.getAs[Long]("n_replicas") === 32L)
    // deterministic: the "random" draw replays exactly
    val again = graft.operators.Stats.poissonBootstrap(d, "g", "id", col("x"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("se_boot")).toMap
    assert(again("v") === v.getAs[Double]("se_boot"))
    // NULL values are excluded from numerator AND replica denominators:
    // results must equal dropping the NULL rows up front
    val dn = (const.map { case (g, i, x) => (g, i, Option(x)) } ++
      Seq(("c", 999L, Option.empty[Double]))).toDF("g", "id", "x")
    val nOut = graft.operators.Stats.poissonBootstrap(dn, "g", "id", col("x"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(nOut("c").getAs[Double]("mean") === 42.0 &&
      nOut("c").getAs[Double]("se_boot") === 0.0,
      "a NULL value must not bias replica means toward 0")
    // NaN/±Infinity are DROPPED like NULLs (the psi contract) — never
    // routed into the DECIMAL-overflow raise (the r14 ADVICE finding)
    val dnf = (const ++ Seq(("c", 901L, Double.NaN),
      ("c", 902L, Double.PositiveInfinity), ("c", 903L, Double.NegativeInfinity)))
      .toDF("g", "id", "x")
    val fOut = graft.operators.Stats.poissonBootstrap(dnf, "g", "id", col("x"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(fOut("c").getAs[Long]("n") === 200L &&
      fOut("c").getAs[Double]("mean") === 42.0 &&
      fOut("c").getAs[Double]("se_boot") === 0.0,
      "non-finite values are absent data, not an overflow error")
    // a genuinely finite overflow still fails loudly
    val big = (const ++ Seq(("c", 904L, 1e15))).toDF("g", "id", "x")
    val e = intercept[Exception] {
      graft.operators.Stats.poissonBootstrap(big, "g", "id", col("x")).collect()
    }
    assert(e.getMessage != null)
  }

  test("gapFillDaily: dense spine, forward fill, leading gaps stay NULL") {
    val daily = Seq(
      ("a", java.sql.Date.valueOf("2024-01-01"), 10.0),
      ("a", java.sql.Date.valueOf("2024-01-04"), 40.0),
      ("b", java.sql.Date.valueOf("2024-01-03"), 30.0)
    ).toDF("series", "day", "v")
    val out = graft.operators.TimeSeries.gapFillDaily(daily, "series", "day", "v")
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        r.getBoolean(2), Option(r.get(3)).map(_.asInstanceOf[Double]))).sortBy(t => (t._1, t._2))
    // both series get all 4 spine days (global min..max)
    assert(out.count(_._1 == "a") === 4 && out.count(_._1 == "b") === 4)
    val a = out.filter(_._1 == "a").map(t => (t._2, t._3, t._4))
    assert(a === Array(
      ("2024-01-01", false, Some(10.0)), ("2024-01-02", true, Some(10.0)),
      ("2024-01-03", true, Some(10.0)), ("2024-01-04", false, Some(40.0))))
    val b = out.filter(_._1 == "b").map(t => (t._2, t._3, t._4))
    // nothing to carry before b's first observation
    assert(b === Array(
      ("2024-01-01", true, None), ("2024-01-02", true, None),
      ("2024-01-03", false, Some(30.0)), ("2024-01-04", true, Some(30.0))))
  }

  test("funnel: ordered stages, strict-after semantics, conversion window") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // u1 converts fully inside the window
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 11:00:00")),
      (1L, "purchase", ts("2024-01-01 12:00:00")),
      // u2: purchase BEFORE the click -> stops at click
      (2L, "view", ts("2024-01-01 10:00:00")),
      (2L, "purchase", ts("2024-01-01 10:30:00")),
      (2L, "click", ts("2024-01-01 11:00:00")),
      // u3: click outside the 24h window -> stops at view
      (3L, "view", ts("2024-01-01 10:00:00")),
      (3L, "click", ts("2024-01-03 10:00:00")),
      // u4 never views: not in the funnel at all
      (4L, "click", ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val out = graft.operators.Events.funnel(ev,
      Seq("view", "click", "purchase"), maxGapHours = Some(24))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out === Map("view" -> 3L, "click" -> 2L, "purchase" -> 1L))
    // without the window, u3's late click counts
    val open = graft.operators.Events.funnel(ev, Seq("view", "click"))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(open("click") === 3L)
  }

  test("cohortRetention: first-seen day buckets, distinct users per offset") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 23:00:00")), // same day: one row
      (1L, ts("2024-01-03 10:00:00")),
      (2L, ts("2024-01-01 09:00:00")),
      (3L, ts("2024-01-02 09:00:00")), (3L, ts("2024-01-03 09:00:00"))
    ).toDF("user_id", "ts")
    val out = graft.operators.Events.cohortRetention(ev)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      ("2024-01-01", 0L) -> 2L, ("2024-01-01", 2L) -> 1L,
      ("2024-01-02", 0L) -> 1L, ("2024-01-02", 1L) -> 1L))
  }

  test("unigramLogProb: common-word docs outscore rare-word docs") {
    val d = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the mat"),
      (3L, "zyx qwv jkl pqr mno abc")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogProb(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L)._1 === 6L)
    assert(out(1L)._2 === out(2L)._2, "identical docs score identically")
    assert(out(1L)._2 > out(3L)._2, "corpus-typical text outscores rare tokens")
    assert(out.values.forall(_._2 < 0.0), "log-probs are negative")
  }

  test("rollingAnomalies: spike flagged, steady state not, integer-exact verdict") {
    def d(s: String) = java.sql.Date.valueOf(s)
    val daily = ((1 to 9).map(i => ("a", d(f"2024-01-0$i"), 10L)) :+
      ("a", d("2024-01-10"), 100L) :+ // 10x spike
      ("b", d("2024-01-01"), 5L)      // single point: zero variance, no flag
      ).toDF("series", "day", "n")
    val out = graft.operators.TimeSeries.rollingAnomalies(daily, "series", "day", "n")
      .collect().map(r => (r.getString(0), r.getDate(1).toString) -> r.getBoolean(3)).toMap
    assert(out(("a", "2024-01-10")), "the 10x spike must be flagged")
    assert((1 to 9).forall(i => !out(("a", f"2024-01-0$i"))),
      "constant days must not be flagged (m·x = S ⇒ lhs = 0)")
    assert(!out(("b", "2024-01-01")),
      "a lone observation has an empty baseline — not an anomaly")
    // mirror the day-10 BASELINE by hand: the previous seven 10s (the row
    // under test is excluded — an inclusive frame would cap z at √(m−1))
    val frame = Seq.fill(7)(10L)
    val (m, s) = (frame.size.toLong, frame.sum)
    val q = frame.map(x => x * x).sum
    assert((m * 100 - s) * (m * 100 - s) > 4 * (m * q - s * s), "fixture math")
    // the self-masking case the exclusive baseline fixes: a 5-day window
    // at 2σ CAN flag now (inclusive frames cap z at √4 = 2, never > 2σ)
    val tight = ((1 to 5).map(i => ("t", d(f"2024-02-0$i"), 10L)) :+
      ("t", d("2024-02-06"), 1000L)).toDF("series", "day", "n")
    val t = graft.operators.TimeSeries
      .rollingAnomalies(tight, "series", "day", "n", windowDays = 5, sigmas = 2)
      .collect().map(r => r.getDate(1).toString -> r.getBoolean(3)).toMap
    assert(t("2024-02-06"), "windowDays=5 sigmas=2 must be able to flag")
  }

  test("winsorize clamps to the per-group [p05,p95] band; interior values untouched") {
    val d = ((1 to 99).map(i => ("g", i.toDouble)) :+ ("g", 10000.0)).toDF("grp", "v")
    val out = graft.operators.Cleanse.winsorize(d, "grp", "v")
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    assert(out(10000.0) < 10000.0, "the outlier must be clamped down to p95")
    assert(out(50.0) === 50.0, "interior values pass through")
    assert(out(1.0) > 1.0, "the low tail clamps up to p05")
  }

  test("exactQuantiles: bit-matches the percentile aggregate on adversarial groups") {
    import org.apache.spark.sql.functions.{col, expr, round => rnd}
    val rng = new scala.util.Random(7)
    // near-unique doubles, a skewed group (99% one value + outliers), a
    // constant group, a single-row group, and an all-NULL group
    val rows =
      (1 to 997).map(_ => ("u", Some(rng.nextDouble() * 1e6))) ++
      ((1 to 990).map(_ => ("s", Some(42.0))) ++
        (1 to 10).map(i => ("s", Some(1e9 + i)))) ++
      (1 to 5).map(_ => ("c", Some(3.14))) ++
      Seq(("one", Some(8.0)), ("nul", Option.empty[Double]),
        ("nul", Option.empty[Double]))
    val d = rows.toDF("grp", "v")
    val qs = Seq("p00" -> 0.0, "p05" -> 0.05, "p50" -> 0.5, "p95" -> 0.95,
      "p100" -> 1.0)
    val got = graft.operators.ApproxQuantile.exactQuantiles(d, "grp", "v", qs)
      .collect().map(r => r.getString(0) ->
        (1 to qs.size).map(i => Option(r.get(i)).map(_.asInstanceOf[Double]))).toMap
    val want = d.groupBy(col("grp")).agg(
        rnd(expr("percentile(v, 0.0)"), 6).as("p00"),
        rnd(expr("percentile(v, 0.05)"), 6).as("p05"),
        rnd(expr("percentile(v, 0.5)"), 6).as("p50"),
        rnd(expr("percentile(v, 0.95)"), 6).as("p95"),
        rnd(expr("percentile(v, 1.0)"), 6).as("p100"))
      .collect().map(r => r.getString(0) ->
        (1 to qs.size).map(i => Option(r.get(i)).map(_.asInstanceOf[Double]))).toMap
    assert(got.keySet === want.keySet, "every group must appear exactly once")
    for (g <- want.keySet; i <- qs.indices)
      assert(got(g)(i) === want(g)(i),
        s"group $g quantile ${qs(i)._1}: got ${got(g)(i)}, want ${want(g)(i)}")
  }

  test("exactQuantiles: a NULL group KEY is a group like any other (ADVICE r8)") {
    import org.apache.spark.sql.functions.{col, expr, round => rnd}
    // NULL-keyed group with VARIED values — the case the r8 advice flagged:
    // non-null-safe joins silently dropped it while the percentile
    // aggregate it mirrors keeps it
    val rows = Seq((Option.empty[String], 1.0), (Option.empty[String], 5.0),
      (Option.empty[String], 9.0), (Some("g"), 2.0), (Some("g"), 4.0))
    val d = rows.toDF("grp", "v")
    val qs = Seq("p25" -> 0.25, "p50" -> 0.5)
    val got = graft.operators.ApproxQuantile.exactQuantiles(d, "grp", "v", qs)
      .collect().map(r => Option(r.getString(0)) ->
        (1 to qs.size).map(i => r.getDouble(i))).toMap
    val want = d.groupBy(col("grp")).agg(
        rnd(expr("percentile(v, 0.25)"), 6).as("p25"),
        rnd(expr("percentile(v, 0.5)"), 6).as("p50"))
      .collect().map(r => Option(r.getString(0)) ->
        (1 to qs.size).map(i => r.getDouble(i))).toMap
    assert(got.keySet === want.keySet,
      "the NULL-keyed group must produce an output row")
    for (g <- want.keySet; i <- qs.indices)
      assert(got(g)(i) === want(g)(i), s"group $g ${qs(i)._1}")
    // propagation: winsorize exact == agg strategy on NULL-keyed rows,
    // and robustScale scales them instead of emitting NULL
    val wd = ((1 to 99).map(i => (Option.empty[String], i.toDouble)) :+
      (Option.empty[String], 10000.0)).toDF("grp", "v")
    val we = graft.operators.Cleanse.winsorize(wd, "grp", "v", bounds = "exact")
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    val wa = graft.operators.Cleanse.winsorize(wd, "grp", "v", bounds = "agg")
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    assert(we === wa, "exact and agg bounds must clamp NULL-keyed rows identically")
    assert(we(10000.0) < 10000.0, "the NULL-keyed outlier must actually clamp")
    val rs = graft.operators.Stats.robustScale(wd, "grp", "v")
      .collect().map(r => r.getDouble(1) -> Option(r.get(2))).toMap
    assert(rs(50.0).isDefined, "NULL-keyed rows must get a _robust value")
  }

  test("curriculumPhases: easy-first order, budget cuts, oversized doc gets its own phase") {
    val d = Seq(
      ("s", 1L, 10L), ("s", 2L, 10L), ("s", 3L, 10L), ("s", 4L, 10L),
      ("s", 5L, 50L),              // bigger than the budget: its own phase
      ("t", 6L, 5L))               // second group starts at phase 0
      .toDF("src", "id", "toks")
    val out = graft.operators.Sampling
      .curriculumPhases(d, "src", "id", "toks", "toks", phaseTokens = 20L)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    // order within s: toks asc, id asc -> ids 1,2,3,4,5; cum-excl 0,10,20,30,40
    assert(out(1L) === 0L && out(2L) === 0L, "first 20 tokens fill phase 0")
    assert(out(3L) === 1L && out(4L) === 1L, "next 20 tokens fill phase 1")
    assert(out(5L) === 2L, "the oversized doc opens phase 2 alone")
    assert(out(6L) === 0L, "each group starts at phase 0")
  }

  test("dupProfile: exact per-source counts and integer per-mille rate") {
    val d = Seq(
      (1L, "same text", "a"), (2L, "Same  TEXT", "a"), (3L, "other", "a"),
      (4L, "unique one", "b"), (5L, "unique two", "b"))
      .toDF("doc_id", "text", "source")
    val out = graft.operators.Dedup.dupProfile(d)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // source a: 3 docs, 2 distinct (case/whitespace fold), 1 dup, 333 permille
    assert(out("a") === ((3L, 2L, 1L, 333L)))
    assert(out("b") === ((2L, 2L, 0L, 0L)))
  }

  test("templateClusters: digit-variants collapse, singletons dropped, min-id rep") {
    val d = Seq(
      (10L, "price is 42 dollars"), (3L, "Price is  99 dollars"),
      (7L, "price is 1 dollars"),   // all one template (digits->0, ws/case fold)
      (8L, "something else"))       // singleton: dropped
      .toDF("doc_id", "text")
    val out = graft.operators.Dedup.templateClusters(d).collect()
    assert(out.length === 1, "exactly one cluster survives minDocs=2")
    assert(out.head.getLong(1) === 3L, "cluster size 3")
    assert(out.head.getLong(2) === 3L, "representative is the smallest doc id")
  }

  test("histogramQuantiles: estimate within one bucket width of the exact quantile") {
    val d = (1 to 1000).map(i => ("g", i.toDouble)).toDF("grp", "v")
    val out = graft.operators.ApproxQuantile.histogramQuantiles(
      d, "grp", "v", Seq("p50" -> 0.5, "p99" -> 0.99), buckets = 256).head()
    val width = (1000.0 - 1.0) / 256
    assert(math.abs(out.getDouble(1) - 500.0) <= width + 1e-6,
      s"p50 estimate ${out.getDouble(1)} off by more than a bucket")
    assert(math.abs(out.getDouble(2) - 990.0) <= width + 1e-6,
      s"p99 estimate ${out.getDouble(2)} off by more than a bucket")
    // constant group: min = max, skipped by construction (no histogram)
    val const = Seq(("c", 5.0), ("c", 5.0)).toDF("grp", "v")
    assert(graft.operators.ApproxQuantile.histogramQuantiles(
      const, "grp", "v", Seq("p50" -> 0.5)).count() === 0L)
    // NULL values: excluded from n and the buckets, like the exact
    // percentile — 40% NULLs must not drag the estimate toward low
    // quantiles (ceil(q·n) inflation + NULLS-FIRST cumulative padding)
    val withNulls = ((1 to 600).map(i => ("n", Some(i.toDouble))) ++
      (1 to 400).map(_ => ("n", Option.empty[Double]))).toDF("grp", "v")
    val nOut = graft.operators.ApproxQuantile.histogramQuantiles(
      withNulls, "grp", "v", Seq("p90" -> 0.9), buckets = 256).head()
    val nWidth = (600.0 - 1.0) / 256
    assert(math.abs(nOut.getDouble(1) - 540.0) <= nWidth + 1e-6,
      s"p90 over non-null values must be ~540, got ${nOut.getDouble(1)}")
  }

  test("blockedFuzzyJoin: finds within-distance pairs in the block, computes dist once") {
    val a = Seq((1L, "widget alpha"), (2L, "widget beta"), (3L, "gizmo gamma"))
      .toDF("id", "name")
    val b = Seq((10L, "widget alphax"), (30L, "gizmoo gamma"))
      .toDF("bid", "bname")
    val out = graft.operators.Joins.blockedFuzzyJoin(a, b, "name", "bname", maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(4))).toSet
    // widget alpha ~ widget alphax: dist 1, same 6-char block
    assert(out.contains((1L, 10L, 1L)))
    // gizmoo differs INSIDE the blocking prefix -> different block, missed
    // (the documented blocking-recall trade), and beta/alphax are dist > 1
    assert(out.size === 1, s"unexpected pairs: $out")
  }

  test("sessionize splits on the gap, aggregates exactly, dense session ids") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (10L, 1L, ts("2024-01-01 10:00:00")),
      (11L, 1L, ts("2024-01-01 10:10:00")), // 10 min: same session
      (12L, 1L, ts("2024-01-01 11:00:00")), // 50 min gap: new session
      (13L, 2L, ts("2024-01-01 09:00:00"))  // other user: own session
    ).toDF("event_id", "user_id", "ts")
    val out = graft.operators.Events.sessionize(ev, gapMinutes = 30)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_ix")) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("duration_sec"))).toMap
    assert(out === Map(
      (1L, 1L) -> (2L, 600L), // 10:00-10:10
      (1L, 2L) -> (1L, 0L),
      (2L, 1L) -> (1L, 0L)))
    // a gap of exactly 30 min does NOT split (strict >)
    val edge = Seq((1L, 1L, ts("2024-01-01 10:00:00")),
      (2L, 1L, ts("2024-01-01 10:30:00"))).toDF("event_id", "user_id", "ts")
    assert(graft.operators.Events.sessionize(edge, 30).count() === 1L)
  }

  test("bigramLogProb rewards corpus-typical word ORDER, not just tokens") {
    val d = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the mat"),
      (3L, "the cat sat on the mat"),
      (4L, "mat the on sat cat the") // same tokens, shuffled order
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogProb(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L)._1 === 5L, "6 tokens -> 5 transitions")
    assert(out(1L)._2 === out(2L)._2, "identical docs score identically")
    assert(out(1L)._2 > out(4L)._2,
      "shuffled word order must score below corpus-typical order")
    // the unigram score CANNOT separate docs 1 and 4 (same token bag)
    val uni = TextAnalysis.unigramLogProb(d).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(uni(1L) === uni(4L), "fixture: unigram is order-blind")
  }

  test("sourceOverlap: identical sources estimate 1.0, disjoint 0.0") {
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "s1"),
      (2L, "alpha beta gamma delta epsilon zeta", "s2"), // s2 == s1 content
      (3L, "one two three four five six seven", "s3")    // disjoint shingles
    ).toDF("doc_id", "text", "source")
    val out = Dedup.sourceOverlap(d, n = 3, k = 16)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_agree"), r.getAs[Double]("est_jaccard"))).toMap
    assert(out(("s1", "s2")) === (16L, 1.0), "equal shingle sets: all hashes agree")
    assert(out(("s1", "s3"))._1 === 0L, "disjoint sets: no min-hash collision at k=16")
    assert(out.size === 3, "all unordered source pairs present")
  }

  test("benfordAudit: first SIGNIFICANT digit, not the digit after 2dp rounding") {
    import graft.operators.Stats
    // 0.096 must read 9 (2dp rounding would turn it into 0.10 -> 1);
    // 1.996 must read 1 (rounding would read 2)
    val d = Seq(0.096, 1.996, 905.17, 0.004).toDF("x")
    val out = Stats.benfordAudit(d, "x")
      .filter(col("n_obs") > 0)
      .collect().map(r => r.getInt(0) -> r.getAs[Long]("n_obs")).toMap
    assert(out === Map(9 -> 2L, 1 -> 1L, 4 -> 1L), // 0.096 AND 905.17 read 9
      s"digits must come from the unrounded value: $out")
  }

  test("perplexityBuckets: transition-less docs surface with NULL band, not dropped") {
    val d = Seq(
      (1L, "alpha beta gamma alpha beta", "s1"),
      (2L, "beta gamma alpha beta gamma", "s1"),
      (3L, "single", "s1"),              // no bigram -> unscored
      (4L, null.asInstanceOf[String], "s1"))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.perplexityBuckets(d, nBuckets = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size === 4, "every corpus member gets a row")
    assert(out(3L).isNullAt(out(3L).fieldIndex("band")) &&
      out(4L).isNullAt(out(4L).fieldIndex("band")),
      "unscorable docs band NULL")
    assert(!out(1L).isNullAt(out(1L).fieldIndex("band")))
  }

  test("lengthBucketedBatches with a custom id column resolves (post-rename window)") {
    val d = (1L to 40L).map(i => (i, "tok " * i.toInt)).toDF("my_id", "text")
    val out = graft.operators.TextAnalysis
      .lengthBucketedBatches(d, bucketWidth = 8, batchSize = 4, idCol = "my_id")
    assert(out.count() === 40L)
  }

  test("lengthBucketedBatches bounds padding waste to the bucket width") {
    // 40 docs of 3 tokens, 40 of ~20 tokens: buckets must never mix them
    val d = ((1L to 40L).map(i => (i, "a b c")) ++
      (41L to 80L).map(i => (i, Seq.fill(17 + (i % 4).toInt)("w").mkString(" "))))
      .toDF("doc_id", "text")
    val out = TextAnalysis.lengthBucketedBatches(d, bucketWidth = 16, batchSize = 8)
      .collect()
    assert(out.length === 80)
    // every doc's padding waste is bounded by the bucket width
    assert(out.forall(r => r.getAs[Long]("padded_len") - r.getAs[Long]("n_tokens") < 16),
      "padding inside a batch must stay under one bucket width")
    // batches are full except at most one remainder per bucket
    val sizes = out.groupBy(r => (r.getAs[Long]("bucket"), r.getAs[Long]("batch_ix")))
      .map { case (k, rs) => k -> rs.length }
    sizes.groupBy(_._1._1).foreach { case (b, m) =>
      assert(m.values.count(_ != 8) <= 1, s"bucket $b has several partial batches: $m")
    }
    // partition-stable: same assignment under a different partitioning
    val again = TextAnalysis.lengthBucketedBatches(
      d.repartition(13), bucketWidth = 16, batchSize = 8)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("bucket"), r.getAs[Long]("batch_ix"))).toMap
    val first = out.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("bucket"), r.getAs[Long]("batch_ix"))).toMap
    assert(again === first)
  }

  test("sessionize matches a brute-force reference on randomized streams") {
    // deterministic pseudo-random fixture: 300 events over 20 users with
    // lumpy inter-arrival gaps straddling the 30-minute threshold
    val evs = (1 to 300).map { i =>
      val user = (i * 2654435761L % 20).abs
      val tsMs = 1700000000000L + user * 10000000L +
        ((i * 40503L % 97) * (i % 7 match { case 0 => 2400000L case _ => 200000L }))
      (i.toLong, user, new java.sql.Timestamp(tsMs))
    }
    val df = evs.toDF("event_id", "user_id", "ts")
    val got = graft.operators.Events.sessionize(df, gapMinutes = 30)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_ix")) ->
        (r.getAs[Long]("n_events"), r.getAs[java.sql.Timestamp]("session_start"),
          r.getAs[java.sql.Timestamp]("session_end"))).toMap
    // brute-force reference: per user, sort, split on gap > 30 min
    val expected = evs.groupBy(_._2).flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._3.getTime, e._1))
      val sessions = sorted.tail.foldLeft(List(List(sorted.head))) { (acc, e) =>
        if (e._3.getTime - acc.head.head._3.getTime > 1800000L) List(e) :: acc
        else (e :: acc.head) :: acc.tail
      }.reverse.map(_.reverse)
      sessions.zipWithIndex.map { case (s, ix) =>
        (u, ix + 1L) -> (s.size.toLong, s.head._3, s.last._3)
      }
    }.toMap
    assert(got === expected)
  }

  test("columnProfile: exact nulls (strings count empty-after-trim), distincts, ranges") {
    val d = Seq(
      (Some(1L), Some(2.0), "a"), (Some(1L), None, "  "),
      (None, Some(8.0), "b"), (Some(5L), Some(2.0), null)
    ).toDF("k", "v", "s")
    val out = graft.plans.Integrity.columnProfile(d, Seq("k", "v"), Seq("s"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Double]),
          Option(r.get(5)).map(_.asInstanceOf[Double]))).toMap
    assert(out("k") === (4L, 1L, 2L, Some(1.0), Some(5.0)))
    assert(out("v") === (4L, 1L, 2L, Some(2.0), Some(8.0)))
    // whitespace-only string counts as null; NULL excluded from distinct
    assert(out("s") === (4L, 2L, 3L, None, None))
  }

  test("tokenizeToIds: rank-ordered vocab, OOV -> 0, position-exact sequences") {
    val d = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat"),
      (3L, "zyx the")
    ).toDF("doc_id", "text")
    // corpus tf: the=4, sat=2, cat/dog/mat/on/zyx=1 → top-4 vocab by
    // (cnt desc, token asc): the=1, sat=2, cat=3, dog=4
    val out = TextAnalysis.tokenizeToIds(d, vocabSize = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Long](1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) === (Seq(1L, 3L, 2L, 0L, 1L, 0L), 6L, 2L)) // on, mat OOV
    assert(out(2L) === (Seq(1L, 4L, 2L), 3L, 0L))
    assert(out(3L) === (Seq(0L, 1L), 2L, 1L))
  }

  test("corrVerdict: exact strength decision, degenerate groups null out") {
    val d = ((1L to 50L).map(i => ("pos", i, 3 * i + 7)) ++      // corr = 1
      (1L to 50L).map(i => ("neg", i, 1000 - 2 * i)) ++          // corr = -1
      (1L to 50L).map(i => ("zig", i, (i % 2) * 10)) ++          // weak
      (1L to 50L).map(i => ("flat", 5L, i))                      // zero x-variance
      ).toDF("grp", "x", "y")
    val out = graft.operators.Stats.corrVerdict(
      d, "grp", org.apache.spark.sql.functions.col("x"),
      org.apache.spark.sql.functions.col("y"))
      .collect().map(r => r.getString(0) ->
        (Option(r.get(2)).map(_.asInstanceOf[Double]), r.getBoolean(3))).toMap
    assert(out("pos") === (Some(1.0), true))
    assert(out("neg") === (Some(-1.0), true), "verdict is on |corr|")
    assert(!out("zig")._2, s"near-zero correlation must not be strong: ${out("zig")}")
    assert(out("flat") === (None, false), "zero variance: corr undefined, never strong")
  }

  test("corrVerdict: rows with a NULL metric drop entirely (no mixed-population sums)") {
    import graft.operators.Stats
    // without the filter, n=3 would pair with y-sums over 2 rows and
    // corrupt the cross-products; with it the NULL row vanishes and the
    // remaining two points correlate exactly +1
    val d = Seq((1L, Some(1L), Some(2L)), (1L, Some(5L), Some(10L)),
      (1L, Some(9L), None)).map { case (g, x, y) =>
        (g, x.map(_.toLong), y.map(_.toLong)) }
      .toDF("g", "x", "y")
    val r = Stats.corrVerdict(d, "g", col("x"), col("y")).collect().head
    assert(r.getLong(1) === 2L, "n counts only both-non-null rows")
    assert(r.getDouble(2) === 1.0 && r.getBoolean(3))
  }

  test("corrVerdict: decimal overflow past the documented bound fails LOUDLY") {
    // 10 rows at ±7.07e8: each long sum fits (sxx ≈ 5e18 < 2^63), but
    // denx ≈ n·sxx ≈ 5e19 so denx·deny ≈ 2.5e39 overflows DECIMAL(38,0).
    // Under ANSI (Spark 4 default) the multiply itself throws; with ANSI
    // off it returns NULL and the explicit guard must raise instead — the
    // verdict must never silently become NULL in either mode.
    val big = 707000000L
    val d = (1L to 10L).map(i =>
      ("huge", if (i % 2 == 0) big else -big, if (i % 3 == 0) big else -big))
      .toDF("grp", "x", "y")
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    def run(): Unit = graft.operators.Stats.corrVerdict(d, "grp",
      org.apache.spark.sql.functions.col("x"),
      org.apache.spark.sql.functions.col("y")).collect()
    val ansiErr = intercept[Exception](run())
    assert(msgs(ansiErr).exists(_.contains("NUMERIC_VALUE_OUT_OF_RANGE")),
      s"ANSI mode must throw on the overflow itself, got: $ansiErr")
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val nonAnsiErr = intercept[Exception](run())
      assert(msgs(nonAnsiErr).exists(_.contains("corrVerdict: decimal overflow")),
        s"non-ANSI mode must hit the loud guard, got: $nonAnsiErr")
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("collocations: bound pairs get high PMI, grammatical glue low") {
    // "san francisco" always co-occurs (bound phrase); "the x" spreads
    // "the" across many successors (glue)
    val d = (1L to 10L).map(i =>
      (i, s"san francisco is the w$i of the q$i region today")).toDF("doc_id", "text")
    val out = TextAnalysis.collocations(d, minCount = 5)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out.contains(("san", "francisco")))
    val sf = out(("san", "francisco"))
    assert(sf._1 === 10L)
    assert(out.contains(("of", "the")))
    assert(sf._2 > out(("of", "the"))._2,
      s"bound phrase must out-PMI glue: $out")
    // every 'the'-successor pair is below minCount (w1..w10 distinct)
    assert(!out.keys.exists(_._1 == "the"), s"sub-minCount pairs must drop: ${out.keys}")
  }

  test("annIvfPq: all cells probed + lossless codebook = exact L2 ranks; shapes hold") {
    // dims=4, subspaces=2, integer-valued vectors so every rounded
    // distance is exact. codebookSize >= N makes the residual codebook
    // lossless (every residual is its own codeword: ADC distance
    // collapses to exact ||q - v||^2), and nProbe = nCells removes the
    // probe loss — so the approximate index must reproduce exact L2
    // top-k ranks bit-for-bit.
    val vecs = Seq(
      0L -> Array(0f, 0f, 0f, 0f), 1L -> Array(10f, 0f, 0f, 0f),
      2L -> Array(0f, 20f, 0f, 0f), 3L -> Array(1f, 1f, 0f, 0f),
      4L -> Array(9f, 1f, 0f, 0f), 5L -> Array(0f, 19f, 1f, 0f),
      6L -> Array(2f, 0f, 1f, 0f), 7L -> Array(11f, 2f, 0f, 1f),
      8L -> Array(1f, 21f, 0f, 0f), 9L -> Array(0f, 2f, 2f, 1f),
      10L -> Array(8f, 0f, 2f, 0f), 11L -> Array(2f, 18f, 0f, 2f))
    val emb = vecs.toDF("vec_id", "embedding")
    val out = graft.operators.Similarity.annIvfPq(
        emb.filter(col("vec_id") < 3), emb, k = 4, nCells = 3, nProbe = 3,
        dims = 4, subspaces = 2, codebookSize = 12)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank")) ->
        (r.getAs[Long]("neighbor_id"), r.getAs[Double]("approx_dist")))
      .toMap
    val all = vecs.toMap
    def l2(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
    for (q <- 0L to 2L) {
      val exact = all.keys.filter(_ != q).toSeq
        .sortBy(n => (l2(all(q), all(n)), n)).take(4)
      exact.zipWithIndex.foreach { case (n, ix) =>
        val (got, d) = out((q, ix + 1L))
        assert(got === n, s"query $q rank ${ix + 1}: got $got want $n")
        assert(d === l2(all(q), all(n)), s"ADC distance must be exact here")
      }
    }
    // ranks are contiguous 1..k and self never appears
    assert(out.keys.groupBy(_._1).forall(_._2.map(_._2).toSet == Set(1L, 2L, 3L, 4L)))
    assert(!out.exists { case ((q, _), (n, _)) => q == n })
  }

  test("charEntropy: hand-computed nats; empty and NULL text keep rows with NULL entropy") {
    val d = Seq(
      (1L, "aaaa"),           // one symbol -> H = 0
      (2L, "abab"),           // two even symbols -> H = ln 2
      (3L, "abcd"),           // uniform 4 -> H = ln 4
      (4L, ""),               // empty -> zero counts, NULL H
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextAnalysis.charEntropy(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    assert(out(1L) === ((4L, 1L, Some(0.0))))
    assert(out(2L) === ((4L, 2L, Some(0.693147))))
    assert(out(3L) === ((4L, 4L, Some(1.386294))))
    assert(out(4L) === ((0L, 0L, None)))
    assert(out(5L) === ((0L, 0L, None)))
  }

  test("bpeMerges: the classic Sennrich vocabulary replays by hand; partition-stable") {
    // {low:5, lower:2, newest:6, widest:3} with </w> markers:
    // r1 ties at 9 among (e,s),(s,t),(t,</w>) -> (e,s) by left asc -> "es"
    // r2 ties at 9 between (es,t),(t,</w>)    -> (es,t)            -> "est"
    // r3 (est,</w>) alone at 9                                     -> "est</w>"
    // r4 ties at 7 between (l,o),(o,w)        -> (l,o)
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val d = Seq((1L, text)).toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.bpeMerges(df, rounds = 4).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
        .sortBy(_._1)
    val got = run(d)
    assert(got === Seq(
      (1L, "e", "s", 9L),
      (2L, "es", "t", 9L),
      (3L, "est", "</w>", 9L),
      (4L, "l", "o", 7L)))
    // word frequencies are content-determined: a re-partitioned corpus
    // with the same words split across rows trains the identical table
    val d2 = Seq((1L, "low low low newest newest newest widest"),
      (2L, "low low lower newest newest newest widest widest lower"))
      .toDF("doc_id", "text").repartition(7)
    assert(run(d2) === got)
  }

  test("bpeSegment: post-merge symbol counts replay by hand; NULL text keeps a zero row") {
    // same Sennrich corpus -> merges es, est, est</w>, lo. Rewritten:
    // low = [lo, w, </w>] (3), lower = [lo, w, e, r, </w>] (5),
    // newest = [n, e, w, est</w>] (4), widest = [w, i, d, est</w>] (4).
    // 16 words, subwords 5*3+2*5+6*4+3*4 = 61, chars 5*3+2*5+6*6+3*6 = 79.
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val d = Seq((1L, text), (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = TextAnalysis.bpeSegment(d, rounds = 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    assert(out(1L) === ((16L, 61L, Some(BigDecimal(79.0 / 61)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))))
    assert(out(2L) === ((0L, 0L, None)))
  }

  test("zipfSlope: exact power-law fits -1, flat corpus fits 0, singleton NULL") {
    def rep(t: String, n: Int) = Seq.fill(n)(t).mkString(" ")
    val d = Seq(
      // counts 12/6/4/3 = 12/r^1 -> log-log collinear with slope -1
      (1L, "zipf", s"${rep("a", 12)} ${rep("b", 6)} ${rep("c", 4)} ${rep("d", 3)}"),
      // equal counts -> y constant -> slope exactly 0
      (2L, "flat", s"${rep("p", 5)} ${rep("q", 5)} ${rep("r", 5)}"),
      // one type -> denominator 0 -> NULL
      (3L, "one", rep("x", 9)))
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis.zipfSlope(d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    val (nZ, topZ, slopeZ) = out("zipf")
    assert(nZ === 4L && topZ === 12L)
    assert(math.abs(slopeZ.get + 1.0) < 1e-4, s"power-law slope was $slopeZ")
    assert(out("flat") === ((3L, 5L, Some(0.0))))
    assert(out("one") === ((1L, 9L, None)))
  }

  test("sourceKlDivergence: hand-computed directed divergences; identical sources give 0") {
    // X = {a:2, b:1}, Y = {a:1, b:3}; V = 2; na1 = 5, nb1 = 6 (smoothed).
    val d = Seq((1L, "X", "a a b"), (2L, "Y", "a b b b"), (3L, "Z", "a a b"))
      .toDF("doc_id", "source", "text")
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def ln6(x: Double) = r6(math.log(x))
    // replicate the exact double shape: (decimal sum + na1*(ln nb1 - ln na1)) / na1
    def kl(ca: Map[String, Long], cb: Map[String, Long], v: Long): Double = {
      val na1 = ca.values.sum + v; val nb1 = cb.values.sum + v
      val toks = (ca.keySet ++ cb.keySet).toSeq
      val s = toks.map { t =>
        val c1 = ca.getOrElse(t, 0L) + 1; val c2 = cb.getOrElse(t, 0L) + 1
        BigDecimal(c1) * (BigDecimal(ln6(c1.toDouble)) - BigDecimal(ln6(c2.toDouble)))
      }.sum.toDouble
      r6((s + na1.toDouble * (ln6(nb1.toDouble) - ln6(na1.toDouble))) / na1)
    }
    val x = Map("a" -> 2L, "b" -> 1L); val y = Map("a" -> 1L, "b" -> 3L)
    val out = TextAnalysis.sourceKlDivergence(d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(out.size === 6, s"3 sources -> 6 ordered pairs: ${out.keys}")
    assert(out(("X", "Y")) === kl(x, y, 2))
    assert(out(("Y", "X")) === kl(y, x, 2))
    assert(out(("X", "Y")) !== out(("Y", "X")), "KL is directed")
    assert(out(("X", "Z")) === 0.0 && out(("Z", "X")) === 0.0,
      "identical distributions diverge by exactly 0")
    assert(out.values.forall(_ >= 0.0), s"KL must be non-negative: $out")
  }

  test("psi: hand-computed drift, zero for identical groups, NULLs excluded") {
    import graft.operators.Stats
    // A mass in low bins, B mass in high bins, C identical to A; one NULL
    // value must not move any distribution. Global span [0, 10], 4 bins.
    val d = Seq(
      ("A", Some(0.0)), ("A", Some(1.0)), ("A", Some(2.0)), ("A", Some(10.0)),
      ("B", Some(8.0)), ("B", Some(9.0)), ("B", Some(10.0)), ("B", Some(0.0)),
      ("C", Some(0.0)), ("C", Some(1.0)), ("C", Some(2.0)), ("C", Some(10.0)),
      ("C", None)).toDF("grp", "v")
    val out = Stats.psi(d, "grp", "v", bins = 4).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(out.size === 6, s"3 groups -> 6 ordered pairs: ${out.keys}")
    // hand replay: bin = least(3, floor(x*4/10)); A/C = {0:3, 3:1}, B = {0:1, 3:3}
    def r(x: Double, s: Int) = BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    def ln6(x: Double) = r(math.log(x), 6)
    def psiOf(ca: Map[Int, Long], cb: Map[Int, Long]): Double = {
      val na1 = ca.values.sum + 4.0; val nb1 = cb.values.sum + 4.0
      val s = (0 until 4).map { i =>
        val c1 = ca.getOrElse(i, 0L) + 1; val c2 = cb.getOrElse(i, 0L) + 1
        BigDecimal(r((c1 / na1 - c2 / nb1) *
          (BigDecimal(ln6(c1.toDouble)) - BigDecimal(ln6(na1)) -
            BigDecimal(ln6(c2.toDouble)) + BigDecimal(ln6(nb1))).toDouble, 12))
      }.sum.toDouble
      r(s, 6)
    }
    val a = Map(0 -> 3L, 3 -> 1L); val b = Map(0 -> 1L, 3 -> 3L)
    assert(out(("A", "B")) === psiOf(a, b))
    assert(out(("B", "A")) === psiOf(b, a))
    assert(out(("A", "C")) === 0.0 && out(("C", "A")) === 0.0,
      "identical distributions have PSI exactly 0 (NULL row excluded)")
    assert(out(("A", "B")) > 0.1, s"opposed distributions must flag: $out")
    // degenerate column: every value identical -> all mass in bin 0; with
    // equal group sizes the smoothed distributions coincide -> PSI 0
    // (unequal sizes keep a small smoothing residual by design)
    val deg = Seq(("A", 5.0), ("A", 5.0), ("B", 5.0), ("B", 5.0)).toDF("grp", "v")
    val dOut = Stats.psi(deg, "grp", "v", bins = 4).collect().map(_.getDouble(2))
    assert(dOut.forall(_ === 0.0), "single-point span puts all mass in bin 0")
    // a NULL group KEY is a real drift category — it must appear in the
    // grid with its own counts, not silently vanish (nor score as empty)
    val withNullGrp = Seq((Some("A"), 1.0), (Some("A"), 2.0),
      (None, 1.0), (None, 2.0)).map { case (g, v) => (g.orNull, v) }
      .toDF("grp", "v")
    val ng = Stats.psi(withNullGrp, "grp", "v", bins = 4).collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1))) -> r.getDouble(2))
      .toMap
    assert(ng.size === 2, s"A<->NULL both directions: ${ng.keys}")
    assert(ng((Some("A"), None)) === 0.0 && ng((None, Some("A"))) === 0.0,
      "identical distributions: the NULL group's counts must actually join")
  }

  test("expectations audit: NULL counts as violation; uniqueness + key-complete split") {
    import graft.operators.Expectations.{audit, Rule}
    val d = Seq(
      (Some(1L), Some(1), Some(10.0)),  // clean
      (Some(1L), Some(1), Some(20.0)),  // pk duplicate of row 1
      (Some(2L), None,    Some(-5.0)),  // NULL key component + range violation
      (Some(3L), Some(1), None),        // NULL value -> range rule violates
      (Some(4L), Some(2), Some(30.0))). // clean
      toDF("k1", "k2", "v")
    val out = audit(d, Seq(Rule("v_nonneg", col("v") >= 0)),
        uniqueKeys = Seq("pk" -> Seq("k1", "k2")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(out("v_nonneg") === ((5L, 2L, false)),
      "the negative AND the NULL value both violate the range rule")
    assert(out("pk") === ((5L, 2L, false)),
      "both rows of the colliding key tuple count as violations")
    assert(out("pk_key_complete") === ((5L, 1L, false)),
      "the NULL key component is its own failure mode, not a dup")
    // all-clean suite passes
    val clean = audit(d.filter(col("k1") === 4L),
      Seq(Rule("v_nonneg", col("v") >= 0)), Seq("pk" -> Seq("k1", "k2")))
    assert(clean.collect().forall(_.getBoolean(3)))
    intercept[IllegalArgumentException](audit(d, Nil, Nil))
    // duplicate rule names would fan out the (batch_id, rule) streaming
    // MERGE on replay — rejected at suite construction
    intercept[IllegalArgumentException](audit(d,
      Seq(Rule("pk", col("v") >= 0)), Seq("pk" -> Seq("k1"))))
    intercept[IllegalArgumentException](audit(d,
      Seq(Rule("pk_key_complete", col("v") >= 0)), Seq("pk" -> Seq("k1"))))
  }

  test("ngramNovelty: verbatim copy scores 0, fresh text 1, mixed doc exact fraction") {
    val ref = Seq((10L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val probe = Seq(
      (1L, "the quick brown fox"),            // all 2 trigrams seen -> 0.0
      (2L, "entirely novel words here now"),  // 3 trigrams, none seen -> 1.0
      (3L, "the quick brown zebra"),          // 2 trigrams, 1 seen -> 0.5
      (4L, "too short")).                     // < 3 tokens: no rate row
      toDF("doc_id", "text")
    val out = graft.operators.Dedup.ngramNovelty(probe, ref, 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out === Map(
      1L -> ((2L, 2L, 0.0)),
      2L -> ((3L, 0L, 1.0)),
      3L -> ((2L, 1L, 0.5))))
    assert(!out.contains(4L), "docs with no n-gram have no defined rate")
  }

  test("embeddingCovariance + PCA: hand-computed triangle, power iteration finds the axis") {
    import graft.operators.Stats
    // points t·(1,2) for t in {-2,-1,1,2}: mean 0, cov = [[2.5,5],[5,10]]
    val pts = Seq(-2.0, -1.0, 1.0, 2.0).zipWithIndex
      .map { case (t, i) => (i.toLong, Seq(t.toFloat, (2 * t).toFloat)) }
    val d = pts.toDF("vec_id", "embedding")
    val cov = Stats.embeddingCovariance(d, 2)
    val entries = cov.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(entries === Map(
      (1L, 1L) -> ((4L, 2.5)), (1L, 2L) -> ((4L, 5.0)), (2L, 2L) -> ((4L, 10.0))))
    val (vec, lambda) = Stats.pcaTopComponent(cov, 2)
    val expected = Array(1.0 / math.sqrt(5), 2.0 / math.sqrt(5))
    assert(vec.zip(expected).forall { case (a, b) => math.abs(a - b) < 1e-9 },
      s"eigenvector was ${vec.toSeq}")
    assert(math.abs(lambda - 12.5) < 1e-9, s"eigenvalue was $lambda")
    assert(vec(1) > 0, "sign canonicalized: max-|x| entry positive")
    // projection scores = t·sqrt(5), rounded to 6
    val scores = Stats.pcaProject(d, vec).orderBy("vec_id")
      .collect().map(_.getDouble(2))
    val s5 = math.sqrt(5)
    scores.zip(Seq(-2 * s5, -s5, s5, 2 * s5)).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-5, s"score $a vs $b") }
    // NULL vectors skipped, ragged dims fail LOUDLY
    val withNull = d.union(Seq((9L, null.asInstanceOf[Seq[Float]])).toDF("vec_id", "embedding"))
    assert(Stats.embeddingCovariance(withNull, 2).collect().forall(_.getLong(2) === 4L))
    val ragged = Seq((1L, Seq(1.0f)), (2L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception](Stats.embeddingCovariance(ragged, 2).collect())
    assert(e.getMessage.contains("expected 2 dims") ||
      e.getCause != null && e.getCause.getMessage.contains("expected 2 dims"))
  }

  test("kCenters: farthest-point traversal replays by hand; duplicates never re-select") {
    import graft.operators.Similarity
    val pts = Seq(
      (1L, Seq(0.0f, 0.0f)), (2L, Seq(10.0f, 0.0f)), (3L, Seq(0.0f, 6.0f)),
      (4L, Seq(10.0f, 0.0f)), // exact duplicate of id 2
      (5L, Seq(5.0f, 0.0f)),
      (9L, null.asInstanceOf[Seq[Float]])).toDF("vec_id", "embedding")
    val out = Similarity.kCenters(pts, 4).orderBy("center_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))
    // seed = max norm (100 ties id2/id4 -> lowest id); then d2 curve 136, 36, 25
    assert(out.toSeq === Seq(
      (1L, 2L, None), (2L, 3L, Some(136.0)), (3L, 1L, Some(36.0)),
      (4L, 5L, Some(25.0))))
    assert(out.map(_._3).flatten.toSeq === out.map(_._3).flatten.toSeq.sorted.reverse,
      "coverage-radius curve is non-increasing")
    // k beyond distinct points: the duplicate is the only candidate left
    val all = Similarity.kCenters(pts, 10).collect()
    assert(all.length === 5 && all.map(_.getLong(1)).toSet === Set(1L, 2L, 3L, 4L, 5L))
    // empty corpus
    assert(Similarity.kCenters(pts.filter(col("vec_id") > 100), 3).collect().isEmpty)
  }

  test("seasonalDecompose: pure weekly pattern has zero interior residual") {
    import graft.operators.TimeSeries
    // 21 contiguous days, total(d) = 100 + p[d mod 7]: constant trend,
    // pure weekly seasonality -> every full-frame residual is exactly 0
    val p = Seq(0.0, 7.0, 14.0, -7.0, -14.0, 3.5, -3.5) // sums to 0 -> mp = 0
    val rows = (0 until 21).map { d =>
      val day = java.time.LocalDate.of(2024, 1, 1).plusDays(d)
      ("clicks", java.sql.Timestamp.valueOf(day.atTime(12, 0)),
        100.0 + p(day.toEpochDay.toInt % 7))
    }
    val out = TimeSeries.seasonalDecompose(
        rows.toDF("event_type", "ts", "value"), "event_type", "ts", "value")
      .orderBy("day").collect()
    assert(out.length === 21)
    val interior = out.slice(3, 18)
    assert(interior.forall(r => r.getDouble(4) === 100.0),
      "interior trend is the constant 100 (each frame sees each weekday once)")
    interior.foreach { r =>
      val dow = r.getLong(2).toInt
      assert(r.getDouble(5) === p(dow), s"seasonal(dow=$dow) = p value")
      assert(r.getDouble(6) === 0.0, s"interior residual must be 0, got $r")
    }
    // edge days: no full frame -> NULL trend and residual, seasonal still joined
    val edges = out.take(3) ++ out.drop(18)
    assert(edges.forall(r => r.isNullAt(4) && r.isNullAt(6) && !r.isNullAt(5)))
  }

  test("knnLabelAgreement: planted mislabel flags suspect; unlabeled rows serve but aren't audited") {
    import graft.operators.Similarity
    // cluster A (label 0) near (1,0); cluster B (label 1) near (0,1);
    // id 9 sits in cluster A but is labeled 1 (the planted mislabel);
    // id 10 sits in cluster B unlabeled.
    def v(x: Double, y: Double) = Seq(x.toFloat, y.toFloat)
    val emb = Seq(
      (1L, v(1.0, 0.0), Some(0)), (2L, v(0.95, 0.05), Some(0)),
      (3L, v(0.9, 0.1), Some(0)), (4L, v(0.85, 0.15), Some(0)),
      (5L, v(0.0, 1.0), Some(1)), (6L, v(0.05, 0.95), Some(1)),
      (7L, v(0.1, 0.9), Some(1)), (8L, v(0.15, 0.85), Some(1)),
      (9L, v(0.92, 0.08), Some(1)),       // mislabeled: body in A
      (10L, v(0.08, 0.92), None)).toDF("vec_id", "embedding", "label")
    val cents = Seq((100L, v(1.0, 0.0)), (200L, v(0.0, 1.0)))
      .toDF("cell", "cvec")
    val out = Similarity.knnLabelAgreement(emb, k = 3, nCells = 2, nProbe = 1,
        centroids = Some(cents)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getBoolean(5))).toMap
    assert(!out.contains(10L), "unlabeled rows are not audited")
    val (l9, n9, same9, agr9, susp9) = out(9L)
    assert(l9 === 1L && susp9, s"planted mislabel must flag suspect: ${out(9L)}")
    assert(same9 === 0L && agr9 === 0.0, "all of id 9's neighbors are cluster A")
    Seq(1L, 2L, 3L, 4L).foreach { id =>
      assert(!out(id)._5, s"clean cluster-A member $id must not be suspect: ${out(id)}")
    }
    // id 10 serves as a neighbor in cluster B: some B member counts it
    // (n_same < n_neighbors) while still agreeing with the B majority
    Seq(5L, 6L, 7L, 8L).foreach { id =>
      assert(!out(id)._5, s"clean cluster-B member $id must not be suspect: ${out(id)}")
    }
    assert(Seq(5L, 6L, 7L, 8L).exists(id => out(id)._3 < out(id)._2),
      "the unlabeled neighbor dilutes someone's agreement without flipping the verdict")
  }

  test("autocorrelation: alternating series scores exactly -1 at lag 1, +1 at lag 2; gaps pair nothing") {
    import graft.operators.TimeSeries
    val rows = (0 until 14).map { d =>
      val day = java.time.LocalDate.of(2024, 3, 1).plusDays(d)
      ("m", java.sql.Timestamp.valueOf(day.atTime(9, 0)),
        if (d % 2 == 0) 10.0 else 20.0)
    }
    val out = TimeSeries.autocorrelation(
        rows.toDF("event_type", "ts", "value"), "event_type", "ts", "value",
        maxLag = 3)
      .collect().map(r => r.getLong(1) -> (r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    assert(out(1L) === ((13L, Some(-1.0))), "perfect alternation anti-correlates at lag 1")
    assert(out(2L) === ((12L, Some(1.0))), "period-2 series correlates exactly at lag 2")
    assert(out(3L) === ((11L, Some(-1.0))))
    // calendar pairing: a hole in the series removes exactly the pairs
    // that would straddle it — no silent row-shift alignment
    val gappy = rows.zipWithIndex.filter(_._2 != 7).map(_._1)
    val g = TimeSeries.autocorrelation(
        gappy.toDF("event_type", "ts", "value"), "event_type", "ts", "value",
        maxLag = 1)
      .collect().head
    assert(g.getLong(2) === 11L, "13 pairs minus the two straddling the missing day")
    // constant series: zero variance -> NULL acf
    val const = (0 until 6).map { d =>
      ("c", java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2024, 3, 1).plusDays(d).atTime(9, 0)), 5.0)
    }
    val c = TimeSeries.autocorrelation(
        const.toDF("event_type", "ts", "value"), "event_type", "ts", "value",
        maxLag = 1).collect().head
    assert(c.isNullAt(3), "constant series has no defined correlation")
  }

  test("triangleCounts: K4 members sit in 3 triangles each, chains in none; input order irrelevant") {
    import graft.operators.Dedup
    // K4 on {1,2,3,4} (some edges reversed + one duplicate), chain 10-11-12
    val edges = Seq(
      (1L, 2L), (3L, 1L), (1L, 4L), (2L, 3L), (4L, 2L), (3L, 4L),
      (2L, 1L), // duplicate, reversed
      (10L, 11L), (12L, 11L)).toDF("doc_a", "doc_b")
    val out = Dedup.triangleCounts(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      s"each K4 vertex is in C(3,2)=3 triangles; chain nodes in none: $out")
    assert(out.values.sum === 12L, "4 triangles x 3 vertices")
  }

  test("groupKFold: whole groups share a fold; NULL groups get NULL; folds cover 0..k-1") {
    import graft.operators.Sampling
    val d = (1L to 400L).map(i => (i, s"g${i % 37}"))
      .toDF("id", "grp")
      .union(Seq((999L, null.asInstanceOf[String])).toDF("id", "grp"))
    val out = Sampling.groupKFold(d, "grp", 5)
    val byGroup = out.filter(col("grp").isNotNull)
      .groupBy("grp").agg(countDistinct(col("fold")).as("nf"))
      .collect().map(_.getLong(1))
    assert(byGroup.forall(_ === 1L), "a group must never straddle folds")
    val folds = out.filter(col("grp").isNotNull)
      .select("fold").distinct().collect().map(_.getLong(0)).toSet
    assert(folds.subsetOf((0L until 5L).toSet) && folds.size >= 4,
      s"37 groups should hit nearly all 5 folds: $folds")
    assert(out.filter(col("grp").isNull).collect().head.isNullAt(2),
      "NULL group -> NULL fold, never silently pooled")
    // partition-stability: fold is content-derived
    val re = Sampling.groupKFold(d.repartition(13), "grp", 5)
      .filter(col("id") === 7L).collect().head.getLong(2)
    assert(re === out.filter(col("id") === 7L).collect().head.getLong(2))
  }

  test("vocabStats: hand-counted hapax/dis/ttr per group") {
    val d = Seq(
      (1L, "A", "a a a b b c d"),      // counts a:3 b:2 c:1 d:1
      (2L, "B", "x x x x")).toDF("doc_id", "source", "text")
    val out = graft.operators.TextAnalysis.vocabStats(d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6))).toMap
    assert(out("A") === ((7L, 4L, 2L, 1L, 0.5, 0.571429)),
      s"A: 7 tokens, 4 types, hapax {c,d}, dis {b}: ${out("A")}")
    assert(out("B") === ((4L, 1L, 0L, 0L, 0.0, 0.25)),
      "repeated-token corpus has zero hapax rate — the template-mass signal")
  }

  test("mahalanobisScores: closed-form on axis-aligned data; cross-axis outlier ranks top") {
    import graft.operators.Stats
    // x-variance 4, y-variance 1, mean (0,0): m2((x,y)) = x²/4 + y²/1.
    // Balanced ± pairs keep the mean exactly 0 and the quantized cov exact.
    val base = Seq(
      (1L, 2.0, 0.0), (2L, -2.0, 0.0), (3L, 2.0, 0.0), (4L, -2.0, 0.0),
      (5L, 0.0, 1.0), (6L, 0.0, -1.0), (7L, 0.0, 1.0), (8L, 0.0, -1.0))
    val d = base.map { case (i, x, y) => (i, Seq(x.toFloat, y.toFloat)) }
      .toDF("vec_id", "embedding")
    val out = Stats.mahalanobisScores(d, 2, ridge = 0.0).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    base.foreach { case (i, x, y) =>
      val expect = x * x / 2.0 + y * y / 0.5 // var_x = 2, var_y = 0.5 from this sample
      assert(math.abs(out(i) - expect) < 1e-4, s"m2($i) = ${out(i)}, want $expect")
    }
    // a point far ACROSS the thin axis scores higher than one equally far
    // along the wide axis — the whole point of Mahalanobis
    val withOut = (base.map { case (i, x, y) => (i, Seq(x.toFloat, y.toFloat)) } ++
      Seq((100L, Seq(3.0f, 0.0f)), (101L, Seq(0.0f, 3.0f))))
      .toDF("vec_id", "embedding")
    val o = Stats.mahalanobisScores(withOut, 2).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(o(101L) > o(100L),
      s"equal Euclidean distance, but across the thin axis is more novel: $o")
    assert(o.maxBy(_._2)._1 === 101L)
    // singular covariance (constant dim) fails loudly at ridge 0, degrades at default
    val flat = Seq((1L, Seq(1.0f, 5.0f)), (2L, Seq(2.0f, 5.0f)), (3L, Seq(3.0f, 5.0f)))
      .toDF("vec_id", "embedding")
    intercept[IllegalArgumentException](Stats.mahalanobisScores(flat, 2, ridge = 0.0))
    assert(Stats.mahalanobisScores(flat, 2).collect().length === 3,
      "default ridge handles rank deficiency")
  }

  test("rfmSegments: aligned quintiles give 555/111 at the extremes; ties score low") {
    import graft.operators.Events
    def ts(day: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDate.of(2024, 1, day).atTime(12, 0))
    // user u has u events of value 10*u on day u: all three metrics align
    val rows = (1 to 5).flatMap { u =>
      (1 to u).map(i => (u.toLong, ts(u), 10.0 * u))
    }
    val out = Events.rfmSegments(rows.toDF("user_id", "ts", "value")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getString(7))).toMap
    // reference instant = day 5; recency: u5 -> 0 days, u1 -> 4 days
    assert(out(5L) === ((0L, 5L, 250.0, 5L, 5L, 5L, "555")),
      s"best user on every axis: ${out(5L)}")
    assert(out(1L) === ((4L, 1L, 10.0, 1L, 1L, 1L, "111")),
      s"worst user on every axis: ${out(1L)}")
    assert(out.values.forall { case (_, _, _, r, f, m, _) =>
      Seq(r, f, m).forall(s => s >= 1 && s <= 5) }, "scores stay in 1..5")
    // frequency-ties: equal metric values land in the same (lower) score
    val tied = Seq((1L, ts(1), 5.0), (2L, ts(1), 5.0), (3L, ts(1), 5.0))
      .toDF("user_id", "ts", "value")
    val t = Events.rfmSegments(tied).collect()
      .map(r => (r.getLong(4), r.getLong(5), r.getLong(6))).distinct
    // strict-greater puts ties in the LOW score; recency inverts (6 - low = 5)
    assert(t === Seq((5L, 1L, 1L)),
      s"identical users score identically — f/m low, recency high by inversion: $t")
  }

  test("dailyGrowth: new/returning split and the cumulative curve replay by hand") {
    import graft.operators.Events
    def ts(day: Int, h: Int = 9) = java.sql.Timestamp.valueOf(
      java.time.LocalDate.of(2024, 2, day).atTime(h, 0))
    val rows = Seq(
      (1L, ts(1)), (2L, ts(1)), (1L, ts(1, 15)), // day1: u1 u2 new (dup event)
      (1L, ts(2)), (3L, ts(2)),                  // day2: u1 returns, u3 new
      (2L, ts(4)), (3L, ts(4)), (4L, ts(4)))     // day4: two return, u4 new
      .toDF("user_id", "ts")
    val out = Events.dailyGrowth(rows.toDF("user_id", "ts")).orderBy("day")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq(
      ("2024-02-01", 2L, 2L, 0L, 2L),
      ("2024-02-02", 2L, 1L, 1L, 3L),
      ("2024-02-04", 3L, 1L, 2L, 4L)))
  }

  test("threeWaySplit: NULL keys get NULL split, never silently pooled into test") {
    import graft.operators.Sampling
    val d = Seq(Some(1L), Some(2L), None).map(Tuple1(_)).toDF("k")
    val out = Sampling.threeWaySplit(d, "k", 0.75, 0.125).collect()
      .map(r => Option(r.get(0)).map(_.asInstanceOf[Long]) -> Option(r.getString(1)))
      .toMap
    assert(out(None).isEmpty, "NULL key -> NULL split (route explicitly)")
    assert(out(Some(1L)).nonEmpty && out(Some(2L)).nonEmpty)
  }

  test("bpeMerges: a fully-merged corpus stops early instead of wiping the table") {
    // one repeated 2-char word fully merges in 2 rounds; asking for 6
    // must return those 2 rounds and keep the final symbol table intact
    val d = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    val merges = graft.operators.TextAnalysis.bpeMerges(d, rounds = 6)
    val rows = merges.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(rows.length === 2, s"only the real merges survive: ${rows.toSeq}")
    // segmentation still sees the merged corpus (the table wasn't wiped)
    val seg = graft.operators.TextAnalysis.bpeSegment(d, rounds = 6).collect()
    assert(seg.length === 1 && seg.head.getLong(2) === 3L,
      s"3 fully-merged subword tokens: ${seg.toSeq}")
  }

  test("psiQuantileBins: an outlier blinds equal-width bins but not quantile bins") {
    import graft.operators.Stats
    // A sits on 1..50, B on 51..100 — clearly shifted; one 1e9 outlier
    // stretches the equal-width grid until A and B share bin 0, while
    // the decile edges still separate them
    val rows = (1 to 50).map(v => ("A", v.toDouble)) ++
      (51 to 100).map(v => ("B", v.toDouble)) :+ (("B", 1e9))
    val d = rows.toDF("grp", "v")
    val wide = Stats.psi(d, "grp", "v", bins = 10).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val quant = Stats.psiQuantileBins(d, "grp", "v", bins = 10).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(wide(("A", "B")) < 0.1,
      s"equal-width grid is blinded by the outlier: $wide")
    assert(quant(("A", "B")) > 1.0,
      s"quantile bins keep resolving the shift: $quant")
    // identical groups still score 0 under quantile bins
    val same = (1 to 40).flatMap(v => Seq(("X", v.toDouble), ("Y", v.toDouble)))
      .toDF("grp", "v")
    val s0 = Stats.psiQuantileBins(same, "grp", "v", bins = 10).collect()
      .map(_.getDouble(2))
    assert(s0.forall(_ === 0.0), s"identical distributions: ${s0.toSeq}")
  }

  test("chiSquareDrift: hand-computed 2x2 table, zero on identical, NULL is a category") {
    import graft.operators.Stats
    // classic 2x2: A = 30x/10y, B = 10x/30y -> chi2 = N(ad-bc)^2/((a+b)(c+d)(a+c)(b+d))
    // = 80*800^2/40^4 = 20, dof = 1, V = sqrt(20/80) = 0.5
    val rows = Seq.fill(30)(("A", "x")) ++ Seq.fill(10)(("A", "y")) ++
      Seq.fill(10)(("B", "x")) ++ Seq.fill(30)(("B", "y"))
    val out = Stats.chiSquareDrift(rows.toDF("grp", "cat"), "grp", "cat")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out(("A", "B")) === ((20.0, 1L, 0.5)), s"hand value: $out")
    assert(out(("B", "A")) === ((20.0, 1L, 0.5)), "symmetric statistic")
    // identical distributions score exactly 0
    val same = (1 to 20).flatMap(i => Seq(("X", s"c${i % 4}"), ("Y", s"c${i % 4}")))
    val s0 = Stats.chiSquareDrift(same.toDF("grp", "cat"), "grp", "cat")
      .collect().map(r => (r.getDouble(2), r.getLong(3)))
    assert(s0.forall { case (chi, dof) => chi === 0.0 && dof === 3L }, s0.toSeq)
    // a NULL category is REAL drift: A all-labeled, B half-unlabeled
    val nulls = Seq.fill(20)(("A", "x")) ++
      Seq.fill(10)(("B", "x")) ++ Seq.fill(10)(("B", null: String))
    val nv = Stats.chiSquareDrift(nulls.toDF("grp", "cat"), "grp", "cat")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    // 2x2 with the NULL column: chi2 = 40*(20*10-0*10)^2/(20*20*30*10) = 40/3
    assert(math.abs(nv(("A", "B")) - 40.0 / 3) < 1e-5,
      s"NULL column participates with real counts: $nv")
  }

  test("giniConcentration: even spread is 0, one-group dominance is (n-1)/n") {
    import graft.operators.Stats
    def corpus(ws: Seq[Long]) = ws.zipWithIndex.flatMap { case (w, i) =>
      Seq((s"s$i", w)) }.toDF("src", "chars")
    val even = Stats.giniConcentration(corpus(Seq(5L, 5L, 5L, 5L)), "src", "chars")
      .collect().head
    assert((even.getLong(0), even.getLong(1), even.getDouble(2)) === ((4L, 20L, 0.0)))
    // all mass in one of 4 groups: G = (n-1)/n = 0.75
    val dom = Stats.giniConcentration(corpus(Seq(0L, 0L, 0L, 4L)), "src", "chars")
      .collect().head
    assert(dom.getDouble(2) === 0.75, s"max concentration: $dom")
    // hand value for (1, 3): mad = |1-3|*2 = 4 -> G = 4/(2*2*4) = 0.25
    val two = Stats.giniConcentration(corpus(Seq(1L, 3L)), "src", "chars")
      .collect().head
    assert(two.getDouble(2) === 0.25, s"hand gini: $two")
  }

  test("benfordAudit: digit extraction by hand, zeros/NULLs excluded, dense 1-9 rows") {
    import graft.operators.Stats
    // digits: 1.00->1, 19.99->1, 0.10->1 (leading SIGNIFICANT digit),
    // 2.50->2, -3.00->3 (abs); 0 and NULL are excluded
    val vals = Seq(Some(1.00), Some(19.99), Some(0.10), Some(2.50),
      Some(-3.00), Some(0.0), None)
    val out = Stats.benfordAudit(vals.map(Tuple1(_)).toDF("v"), "v")
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out.keySet === (1 to 9).toSet, "dense digit frame")
    assert(out(1)._1 === 3L && out(1)._2 === 0.6)
    assert(out(2)._1 === 1L && out(2)._2 === 0.2)
    assert(out(3)._1 === 1L && out(3)._2 === 0.2)
    assert((4 to 9).forall(d => out(d)._1 === 0L && out(d)._2 === 0.0))
    assert(out(1)._3 === 0.30103 && out(1)._4 === 0.29897, s"dev vs Benford: $out")
    assert(out(9)._3 === 0.045757)
  }

  test("jsDivergence: zero on identical, symmetric, bounded by ln 2 near disjoint") {
    import graft.operators.Stats
    // identical category mixes score exactly 0 (ln factors cancel)
    val same = (1 to 30).flatMap(i => Seq(("X", s"c${i % 3}"), ("Y", s"c${i % 3}")))
    val s0 = Stats.jsDivergence(same.toDF("grp", "cat"), "grp", "cat")
      .collect().map(_.getDouble(2))
    assert(s0.forall(_ === 0.0), s"identical mixes: ${s0.toSeq}")
    // disjoint mixes approach the ln 2 bound; statistic is symmetric
    val disj = Seq.fill(200)(("A", "only_a")) ++ Seq.fill(200)(("B", "only_b"))
    val dv = Stats.jsDivergence(disj.toDF("grp", "cat"), "grp", "cat")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(dv(("A", "B")) === dv(("B", "A")), "symmetric")
    assert(dv(("A", "B")) > 0.6 && dv(("A", "B")) <= math.log(2) + 1e-9,
      s"near the ln 2 = 0.693 bound: $dv")
    // a NULL category drives real divergence (half of B unlabeled)
    val nulls = Seq.fill(40)(("A", "x")) ++
      Seq.fill(20)(("B", "x")) ++ Seq.fill(20)(("B", null: String))
    val nv = Stats.jsDivergence(nulls.toDF("grp", "cat"), "grp", "cat")
      .collect().map(r => r.getDouble(2))
    assert(nv.forall(v => v > 0.1), s"NULL category counts as drift: ${nv.toSeq}")
  }

  test("temperatureRebalance flattens a skewed mixture and is partition-stable") {
    val rows = (1L to 900L).map(i => (i, if (i <= 800) "big" else "small")).toSeq
    val d = rows.toDF("id", "grp")
    val kept = graft.operators.Sampling.temperatureRebalance(d, "grp", "id", 120)
    val byGrp = kept.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // weights floor(sqrt): big 28, small 10 -> targets 120*28/38=88, 120*10/38=31
    assert(byGrp === Map("big" -> 88L, "small" -> 31L))
    // proportional allocation would have given big ~107 of 120: flattened
    val stable = graft.operators.Sampling
      .temperatureRebalance(d.repartition(17), "grp", "id", 120)
      .collect().map(_.getLong(0)).toSet
    assert(stable === kept.collect().map(_.getLong(0)).toSet,
      "selection is content-determined, not partition-determined")
  }

  test("quantileNormalize: hand-checked mapping onto the reference distribution") {
    val df = Seq(
      ("A", 10.0), ("A", 20.0), ("A", 30.0), ("A", 40.0), // the reference
      ("B", 1.0), ("B", 2.0), ("B", 3.0),                 // remapped
      ("C", 99.0)                                         // singleton
    ).toDF("g", "v")
      .union(Seq(("B", null.asInstanceOf[java.lang.Double]))
        .toDF("g", "v").select(col("g"), col("v").cast("double")))
    val out = operators.Stats.quantileNormalize(df, "g", "v", lit("A"), slots = 8)
      .collect().map(r => (r.getString(0), Option(r.get(1))) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    // B's ECDF positions 0 / 0.5 / 1 land on A's min / median / max:
    // p=0.5 -> r = 0.5*(4-1) = 1.5 -> 20 + 0.5*(30-20) = 25
    assert(out(("B", Some(1.0))) === Some(10.0))
    assert(out(("B", Some(2.0))) === Some(25.0))
    assert(out(("B", Some(3.0))) === Some(40.0))
    // a singleton group reads p = 0 -> the reference minimum
    assert(out(("C", Some(99.0))) === Some(10.0))
    // NULL values pass through NULL
    assert(out(("B", None)) === None)
    // the reference maps ~onto itself: within one slot's interpolation
    // error (slots=8 on 4 points), not exact — that's the S-slot contract
    val selfMapped = Seq(10.0, 20.0, 30.0, 40.0)
      .map(v => out(("A", Some(v))).get)
    selfMapped.zip(Seq(10.0, 20.0, 30.0, 40.0)).foreach { case (m, v) =>
      assert(math.abs(m - v) < 2.0, s"self-map $v -> $m drifted past slot error") }
    assert(selfMapped === selfMapped.sorted, "monotone transform")
    // an empty/absent reference group FAILS LOUDLY instead of silently
    // producing an empty frame (the r10 advisor finding)
    val ex = intercept[IllegalArgumentException] {
      operators.Stats.quantileNormalize(df, "g", "v", lit("ZZZ"), slots = 8)
    }
    assert(ex.getMessage.contains("reference group"), ex.getMessage)
  }

  test("edgeGrid: long-form grid matches brute-force order statistics per group") {
    // two varied groups with different sizes + a flat group + an all-NULL
    // group; values exact decimals so the grid is exact
    val rows =
      (1 to 37).map(i => ("a", BigDecimal(i * 3 % 41).setScale(6))) ++
      (1 to 11).map(i => ("b", BigDecimal(100 - i * 7).setScale(6))) ++
      Seq.fill(5)(("flat", BigDecimal(9).setScale(6))) ++
      Seq(("nul", null.asInstanceOf[BigDecimal]))
    val df = rows.toDF("g", "v").select(col("g"), col("v").cast("decimal(18,6)").as("v"))
    val slots = 8
    val out = operators.ApproxQuantile.edgeGrid(df, "g", "v", slots, buckets = 4)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getSeq[java.math.BigDecimal](2))).toMap
    // brute-force replay: e_i = vlo + ((i*(n-1)) mod S)/S * (vhi - vlo)
    def brute(vs: Seq[BigDecimal]): Seq[BigDecimal] = {
      val s = vs.sorted; val n = s.size
      (0 to slots).map { i =>
        val ilo = (i * (n - 1)) / slots
        val ihi = (i * (n - 1) + slots - 1) / slots
        val fr = BigDecimal((i * (n - 1)) % slots) / slots
        s(ilo) + fr * (s(ihi) - s(ilo))
      }
    }
    for (g <- Seq("a", "b")) {
      val vs = rows.filter(_._1 == g).map(_._2)
      val exp = brute(vs)
      val got = out(g)._2.map(BigDecimal(_))
      assert(out(g)._1 === vs.size.toLong)
      assert(got.size === slots + 1)
      got.zip(exp).zipWithIndex.foreach { case ((gv, ev), i) =>
        assert(gv === ev, s"group $g edge $i: $gv != $ev") }
    }
    assert(out("flat")._2.forall(e => BigDecimal(e) === BigDecimal(9)),
      "flat group repeats the constant")
    assert(out("nul")._2.forall(_ == null), "all-NULL group repeats NULL")
  }

  test("sparseCosinePairs: hand-checked TF-IDF cosine, df cap drops stop terms, df=1 prunes") {
    // 4 docs; "the" appears in all 4 (df=4 > maxDf=3 → stop-worded);
    // "unique" df=1 (in norms, never pairs); a/b share {apple, pie}
    val docs = Seq(
      (1L, "the apple pie apple"),
      (2L, "the apple pie"),
      (3L, "the banana split unique"),
      (4L, "the banana split")
    ).toDF("doc_id", "text")
    val out = operators.Dedup.sparseCosinePairs(docs, maxDf = 3, threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // hand replay: N=4, idf(t) = round(ln5,6) − round(ln(df+1),6)
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    val ln5 = r6(math.log(5))
    def idf(df: Int) = BigDecimal(ln5) - BigDecimal(r6(math.log(df + 1.0)))
    val iApple = idf(2); val iPie = idf(2); val iBan = idf(2)
    val iSplit = idf(2); val iUniq = idf(1)
    // doc1: apple tf2, pie tf1; doc2: apple 1, pie 1
    val dot12 = (2 * iApple) * (1 * iApple) + (1 * iPie) * (1 * iPie)
    val n1 = (2 * iApple).pow(2) + iPie.pow(2)
    val n2 = iApple.pow(2) + iPie.pow(2)
    val exp12 = r6(dot12.toDouble / (math.sqrt(n1.toDouble) * math.sqrt(n2.toDouble)))
    assert(out.keySet === Set((1L, 2L), (3L, 4L)),
      s"only same-fruit pairs can co-occur under the df policy: ${out.keySet}")
    assert(out((1L, 2L)) === exp12, s"hand cosine: ${out((1L, 2L))} vs $exp12")
    // doc3 vs doc4: identical over the PAIRABLE vocab, but doc3's norm
    // carries the df=1 'unique' term → cosine strictly below 1
    val dot34 = iBan.pow(2) + iSplit.pow(2)
    val n3 = iBan.pow(2) + iSplit.pow(2) + iUniq.pow(2)
    val exp34 = r6(dot34.toDouble / (math.sqrt(n3.toDouble) * math.sqrt(dot34.toDouble)))
    assert(out((3L, 4L)) === exp34 && out((3L, 4L)) < 1.0,
      s"df=1 terms must weigh the norm: ${out((3L, 4L))} vs $exp34")
    // identical docs (after the stop cap) score exactly 1
    val twin = Seq((1L, "x y z"), (2L, "x y z"), (3L, "filler")).toDF("doc_id", "text")
    val tw = operators.Dedup.sparseCosinePairs(twin, maxDf = 3, threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(tw((1L, 2L)) === 1.0)
  }

  test("packSequences: hand-checked layout; partition/range-width invariance") {
    // docs: 3 + 4 + 0 (blank) + 5 tokens, blockLen 4 →
    // stream |aaa b|bbb c|cccc| → doc 20 crosses the 4-token boundary
    val docs = Seq(
      (10L, "a a a"), (20L, "b b  b b"), (30L, "   "), (40L, "c c c c c"))
      .toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame, rw: Long) = operators.Packing
      .packSequences(d, "doc_id", "text", blockLen = 4, rangeWidth = rw)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)), Option(r.get(4)),
          Option(r.get(5)))).toMap
    val out = run(docs, 1L << 16)
    assert(out(10L) === ((3L, 0L, Some(0L), Some(0L), Some(false))))
    assert(out(20L) === ((4L, 3L, Some(0L), Some(1L), Some(true))))
    assert(out(30L) === ((0L, 7L, None, None, None)), "blank doc spans nothing")
    assert(out(40L) === ((5L, 7L, Some(1L), Some(2L), Some(true))))
    // layout is content-determined: shuffled partitions and a range width
    // that SPLITS the id space (rw=25 → range 0 holds docs 10/20, range 1
    // holds 30/40, exercising the cross-range offset) give the same map
    assert(run(docs.repartition(7), 1L << 16) === out)
    assert(run(docs, 25L) === out)
  }

  test("blockOccupancy: fills, doc counts and straddlers match the hand layout") {
    val docs = Seq(
      (10L, "a a a"), (20L, "b b  b b"), (30L, "   "), (40L, "c c c c c"))
      .toDF("doc_id", "text")
    // stream of 12 tokens over blocks [0,4) [4,8) [8,12):
    // doc10 [0,3) doc20 [3,7) doc40 [7,12)
    val occ = operators.Packing
      .blockOccupancy(docs, "doc_id", "text", blockLen = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(occ(0L) === ((2L, 4L, 1L)), "block 0: doc10 whole + doc20 head")
    assert(occ(1L) === ((2L, 4L, 2L)), "block 1: doc20 tail + doc40 head")
    assert(occ(2L) === ((1L, 4L, 1L)), "block 2: doc40 tail")
    assert(occ.values.map(_._2).sum === 12L, "every token lands exactly once")
  }

  test("jaccardSelfJoin: matches brute-force exact shingle Jaccard on a seeded fixture") {
    // seeded corpus with planted near-dups: base docs + token-appended
    // copies (appending ONE token adds one 3-gram -> J = s/(s+1) >= 0.6)
    val rnd = new scala.util.Random(42)
    val vocab = (0 until 60).map(i => s"w$i")
    def mkDoc(): Seq[String] =
      Seq.fill(8 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
    val bases = (0 until 30).map(i => (i.toLong, mkDoc()))
    val mutated = bases.take(12).map { case (i, ws) =>
      (100L + i, ws :+ vocab(rnd.nextInt(vocab.size)))
    }
    val all = bases ++ mutated :+ (999L -> Seq("a", "b")) // < 3 toks: no shingles
    val docsDf = all.map { case (i, ws) => (i, ws.mkString(" ")) }
      .toDF("doc_id", "text")
    val got = operators.SetSim.jaccardSelfJoin(docsDf, "doc_id", "text", 60)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // brute force over ALL pairs of distinct 3-gram shingle sets
    val sets = all.map { case (i, ws) =>
      i -> ws.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    }.toMap
    val exp = (for {
      a <- sets.keys; b <- sets.keys
      if a < b && sets(a).nonEmpty && sets(b).nonEmpty
      inter = (sets(a) & sets(b)).size.toLong
      uni = (sets(a) | sets(b)).size.toLong
      if inter * 160 >= 60 * (sets(a).size + sets(b).size)
    } yield (a, b) -> (inter, uni)).toMap
    assert(got === exp, s"prefix-filtered join != brute force " +
      s"(got ${got.size}, expected ${exp.size} pairs)")
    assert(exp.nonEmpty, "fixture must plant at least one qualifying pair")
    assert(got.keys.exists { case (a, b) => b == a + 100 },
      "at least one planted mutation pair survives the threshold")
    assert(!got.keys.exists { case (a, b) => a == 999L || b == 999L },
      "shingle-less short doc joins nothing")
  }

  test("nextFitPack: hand-checked bins, oversized isolation, invariances") {
    // capacity 10; range 0: 4,5,3,10,2 -> bins [4,5] [3] [10] [2]? walk:
    //   4 (fill 4), 5 (fill 9), 3 -> overflow -> bin1 (fill 3),
    //   10 -> overflow -> bin2 alone, 2 -> overflow -> bin3
    // range 1 (ids >= 20 at rangeWidth 20): starts fresh: 7,6 -> one bin
    val docs = Seq(
      (1L, "a a a a"), (2L, "b b b b b"), (3L, "c c c"),
      (4L, "d d d d d d d d d d"), (5L, "e e"), (6L, "   "),
      (21L, "f f f f f f f"), (22L, "g g g g g g"))
      .toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame, rw: Long) = operators.Packing
      .nextFitPack(d, "doc_id", "text", capacity = 10, rangeWidth = rw)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val out = run(docs, 20L)
    assert(out(1L) === ((4L, 0L, 0L)))
    assert(out(2L) === ((5L, 0L, 4L)))
    assert(out(3L) === ((3L, 1L, 0L)), "3 does not fit bin 0 (fill 9)")
    assert(out(4L) === ((10L, 2L, 0L)), "exact-capacity doc opens its own bin")
    assert(out(5L) === ((2L, 3L, 0L)), "bin 2 is full (fill 10)")
    assert(!out.contains(6L), "blank doc occupies no bin")
    assert(out(21L) === ((7L, 4L, 0L)), "new range starts a fresh bin")
    assert(out(22L) === ((6L, 5L, 0L)), "7 + 6 = 13 > 10 -> doc 22 overflows to bin 5")
    // partition-count invariance
    assert(run(docs.repartition(5), 20L) === out)
    // no bin holds more than capacity unless it is a single oversized doc
    val byBin = out.values.groupBy(_._2)
    byBin.foreach { case (bin, ds) =>
      val tot = ds.map(_._1).sum
      assert(tot <= 10L || ds.size == 1, s"bin $bin overfilled by splitable docs")
    }
  }

  test("contextWindow: newest-first budget fit, tie-break, zero-cost rows") {
    import java.sql.Timestamp
    val ev = Seq(
      // user 1: costs newest-first are 5 (id 14), 4 (id 13), 3 (id 12), 8 (id 11)
      (1L, 11L, Timestamp.valueOf("2024-01-01 10:00:00"), 8L),
      (1L, 12L, Timestamp.valueOf("2024-01-01 11:00:00"), 3L),
      (1L, 13L, Timestamp.valueOf("2024-01-01 12:00:00"), 4L),
      (1L, 14L, Timestamp.valueOf("2024-01-01 13:00:00"), 5L),
      // user 2: same ts -> id desc breaks the tie; zero-cost row rides free
      (2L, 21L, Timestamp.valueOf("2024-01-01 10:00:00"), 6L),
      (2L, 22L, Timestamp.valueOf("2024-01-01 10:00:00"), 0L),
      (2L, 23L, Timestamp.valueOf("2024-01-01 10:00:00"), 7L))
      .toDF("user_id", "event_id", "ts", "cost")
    val out = operators.Packing
      .contextWindow(ev, "user_id", "event_id", "ts", "cost", budget = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // user 1: 5, 5+4=9, 9+3=12 kept; +8 would be 20 -> dropped
    assert(out.keySet.filter(_._1 == 1L).map(_._2) === Set(14L, 13L, 12L))
    assert(out((1L, 14L)) === ((5L, 5L, 0L)))
    assert(out((1L, 12L)) === ((3L, 12L, 2L)), "exactly-at-budget row kept")
    // user 2 walks 23, 22, 21: 7, 7, 13 -> 21 dropped, free row kept
    assert(out.keySet.filter(_._1 == 2L).map(_._2) === Set(23L, 22L))
    assert(out((2L, 22L)) === ((0L, 7L, 1L)))
  }

  test("balancedShards: serpentine deal equals row_number replay; sums balanced") {
    val rows = (1L to 37L).map(i => (i, (i * 13 % 29) + 1)) // repeated weights
    val df = rows.toDF("doc_id", "w")
    val out = operators.Packing.balancedShards(df, "doc_id", "w", 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // replay: global rank by (w desc, id asc), serpentine onto 4 shards
    val ranked = rows.sortBy { case (id, w) => (-w, id) }.zipWithIndex
    val exp = ranked.map { case ((id, w), r) =>
      val pos = r % 4
      id -> ((w, if ((r / 4) % 2 == 0) pos.toLong else 3L - pos))
    }.toMap
    assert(out === exp, "distinct-weight offset decomposition != row_number")
    // serpentine balance: per-shard sums within one max weight
    val sums = out.values.groupBy(_._2).view.mapValues(_.map(_._1).sum).toMap
    val maxW = rows.map(_._2).max
    assert(sums.values.max - sums.values.min <= maxW,
      s"shard sums $sums spread past one max weight")
    // invariance to input partitioning
    val out2 = operators.Packing.balancedShards(df.repartition(7), "doc_id", "w", 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out2 === out)
  }

  test("materializeBlocks: block text reassembles the exact stream; round-trip") {
    val docs = Seq(
      (10L, "a a a"), (20L, "b b  b b"), (30L, "   "), (40L, "c c c c c"))
      .toDF("doc_id", "text")
    val out = operators.Packing
      .materializeBlocks(docs, "doc_id", "text", blockLen = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(0L) === ((2L, 4L, "a a a b")))
    assert(out(1L) === ((2L, 4L, "b b b c")))
    assert(out(2L) === ((1L, 4L, "c c c c")))
    // round-trip with distinct tokens: blocks in order == corpus in id order
    val docs2 = Seq(
      (1L, (1 to 3).map("t" + _).mkString(" ")),
      (2L, (4 to 7).map("t" + _).mkString(" ")),
      (3L, (8 to 13).map("t" + _).mkString(" ")))
      .toDF("doc_id", "text")
    val blocks = operators.Packing
      .materializeBlocks(docs2, "doc_id", "text", blockLen = 5)
      .collect().map(r => r.getLong(0) -> r.getString(3)).sortBy(_._1)
    assert(blocks.map(_._2).mkString(" ") === (1 to 13).map("t" + _).mkString(" "),
      "concatenated blocks must replay the corpus stream exactly")
    assert(blocks.last._2.split(" ").length === 3, "final partial block")
  }

  test("chunkDocuments: window/stride walk, tail clamp, blank docs dropped") {
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), // 10 toks, W=8 S=4 → 2 chunks
      (2L, "s1 s2 s3"),                       // fits one window
      (3L, null.asInstanceOf[String]),
      (4L, "  "))
      .toDF("doc_id", "text")
    val out = operators.Packing.chunkDocuments(docs, "doc_id", "text",
        window = 8, stride = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(out.keySet === Set((1L, 0L), (1L, 1L), (2L, 0L)))
    assert(out((1L, 0L)) === ((0L, 8L, "t1 t2 t3 t4 t5 t6 t7 t8")))
    assert(out((1L, 1L)) === ((4L, 6L, "t5 t6 t7 t8 t9 t10")),
      "last chunk clamps to the doc tail")
    assert(out((2L, 0L)) === ((0L, 3L, "s1 s2 s3")))
  }
}
