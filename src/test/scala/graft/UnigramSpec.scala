package graft

import graft.operators.TextAnalysis

/** Unigram-LM tokenizer (hard-EM Viterbi): structural laws the oracle
  * rows can't see directly — segmentations must tile their words, the
  * coverage floor must hold, counts must reconcile with the final
  * E-step, and the whole train must be deterministic. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "low lower lowest low low"),
    (2L, "new newer newest new"),
    (3L, "low new lowest newer"),
    (4L, "abracadabra")
  ).toDF("doc_id", "text")

  test("segmentations tile their words; counts reconcile; floor holds") {
    val (pieces, segs) = TextAnalysis.unigramTrainCore(docs, nIters = 2,
      maxPieceLen = 4, minSeedCount = 2L, maxWordLen = 12, textCol = "text")
    val segRows = segs.collect()
    assert(segRows.nonEmpty)
    segRows.foreach { r =>
      val w = r.getAs[String]("w")
      val seg = r.getAs[scala.collection.Seq[String]]("seg")
      assert(seg.mkString("") === w, s"segmentation must tile '$w', got $seg")
    }
    val p = pieces.collect().map(r =>
      r.getAs[String]("piece") -> r.getAs[Long]("cnt")).toMap
    // coverage floor: every char of every model word is a piece
    val allChars = segRows.flatMap(_.getAs[String]("w").toSeq).map(_.toString).toSet
    allChars.foreach(c => assert(p.contains(c), s"char '$c' missing from vocab"))
    // counts reconcile: multi-char piece counts equal freq-weighted usage
    val usage = segRows.flatMap { r =>
      val f = r.getAs[Long]("freq")
      r.getAs[scala.collection.Seq[String]]("seg").map(_ -> f)
    }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    p.filter(_._1.length > 1).foreach { case (piece, cnt) =>
      assert(usage.getOrElse(piece, 0L) === cnt,
        s"multi-char piece '$piece' count must equal its Viterbi usage")
    }
    // no unused multi-char pieces survive the M-step
    assert(p.keys.filter(_.length > 1).forall(usage.contains))
  }

  test("frequent subwords become pieces; logp normalizes; train is deterministic") {
    val out = TextAnalysis.unigramPieces(docs)
    val p = out.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(p.map(_._1).exists(_.length > 1),
      "the repeated 'low'/'new' stems must yield multi-char pieces")
    assert(p.forall(_._3 <= 0.0), "log-probs of a normalized model")
    val again = TextAnalysis.unigramPieces(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(p.toSet === again.toSet, "bit-identical across runs")
  }

  test("segment stats: model words only, zero-row membership, ratio") {
    val withLong = docs.union(Seq(
      (5L, "supercalifragilistic"), // 20 chars > maxWordLen: out of model
      (6L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val out = TextAnalysis.unigramSegment(withLong).collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("n_words"),
        r.getAs[Long]("n_pieces"), r.getAs[Any]("chars_per_piece")))).toMap
    assert(out.size === 6, "every doc keeps a row")
    assert(out(5L)._1 === 0L && out(5L)._3 === null,
      "an over-cap word is out of the model: zero counts, NULL ratio")
    assert(out(6L)._1 === 0L)
    assert(out(1L)._1 === 5L, "doc 1 has five model words")
    assert(out(1L)._2 >= out(1L)._1, "pieces at least one per word")
  }

  test("a corpus with NO model words: zero-count rows, never a resolution error") {
    // every token exceeds maxWordLen=12 → the word table is empty → the
    // pre-r16-review code handed segment a schemaless emptyDataFrame and
    // threw 'cannot resolve w' at plan time
    val d = Seq((1L, "supercalifragilistic expialidocious"),
      (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = TextAnalysis.unigramSegment(d).collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("n_words"),
        r.getAs[Any]("chars_per_piece")))).toMap
    assert(out === Map(1L -> ((0L, null)), 2L -> ((0L, null))))
    assert(TextAnalysis.unigramPieces(d).isEmpty)
  }
}
