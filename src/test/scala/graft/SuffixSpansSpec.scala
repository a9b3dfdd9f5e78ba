package graft

import graft.operators.Dedup

/** suffixRepeatSpans ⟷ duplicateSpans equivalence: two constructions of
  * the same contract (hash-doubling suffix blocks vs windowed shingle
  * hashes) must agree bit-for-bit at every minLen, and the doubling path
  * must find the short repeats a larger windowed n provably misses. */
class SuffixSpansSpec extends SparkSpec {
  import spark.implicits._

  // planted repeats: a 5-token phrase shared by docs 1/2 (cross-doc), a
  // doc-internal 3-token echo in doc 3, a long 9-token repeat in docs
  // 4/5, and unique filler everywhere else
  private val docs = Seq(
    (1L, "u1 u2 the quick brown fox jumps u3 u4 u5"),
    (2L, "v1 the quick brown fox jumps v2 v3 v4 v5 v6"),
    (3L, "w1 alpha beta gamma w2 w3 alpha beta gamma w4"),
    (4L, "x1 one two three four five six seven eight nine x2"),
    (5L, "y1 y2 one two three four five six seven eight nine"),
    (6L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10")
  ).toDF("doc_id", "text")

  private def spans(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getAs[Long]("span_start"),
      r.getAs[Long]("span_end"), r.getAs[Long]("span_tokens"))).toSet

  test("bit-for-bit equivalence with duplicateSpans at minLen 2, 3, 5, 8") {
    for (l <- Seq(2, 3, 5, 8)) {
      val sa = spans(Dedup.suffixRepeatSpans(docs, minLen = l))
      val win = spans(Dedup.duplicateSpans(docs, n = l))
      assert(sa === win, s"constructions disagree at minLen=$l")
      assert(sa.nonEmpty || l > 9, s"fixture must exercise minLen=$l")
    }
  }

  test("finds the short repeats a larger windowed n provably misses") {
    assert(spans(Dedup.duplicateSpans(docs.filter($"doc_id" <= 3), n = 8)).isEmpty,
      "the 5- and 3-token repeats are invisible at n=8 (the documented bound)")
    val sa = spans(Dedup.suffixRepeatSpans(docs.filter($"doc_id" <= 3), minLen = 3))
    // doc 1: 'the quick brown fox jumps' at tokens 3..7 (1-based)
    assert(sa.contains((1L, 3L, 7L, 5L)))
    assert(sa.contains((2L, 2L, 6L, 5L)))
    // doc 3: 'alpha beta gamma' at 2..4 and 7..9 — gap 5 > minLen keeps
    // the two islands separate
    assert(sa.contains((3L, 2L, 4L, 3L)) && sa.contains((3L, 7L, 9L, 3L)))
  }

  test("power-of-two minLen takes the off=0 fast path; end truncation never matches a full block") {
    // doc A's last 4 tokens equal doc B's first 4; doc C ends with the
    // same 3-token PREFIX of that phrase (a truncated window) — at
    // minLen=4 only the full 4-token repeat may surface
    val d = Seq(
      (10L, "f1 f2 p q r s"),
      (11L, "p q r s f3 f4"),
      (12L, "f5 f6 f7 p q r")
    ).toDF("doc_id", "text")
    val sa = spans(Dedup.suffixRepeatSpans(d, minLen = 4))
    assert(sa === Set((10L, 3L, 6L, 4L), (11L, 1L, 4L, 4L)),
      "doc 12's 3-token tail must not join the 4-token class")
    assert(sa === spans(Dedup.duplicateSpans(d, n = 4)))
  }
}
