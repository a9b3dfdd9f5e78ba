package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.{Packing, SetSim}

/** Property-based coverage of the round-11 layout/set-similarity family:
  * random corpora evaluated through the REAL operators on DataFrames,
  * checked against in-memory reference replays of the declared semantics
  * (not against a re-derivation of the implementation). Deterministic
  * seeded ScalaCheck generators. */
class PackingPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] = {
    val params = Gen.Parameters.default
    Iterator.iterate(Seed(seed))(_.next)
      .map(s => g.pureApply(params, s)).take(n).toSeq
  }

  /** Random corpus: unique ids with gaps, docs of 0..30 tokens over a
    * small vocabulary (collisions guaranteed), some blank/null —
    * including TAB/NEWLINE-only blanks, the class an ASCII-space trim
    * guard would leak phantom tokens for. */
  private def corpus(seed: Long, nDocs: Int = 60,
                     vocab: Int = 12): Seq[(Long, String)] = {
    val lens = samples(Gen.chooseNum(0, 30), nDocs, seed)
    val gaps = samples(Gen.chooseNum(1L, 40L), nDocs, seed + 1)
    val words = samples(Gen.chooseNum(0, vocab - 1), nDocs * 30, seed + 2)
    val ids = gaps.scanLeft(0L)(_ + _).tail
    ids.zip(lens.zipWithIndex.map { case (len, i) =>
      if (len == 0) (i % 4 match {
        case 0 => null
        case 1 => "   "
        case 2 => "\t\t"
        case _ => " \n \t "
      })
      else (0 until len).map(k => s"w${words(i * 30 + k)}").mkString(" ")
    })
  }

  private def nToks(text: String): Long =
    if (text == null || text.replaceAll("\\s", "").isEmpty) 0L
    else text.trim.toLowerCase.split("\\s+").length.toLong

  test("packSequences: tok_start is the exact running sum in id order; spans consistent") {
    for (seed <- Seq(7L, 19L)) {
      val docs = corpus(seed)
      val out = Packing.packSequences(docs.toDF("doc_id", "text"),
          "doc_id", "text", blockLen = 16, rangeWidth = 64L)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      var run = 0L
      docs.sortBy(_._1).foreach { case (id, text) =>
        val n = nToks(text)
        assert(out(id) === ((n, run)), s"seed $seed doc $id")
        run += n
      }
    }
  }

  test("blockOccupancy: every token lands exactly once; no block overfilled") {
    for (seed <- Seq(11L, 23L)) {
      val docs = corpus(seed)
      val occ = Packing.blockOccupancy(docs.toDF("doc_id", "text"),
          "doc_id", "text", blockLen = 16, rangeWidth = 64L)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val total = docs.map(t => nToks(t._2)).sum
      assert(occ.values.map(_._2).sum === total, s"seed $seed token conservation")
      assert(occ.values.forall(_._2 <= 16L), s"seed $seed block overfill")
      // dense block ids 0..last, full everywhere except possibly the last
      val last = occ.keys.max
      assert(occ.keySet === (0L to last).toSet, s"seed $seed dense blocks")
      (0L until last).foreach(b =>
        assert(occ(b)._2 === 16L, s"seed $seed non-final block $b not full"))
    }
  }

  test("nextFitPack: replayed by a sequential in-memory walk; no splittable overfill") {
    for (seed <- Seq(3L, 31L)) {
      val docs = corpus(seed)
      val cap = 20L
      val rw = 64L
      val out = Packing.nextFitPack(docs.toDF("doc_id", "text"),
          "doc_id", "text", capacity = cap, rangeWidth = rw)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      // reference replay of the DECLARED semantics (per-range next-fit in
      // id order, fresh bin per range, global ids by range prefix sum)
      val byRange = docs.filter(d => nToks(d._2) > 0).sortBy(_._1)
        .groupBy(d => d._1 / rw).toSeq.sortBy(_._1)
      var boff = 0L
      val exp = scala.collection.mutable.Map.empty[Long, (Long, Long, Long)]
      byRange.foreach { case (_, ds) =>
        var fill = 0L; var lbin = -1L
        ds.foreach { case (id, text) =>
          val n = nToks(text)
          if (lbin < 0 || fill + n > cap) { lbin += 1; fill = 0L }
          exp(id) = (n, boff + lbin, fill)
          fill += n
        }
        boff += lbin + 1
      }
      assert(out === exp.toMap, s"seed $seed layout mismatch")
      // invariant: no bin of splittable docs exceeds capacity
      out.toSeq.groupBy(_._2._2).foreach { case (bin, ds) =>
        val tot = ds.map(_._2._1).sum
        assert(tot <= cap || ds.size == 1, s"seed $seed bin $bin overfilled")
      }
    }
  }

  test("tab/newline-only docs are blank: zero tokens, no chunks, no bins") {
    val df = Seq((1L, "\t"), (2L, "a b c"), (3L, " \n "), (4L, null: String))
      .toDF("doc_id", "text")
    val packed = Packing.packSequences(df, "doc_id", "text", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(packed === Map(1L -> 0L, 2L -> 3L, 3L -> 0L, 4L -> 0L),
      "whitespace-class blanks must pin to 0 tokens, not phantom \"\" tokens")
    assert(Packing.chunkDocuments(df, "doc_id", "text", 2, 1)
      .filter(col("doc_id") =!= 2L).count() === 0L)
    assert(Packing.nextFitPack(df, "doc_id", "text", 10, 1024)
      .filter(col("doc_id") =!= 2L).count() === 0L)
  }

  test("contextWindow: a NULL cost counts as 0 and cannot break the prefix") {
    val df = Seq(
      ("u", 3L, 3, null.asInstanceOf[java.lang.Long]), // newest, null cost
      ("u", 2L, 2, java.lang.Long.valueOf(100L)),
      ("u", 1L, 1, java.lang.Long.valueOf(250L)))
      .toDF("user", "id", "ts", "cost")
    val out = Packing.contextWindow(df, "user", "id", "ts", "cost", 300)
      .orderBy(col("turns_back")).collect()
    // kept rows must be the newest-first PREFIX: e3 (0-cost) then e2
    assert(out.map(_.getLong(1)).toSeq === Seq(3L, 2L),
      "null-cost newest row stays; the prefix property holds")
    assert(out.head.getAs[Long]("turns_back") === 0L)
  }

  test("balancedShards: NULL weights land on exactly one shard, never vanish") {
    val df = Seq((1L, java.lang.Long.valueOf(5L)), (2L, null.asInstanceOf[java.lang.Long]),
      (3L, java.lang.Long.valueOf(9L)), (4L, null.asInstanceOf[java.lang.Long]))
      .toDF("doc_id", "w")
    val out = Packing.balancedShards(df, "doc_id", "w", 2).collect()
    assert(out.length === 4, "every row sharded, null weights included")
    assert(out.map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L, 4L))
    out.foreach(r => assert(r.getAs[Long]("shard") >= 0 && r.getAs[Long]("shard") < 2))
  }

  test("jaccardSelfJoin: equals brute-force shingle Jaccard on random corpora") {
    for ((seed, tau) <- Seq((5L, 50), (13L, 70))) {
      // duplicate-heavy corpus: half the docs are near-copies
      val base = corpus(seed, nDocs = 40, vocab = 8)
        .filter(d => nToks(d._2) >= 3)
      val dups = base.take(base.size / 2).map { case (id, t) =>
        (id + 10000L, t + " w0") }
      val all = base ++ dups
      val got = SetSim.jaccardSelfJoin(all.toDF("doc_id", "text"),
          "doc_id", "text", tau)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      val sets = all.map { case (id, t) =>
        id -> t.trim.toLowerCase.split("\\s+").toSeq
          .sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
      }.toMap
      val exp = (for {
        a <- sets.keys; b <- sets.keys
        if a < b && sets(a).nonEmpty && sets(b).nonEmpty
        inter = (sets(a) & sets(b)).size.toLong
        uni = (sets(a) | sets(b)).size.toLong
        if inter * (100 + tau) >= tau * (sets(a).size + sets(b).size)
      } yield (a, b) -> (inter, uni)).toMap
      assert(got === exp,
        s"seed $seed tau $tau: ${got.size} found vs ${exp.size} expected")
      assert(exp.nonEmpty, s"seed $seed must generate qualifying pairs")
    }
  }
}
