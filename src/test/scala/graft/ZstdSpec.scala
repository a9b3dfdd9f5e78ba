package graft

import graft.operators.Compressed

/** Compressed.zstdMemberSplit — the §7.4 #7 gated leg lifted: frame
  * boundaries, skippable frames, the taxonomy, and the re-slice
  * round-trip that proves (offset, comp_len) are real ranged-read
  * coordinates (the gunzipMemberSplit convention). */
class ZstdSpec extends SparkSpec {

  private def z(s: String): Array[Byte] =
    Compressed.compressAs("zstd", s.getBytes("UTF-8"))

  test("multi-frame shard splits with boundaries; each slice decompresses alone") {
    val texts = Seq("first record", "second, a bit longer record", "")
    val shard = texts.map(z).reduce(_ ++ _)
    val members = Compressed.zstdMemberSplit(shard).get
    assert(members.map(m => new String(m.data, "UTF-8")) === texts)
    members.foreach { m =>
      val slice = shard.slice(m.offset.toInt, (m.offset + m.compLen).toInt)
      val alone = Compressed.zstdMemberSplit(slice).get
      assert(alone.length === 1 &&
        alone.head.data.sameElements(m.data),
        "the (offset, comp_len) span is a self-contained frame")
    }
    assert(members.map(_.offset) ===
      members.map(_.compLen).scanLeft(0L)(_ + _).init,
      "frames tile the shard exactly")
  }

  test("skippable frames are skipped, not members; dict-frame layout parses") {
    // RFC 8878 §3.1.2: magic 0x184D2A50 + LE size + opaque content —
    // the slot .warc.zst uses for its dictionary
    val skip = Array[Byte](0x50, 0x2a, 0x4d, 0x18, 4, 0, 0, 0, 9, 9, 9, 9)
    val shard = skip ++ z("after the skippable")
    val members = Compressed.zstdMemberSplit(shard).get
    assert(members.length === 1)
    assert(new String(members.head.data, "UTF-8") === "after the skippable")
    assert(members.head.offset === 12L, "offset is the DATA frame's start")
  }

  test("taxonomy: truncation, garbage, wrong magic, empty, null") {
    val good = z("payload")
    assert(Compressed.zstdMemberSplit(good.dropRight(3)) === None,
      "truncated final frame")
    assert(Compressed.zstdMemberSplit(good ++ Array[Byte](1, 2, 3)) === None,
      "trailing garbage")
    assert(Compressed.zstdMemberSplit("not zstd at all".getBytes) === None)
    assert(Compressed.zstdMemberSplit(Array.empty[Byte]) === None)
    assert(Compressed.zstdMemberSplit(null) === None)
    val skipOnly = Array[Byte](0x50, 0x2a, 0x4d, 0x18, 0, 0, 0, 0)
    assert(Compressed.zstdMemberSplit(skipOnly) === None,
      "a shard of only skippable frames has no members")
  }

  test("warc walkShard routes .warc.zst through the same record reader") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq((0L, "alpha body"), (1L, "beta body"), (2L, "gamma"))
      .toDF("doc_id", "text")
    val gz = operators.Warc.warcRecordFeatures(
      operators.Warc.synthWarcShards(docs, "doc_id", "text"))
      .collect().sortBy(r => (r.shard_id, r.member_idx))
    val zs = operators.Warc.warcRecordFeatures(
      operators.Warc.synthWarcShards(docs, "doc_id", "text", codec = "zstd"))
      .collect().sortBy(r => (r.shard_id, r.member_idx))
    assert(gz.length === 3 && zs.toSeq === gz.toSeq,
      "record rows are codec-invariant — the §7.4 #7 slots-in promise")
  }

  test("jsonlLines: frame batches, escaped content newlines, malformed-line visibility") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (0L, "plain body", "en"),
      (1L, "line one\nline two \"quoted\"", "de"), // newline + quotes must escape
      (2L, "tercero", "es"),
      (3L, "quatre", "fr"),
      (4L, "fifth doc, second frame", "en"))
      .toDF("doc_id", "text", "lang")
    val lines = operators.Compressed.jsonlLines(
      operators.Compressed.synthJsonlZstdShards(docs, shardSize = 8,
        linesPerFrame = 4)).collect()
    assert(lines.length === 5 && lines.forall(_.ok === 1L))
    assert(lines.count(_.member_idx === 0L) === 4 &&
      lines.count(_.member_idx === 1L) === 1, "4 lines per frame, then spill")
    val parsed = operators.Compressed.jsonlLines(
      operators.Compressed.synthJsonlZstdShards(docs))
      .toDF()
      .withColumn("j", from_json(col("line"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "id BIGINT, text STRING, lang STRING")))
      .select(col("j.id"), col("j.text"), col("j.lang"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(parsed(1L) === (("line one\nline two \"quoted\"", "de")),
      "content newline and quotes round-trip through the JSON escape")
    assert(parsed.keySet === Set(0L, 1L, 2L, 3L, 4L))
    // a malformed line stays visible: its row exists, the struct is NULL
    val bad = operators.Compressed.compressAs("zstd",
      "{\"id\": 7, \"text\": \"ok\"}\nnot json at all".getBytes("UTF-8"))
    val badRows = operators.Compressed.jsonlLines(
      graft.operators.Multimodal.toAssets(
        Seq((0L, bad)).toDF("asset_id", "payload"),
        "asset_id", "payload", "application/jsonl+zstd"))
      .toDF()
      .withColumn("j", from_json(col("line"),
        org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, text STRING")))
      .select(col("line_idx"), col("j.id")).collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(badRows(0L) === Some(7L) && badRows(1L) === None,
      "malformed JSON line: row kept, parsed struct NULL — never vanishes")
  }
}
