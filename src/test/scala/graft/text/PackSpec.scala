package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PackSpec extends SparkSpec {
  import spark.implicits._

  test("packedOffsets: exclusive prefix sum in id order") {
    val docs = Seq(
      (1, "a b c"),        // 3 tokens, offset 0
      (2, "d e"),          // 2 tokens, offset 3
      (3, ""),             // 0 tokens, offset 5
      (4, "f g h i j")     // 5 tokens, offset 5
    ).toDF("doc_id", "text")
    val out = Pack.packedOffsets(docs, budget = 4)
      .orderBy("doc_id")
      .select("doc_id", "n_tok", "tok_offset", "seq_id", "seq_offset")
      .collect().map(r =>
        (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
    assert(out.toSeq === Seq(
      (1, 3L, 0L, 0L, 0L),
      (2, 2L, 3L, 0L, 3L),
      (3, 0L, 5L, 1L, 1L),
      (4, 5L, 5L, 1L, 1L)))
  }

  test("packedOffsets: invariant to input partitioning") {
    val docs = (1 to 200).map(i => (i, ("tok " * (i % 7 + 1)).trim))
    val one = Pack.packedOffsets(docs.toDF("doc_id", "text")
        .repartition(1), budget = 64)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val many = Pack.packedOffsets(docs.toDF("doc_id", "text")
        .repartition(13), budget = 64)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(one === many)
    // last doc's offset + count = total corpus tokens
    val total = docs.map(_._2.split(" ").length.toLong).sum
    assert(one.last(2).asInstanceOf[Long] +
      one.last(1).asInstanceOf[Long] === total)
  }

  test("packedOffsets property: matches a local prefix sum on random sizes") {
    val rnd = new scala.util.Random(7)
    val docs = (1 to 500).map(i =>
      (i, ("t " * rnd.nextInt(40)).trim)) // includes empty docs
    val expected = docs.scanLeft((0, 0L, 0L)) { case ((_, off, n), (id, t)) =>
      (id, off + n, if (t.isEmpty) 0L else t.split(" ").length.toLong)
    }.drop(1).map { case (id, off, _) => id -> off }.toMap
    val out = Pack.packedOffsets(
        docs.toDF("doc_id", "text").repartition(7), budget = 128)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(out === expected)
  }

  test("tokenChunks: stride windows with a short tail, empty docs drop") {
    val docs = Seq(
      (1, "a b c d e f g"), // 7 tokens, size 4 stride 2 → starts 0,2,4,6
      (2, "")               // no chunks
    ).toDF("doc_id", "text")
    val out = Pack.tokenChunks(docs, size = 4, stride = 2)
      .orderBy("doc_id", "chunk_id")
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(out.toSeq === Seq(
      (0, 0, 4), (1, 2, 4), (2, 4, 3), (3, 6, 1)))
  }

  test("tokenChunks: chunk hashes equal hashes of the sliced text") {
    val docs = Seq((1, "w x y z w x")).toDF("doc_id", "text")
    val chunks = Pack.tokenChunks(docs, size = 3, stride = 3)
      .select("chunk_hash").as[Long].collect().toSeq
    val expected = Seq("w x y", "z w x")
      .toDF("t")
      .select(graft.dedup.Dedup.portableHash(col("t"))).as[Long]
      .collect().toSeq
    assert(chunks.sorted === expected.sorted)
  }
}
