package graft.search

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrigramSpec extends SparkSpec {
  import spark.implicits._

  test("postings are the distinct sliding trigrams, lowercased") {
    val docs = Seq((1L, "aBcD"), (2L, "xx"), (3L, "aaaa")).toDF("id", "t")
    val got = Trigram.postings(docs, "id", "t")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSet
    // doc 2 is below trigram length; doc 3's duplicate "aaa" collapses.
    assert(got == Set(1L -> "abc", 1L -> "bcd", 3L -> "aaa"))
  }

  test("wildcard search equals the brute-force contains scan") {
    val docs = Seq(
      (1L, "the merge part of the plan"),
      (2L, "merge parts everywhere"),       // superstring still matches
      (3L, "part merge inverted"),          // right trigrams, wrong order
      (4L, "MERGE PARTitioned"),            // case-insensitive
      (5L, "nothing here")).toDF("id", "t")
    val got = Trigram.wildcardSearch(docs, "id", "t", "merge part")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 4L))
  }

  test("verify step culls a doc containing all trigrams but not the pattern") {
    // pattern "abcdef" trigrams: abc bcd cde def — doc 2 has all four
    // (from "abcd" and "cdef") without the contiguous substring.
    val docs = Seq((1L, "xxabcdefyy"), (2L, "abcd bcde cdef")).toDF("id", "t")
    val got = Trigram.wildcardSearch(docs, "id", "t", "abcdef")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L))
    // and the candidate stage DID consider doc 2 (coverage, not luck):
    val tris = "abcdef".sliding(3).toSeq
    val cand = Trigram.postings(docs, "id", "t")
      .filter(col("tri").isin(tris: _*))
      .groupBy("id").agg(countDistinct("tri").as("h"))
      .filter(col("h") === tris.size)
      .collect().map(_.getLong(0)).toSet
    assert(cand == Set(1L, 2L))
  }
}
