package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (3L, "completely different content about database engines and columnar storage"),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank"))
    .toDF("doc_id", "text")

  test("exact dedup groups verbatim duplicates only") {
    val g = Dedup.exactDupGroups(base).collect()
    assert(g.length == 1)
    assert(g.head.getAs[Long]("cnt") == 2)
    assert(g.head.getAs[Long]("keep_id") == 1)
  }

  test("minhash LSH finds the planted near-dup pair, not the distinct doc") {
    val pairs = Dedup.minHashNearDups(base, shingleN = 3, numHashes = 12,
        rowsPerBand = 3, threshold = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 4L))) // exact dup = jaccard 1
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("incremental near-dup equals the full run's delta-touching subset") {
    val delta = Seq(
      (11L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (12L, "completely different content about database engines and columnar stores"))
      .toDF("doc_id", "text")
    val inc = Dedup.incrementalNearDups(base, delta, shingleN = 3,
        numHashes = 12, rowsPerBand = 3, threshold = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val full = Dedup.minHashNearDups(base.unionByName(delta), shingleN = 3,
        numHashes = 12, rowsPerBand = 3, threshold = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
      .filter(p => p._1 >= 11L || p._2 >= 11L)
    assert(inc === full)
    assert(inc.contains((1L, 11L)), "delta copy must hit the old index")
    assert(inc.contains((3L, 12L)), "near-dup of an old doc must verify")
  }

  test("admission index is versioned: same fingerprint re-registers, a " +
      "refresh commits a new version, a pinned probe is stable across " +
      "the refresh, and vacuum retires old generations") {
    val tag = "dspec" + System.nanoTime()
    val root = s"/tmp/graft_admission_$tag"
    val delta = Seq(
      (21L, "the quick brown fox jumps over the lazy dog near the river bank"))
      .toDF("doc_id", "text")
    def probe(t: (String, String)) =
      Dedup.probeAdmissionIndex(spark.table(t._1), spark.table(t._2),
        delta).select("a", "b").as[(Long, Long)].collect().toSet
    val t1 = Dedup.stageAdmissionIndex(base, tag, sourceMtime = 1L)
    assert(t1._1.endsWith("_v1"), t1._1)
    val p1 = probe(t1)
    assert(p1.contains((1L, 21L)))
    // unchanged fingerprint: metadata-only, same version
    assert(Dedup.stageAdmissionIndex(base, tag, 1L) == t1)
    assert(graft.store.Versioned.latestVersion(root) == 1L)
    // corpus grew → refresh = an OBSERVABLE new commit
    val grown = base.unionByName(Seq((5L,
      "the quick brown fox jumps over the lazy dog near the river bank today too"))
      .toDF("doc_id", "text"))
    val t2 = Dedup.stageAdmissionIndex(grown, tag, sourceMtime = 2L)
    assert(t2._1.endsWith("_v2"), t2._1)
    assert(probe(t2).contains((5L, 21L)), "latest sees the new member")
    // a probe PINNED to generation 1 is untouched by the refresh
    assert(probe(Dedup.admissionIndexAt(spark, tag, 1L)) == p1)
    // retention: vacuum retires generation 1; generation 2 survives
    val (nDel, _) = graft.store.Versioned.vacuum(root, 2L)
    assert(nDel > 0)
    intercept[IllegalArgumentException] {
      graft.store.Versioned.files(root, 1L)
    }
    assert(probe(t2).contains((5L, 21L)))
  }

  test("jaccard of identical docs is 1, disjoint docs 0") {
    val sh = Dedup.shingleTable(base, 3)
    val j = Dedup.jaccard(Seq((1L, 4L), (1L, 3L)).toDF("a", "b"), sh)
      .select("a", "b", "jaccard").as[(Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(j((1L, 4L)) == 1.0)
    assert(j((1L, 3L)) == 0.0)
  }

  test("simhash: near-dups close in hamming, distinct docs far") {
    val sh = Dedup.simHash(base).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(sh(1L) == sh(4L))
    assert(ham(sh(1L), sh(2L)) < ham(sh(1L), sh(3L)))
  }

  test("simHashNearDups returns exact hamming for banded candidates") {
    val out = Dedup.simHashNearDups(Dedup.simHash(base), maxHamming = 3)
      .select("a", "b", "hamming").as[(Long, Long, Int)].collect()
    assert(out.exists(r => r._1 == 1L && r._2 == 4L && r._3 == 0))
  }

  test("wide single-shuffle minhash/bands equal the long-format API") {
    // 5 hashes with rowsPerBand = 2 also exercises the trailing
    // partial band ([mh4] alone) both formats must agree on.
    val sh = Dedup.shingleTable(base, 2)
    val wide = Dedup.minHashesWide(sh, numHashes = 5, "doc_id")
    val longMh = Dedup.minHashes(base, shingleN = 2, numHashes = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    wide.collect().foreach { r =>
      val id = r.getLong(0)
      (0 until 5).foreach { j =>
        assert(r.getLong(1 + j) == longMh((id, j)), s"mh$j of doc $id")
      }
    }
    val wideBands = Dedup.lshBandsWide(wide, rowsPerBand = 2,
        numHashes = 5, "doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val longBands = Dedup.lshBands(
        Dedup.minHashes(base, shingleN = 2, numHashes = 5), rowsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(wideBands === longBands)
  }

  test("portable hash matches the DuckDB construction") {
    // CAST(('0x' || substring(md5('abc'),1,15)) AS BIGINT) = 648541476951500027
    val h = Seq("abc").toDF("s")
      .select(Dedup.portableHash(col("s"))).as[Long].head()
    assert(h == 648541476951500027L)
  }

  test("winnowing: shared k+w-1 token runs share a fingerprint") {
    // k=3, w=4: any shared run of 6 tokens must yield >=1 common
    // fingerprint (the Schleimer et al. guarantee).
    val sharedRun = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, s"one two three $sharedRun four five six seven"),
      (2L, s"red blue green yellow $sharedRun purple orange pink"),
      (3L, "completely different words with no overlap at all here okay")
    ).toDF("doc_id", "text")
    val fps = Dedup.winnow(docs, k = 3, w = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty, "shared run must share a fingerprint")
    assert((fps(1L) & fps(3L)).isEmpty, "disjoint docs must not collide")
    // Density: winnowing keeps roughly 2/(w+1) of hashes — far fewer
    // than one fingerprint per shingle.
    val doc1Shingles = 13 - 2 // 13 tokens, k=3
    assert(fps(1L).size < doc1Shingles)
  }

  test("winnowing ignores trailing partial windows") {
    // 6 tokens -> 4 shingles -> exactly one full window of w=4.
    val docs = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val fps = Dedup.winnow(docs, k = 3, w = 4).collect()
    assert(fps.length == 1, fps.mkString(","))
  }

  test("decontaminate counts distinct shared n-grams per training doc") {
    val evalSet = Seq((100L, "the quick brown fox jumps"))
      .toDF("doc_id", "text")
    val train = Seq(
      // shares "the quick brown" and "quick brown fox"
      (1L, "lazy dog sees the quick brown fox now"),
      // no 3-gram overlap
      (2L, "completely unrelated words right here"),
      // the shared 3-gram occurs twice but counts once (distinct grams)
      (3L, "the quick brown then the quick brown")
    ).toDF("doc_id", "text")
    val out = Dedup.decontaminate(train, evalSet, n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 2L, 3L -> 1L)) // clean doc 2 absent
  }

  test("decontaminate broadcasts the eval gram set") {
    val evalSet = Seq((100L, "a b c")).toDF("doc_id", "text")
    val train = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val plan = Dedup.decontaminate(train, evalSet, n = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("duplicateSpans counts cross-doc duplicated gram positions") {
    // doc 1 ≡ doc 4 (13 tokens → 9 5-gram spans, all duplicated);
    // doc 2 = doc 1 + "today" (10 spans: the first 9 match doc 1's, the
    // last one is unique); doc 3 is disjoint (9 tokens → 5 clean spans).
    val out = Dedup.duplicateSpans(base, n = 5)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((9L, 9L)))
    assert(out(4L) == ((9L, 9L)))
    assert(out(2L) == ((10L, 9L)))
    assert(out(3L) == ((5L, 0L)))
  }

  test("duplicateSpans counts within-doc repeats and guards short docs") {
    val docs = Seq(
      // "a b c d e" repeats at positions 0 and 6 → both duplicated,
      // the 5 spans in between are unique (11 tokens → 7 spans)
      (1L, "a b c d e x a b c d e"),
      // shorter than n → zero spans, dup_frac 0 (no division blow-up)
      (2L, "too short")).toDF("doc_id", "text")
    val rows = Dedup.duplicateSpans(docs, n = 5).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(rows(1L) == ((7L, 2L, 2.0 / 7.0)))
    assert(rows(2L) == ((0L, 0L, 0.0)))
  }

  test("duplicateSpans broadcasts the duplicated-gram set") {
    val plan = Dedup.duplicateSpans(base, n = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("prefixFilterJoin finds EVERY pair above threshold (exact, no LSH miss)") {
    val out = Dedup.prefixFilterJoin(base, shingleN = 3, threshold = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    // brute-force truth on the hand corpus: 1≡4 (J=1), 1-2 and 2-4
    // differ by one trailing token (J ≈ 10/12), 3 is disjoint
    assert(out === Set((1L, 2L), (1L, 4L), (2L, 4L)))
  }

  test("prefixFilterJoin threshold tightens the result monotonically") {
    val strict = Dedup.prefixFilterJoin(base, shingleN = 3,
        threshold = 0.95)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(strict === Set((1L, 4L))) // only the verbatim duplicate
  }

  test("prefixFilterJoin jaccard values match the direct computation") {
    val j = Dedup.prefixFilterJoin(base, shingleN = 3, threshold = 0.5)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(j((1L, 4L)) == 1.0)
    // 13-token docs: 11 shingles; doc 2 has 12, sharing all 11
    assert(math.abs(j((1L, 2L)) - 11.0 / 12.0) < 1e-12)
  }

  test("rowwise minhash ≡ wide-aggregation minhash on every doc") {
    // the stream-safe per-row twin must be value-identical to the
    // aggregated batch path — band signatures (and therefore LSH
    // buckets) depend on exact equality, not approximation
    val wide = Dedup.minHashesWide(
        Dedup.shingleTable(base, 3), 12, "doc_id")
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val row = Dedup.minHashesRowwise(base, 3, 12)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(row === wide)
    // carry columns pass through untouched
    val carried = Dedup.minHashesRowwise(
      base.withColumn("tag", col("doc_id") * 10), 3, 12,
      carry = Seq("tag"))
    assert(carried.columns.toSeq ===
      "doc_id" +: "tag" +: (0 until 12).map(j => s"mh$j"))
    assert(carried.select("doc_id", "tag").as[(Long, Long)].collect()
      .forall(p => p._2 == p._1 * 10))
  }

  test("prefixFilterJoin restricted verify ≡ fused verify (both branches)") {
    // the size gate picks the branch by corpus count; force each branch
    // explicitly and require identical output — the restriction is a
    // physical-plan choice, never a semantic one
    def run(r: Boolean) = Dedup.prefixFilterJoin(base, shingleN = 3,
        threshold = 0.5, restrictVerify = Some(r))
      .as[(Long, Long, Double)].collect().toSet
    assert(run(true) === run(false))
    assert(run(true).map(p => (p._1, p._2)) ===
      Set((1L, 2L), (1L, 4L), (2L, 4L)))
  }

  test("containment: the subset side reports ppm 1000000, superset less") {
    // doc 2 = doc 1 + one appended token: every doc-1 shingle appears in
    // doc 2 (containment 1.0 that way), 11 of doc 2's 12 the other way.
    val c = Dedup.containmentPairs(base, shingleN = 3, maxDf = 64,
        minContainmentPpm = 800000L)
      .select("a", "b", "cont_a_ppm", "cont_b_ppm")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(c((1L, 2L)) == (1000000L, 11L * 1000000L / 12L))
    assert(c((1L, 4L)) == (1000000L, 1000000L)) // verbatim dup
    assert(!c.keySet.exists(p => p._1 == 3L || p._2 == 3L))
  }
}
