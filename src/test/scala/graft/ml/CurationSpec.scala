package graft.ml

import graft.SparkSpec
import graft.store.Versioned

class CurationSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("curation lineage: 7 stages, monotone gates, pinned training " +
      "corpus survives a re-run, QA sidecars committed") {
    val root = java.nio.file.Files
      .createTempDirectory("curation_spec").toString + "/corpus"
    val stages = Curation.lineage(spark, dir, root)

    assert(stages.map(_.name) == Seq("raw", "gopher_gate", "scored",
      "quality_gate", "temperature_mix", "semantic_dedup", "train_ready"))
    assert(stages.map(_.version) == (1L to 7L))
    assert(stages.head.rows == 500L)
    // every gate can only shrink the corpus, and none empties it
    val gateSizes = stages.filter(s => Set("gopher_gate", "quality_gate",
      "temperature_mix", "semantic_dedup", "train_ready")(s.name))
      .map(_.rows)
    val sizesInOrder = stages.map(_.rows)
    assert(sizesInOrder.zip(
        sizesInOrder.head +: sizesInOrder.init).forall {
      case (n, prev) => n <= prev
    }, s"a stage grew the corpus: $stages")
    assert(gateSizes.forall(_ > 0L), s"a gate emptied the corpus: $stages")

    // the training corpus carries shuffle + split columns and the
    // score provenance
    val trainV = stages.last.version
    val train = Versioned.read(spark, root, trainV)
    assert(Seq("doc_id", "p_micros", "weight_p6", "shard", "pos", "split")
      .forall(train.columns.contains))
    val trainRows = train.select("doc_id", "shard", "split")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSet

    // QA sidecars: calibration table + MMR showcase page both landed,
    // one version per lineage generation
    val qa = root + "_qa"
    assert(Versioned.latestVersion(qa + "/calibration") == 1L)
    assert(Versioned.read(spark, qa + "/calibration").columns.toSet ==
      Set("bin", "n", "sum_p_micros"))
    val showcase = Versioned.read(spark, qa + "/showcase")
    assert(showcase.columns.toSet == Set("step", "vec_id", "mmr_p12"))
    assert(showcase.count() == 5L)

    // a re-run appends a NEW generation (v8..v14) and reproduces the
    // same training set, while the pinned old version reads unchanged
    val again = Curation.lineage(spark, dir, root)
    assert(again.map(_.version) == (8L to 14L))
    assert(again.last.rows == stages.last.rows)
    val rerunRows = Versioned.read(spark, root, again.last.version)
      .select("doc_id", "shard", "split")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSet
    assert(rerunRows == trainRows, "lineage is not deterministic")
    assert(Versioned.latestVersion(qa + "/calibration") == 2L)
    assert(Versioned.read(spark, root, trainV)
      .select("doc_id").collect().map(_.getLong(0)).toSet ==
      trainRows.map(_._1), "pinned training corpus changed under re-run")
  }
}
