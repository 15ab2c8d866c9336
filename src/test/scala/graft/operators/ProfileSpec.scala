package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq(
    ("a", 1L, 10L), ("a", 2L, 20L), ("b", 3L, 30L)
  ).toDF("g", "k", "v")

  private def fp(df: org.apache.spark.sql.DataFrame) =
    Profile.fingerprint(df, Seq("g"), Seq(col("k"), col("v")))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  test("fingerprint is row-order independent") {
    val shuffled = base.orderBy(col("v").desc).repartition(7)
    assert(fp(base) == fp(shuffled))
  }

  test("a single changed value changes exactly that group's checksum") {
    val mutated = Seq(
      ("a", 1L, 10L), ("a", 2L, 21L), ("b", 3L, 30L)
    ).toDF("g", "k", "v")
    val (orig, mut) = (fp(base), fp(mutated))
    assert(orig("b") == mut("b"), "untouched group must reconcile")
    assert(orig("a")._1 == mut("a")._1, "row counts equal")
    assert(orig("a")._2 != mut("a")._2, "changed group must differ")
  }

  test("modsum catches even-multiplicity drift the xor is blind to") {
    // Every row appears twice, so each hash xor-cancels itself: both
    // groups fold to checksum 0 at equal n_rows. The modular sum counts
    // multiplicity and must still separate them.
    val left = Seq(("g", "A"), ("g", "A"), ("g", "B"), ("g", "B"))
      .toDF("g", "x")
    val right = Seq(("g", "C"), ("g", "C"), ("g", "D"), ("g", "D"))
      .toDF("g", "x")
    def one(df: org.apache.spark.sql.DataFrame) =
      Profile.fingerprint(df, Seq("g"), Seq(col("x"))).collect()(0)
    val (fl, fr) = (one(left), one(right))
    assert(fl.getLong(1) == fr.getLong(1), "equal row counts")
    assert(fl.getLong(2) == 0L && fr.getLong(2) == 0L,
      "xor collides on even multiplicities")
    assert(fl.getLong(3) != fr.getLong(3), "modsum must separate")
  }

  test("dropped rows show in both n_rows and checksum") {
    val dropped = base.filter(col("k") =!= 2L)
    val (orig, d) = (fp(base), fp(dropped))
    assert(d("a")._1 == orig("a")._1 - 1)
    assert(d("a")._2 != orig("a")._2)
  }
}
