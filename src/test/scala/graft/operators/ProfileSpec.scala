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

  test("dropped rows show in both n_rows and checksum") {
    val dropped = base.filter(col("k") =!= 2L)
    val (orig, d) = (fp(base), fp(dropped))
    assert(d("a")._1 == orig("a")._1 - 1)
    assert(d("a")._2 != orig("a")._2)
  }
}
