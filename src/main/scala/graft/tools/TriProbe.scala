package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase timings for the q56 triangle pipeline at SPARK_GRAFT_SF_DIR:
  * separates the co-purchase edge derivation (lineitem self-join) from
  * the triangle count proper, so bench movement can be attributed.
  */
object TriProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().withExtensions(new graft.plans.GraftExtensions).master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.util.Logs.quietExpected()

    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[tri] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val op = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val pairs = op.as("a").join(op.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v"))

    time("derivation (count only)") { println("  pairs=" + pairs.count()) }
    val mat = pairs.persist()
    time("derivation (materialize)") { mat.count() }
    time("triangles on materialized") {
      println("  " + graft.graph.Triangles.count(mat)
        .collect().mkString(","))
    }
    // prototype: adjacency-array wedge generation (groupBy + in-row
    // pair expansion) vs the production self-join
    time("triangles adj-array proto") {
      val canon = mat.select(least(col("u"), col("v")).as("u"),
          greatest(col("u"), col("v")).as("v"))
        .filter(col("u") =!= col("v")).distinct().persist()
      val nE = canon.count()
      val deg = canon.select(col("u").as("x"))
        .union(canon.select(col("v").as("x")))
        .groupBy("x").agg(count(lit(1)).as("d"))
      val lowerIsU = col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v"))
      val oriented = canon
        .join(deg.select(col("x").as("u"), col("d").as("du")), "u")
        .join(deg.select(col("x").as("v"), col("d").as("dv")), "v")
        .select(when(lowerIsU, col("u")).otherwise(col("v")).as("src"),
          when(lowerIsU, col("v")).otherwise(col("u")).as("dst"),
          when(lowerIsU, col("dv")).otherwise(col("du")).as("dd"))
      val nbrs = oriented.groupBy("src")
        .agg(sort_array(collect_list(struct(col("dd"), col("dst"))))
          .as("ns"))
      val wedges = nbrs.select(explode(flatten(transform(col("ns"),
          (x, i) => transform(
            slice(col("ns"), i + 2,
              greatest(size(col("ns")) - i - 1, lit(0))),
            y => struct(x.getField("dst").as("b"),
              y.getField("dst").as("c")))))).as("w"))
        .select(col("w.b").as("b"), col("w.c").as("c"))
      val closing = broadcast(
        oriented.select(col("src").as("b"), col("dst").as("c")))
      val n = wedges.join(closing, Seq("b", "c")).count()
      println(s"  adj-array edges=$nE triangles=$n")
      canon.unpersist(blocking = false)
    }
    // sub-phase attribution inside the production shape
    locally {
      val mat2 = pairs.persist(); mat2.count()
      val canon = mat2.select(least(col("u"), col("v")).as("u"),
          greatest(col("u"), col("v")).as("v"))
        .filter(col("u") =!= col("v")).distinct().persist()
      time("  canon distinct") { canon.count() }
      val deg = canon.select(col("u").as("x"))
        .union(canon.select(col("v").as("x")))
        .groupBy("x").agg(count(lit(1)).as("d"))
      val lowerIsU = col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v"))
      val oriented = canon
        .join(deg.select(col("x").as("u"), col("d").as("du")), "u")
        .join(deg.select(col("x").as("v"), col("d").as("dv")), "v")
        .select(when(lowerIsU, col("u")).otherwise(col("v")).as("src"),
          when(lowerIsU, col("v")).otherwise(col("u")).as("dst"),
          when(lowerIsU, col("dv")).otherwise(col("du")).as("dd"))
        .persist()
      time("  orient (deg joins)") { oriented.count() }
      val e1 = oriented.select(col("src"), col("dst").as("b"),
        col("dd").as("db"))
      val e2 = oriented.select(col("src"), col("dst").as("c"),
        col("dd").as("dc"))
      val wedges = e1.join(e2, "src")
        .filter(col("db") < col("dc") ||
          (col("db") === col("dc") && col("b") < col("c")))
      time("  wedge count (no close)") { println("  w=" + wedges.count()) }
      val closing = broadcast(
        oriented.select(col("src").as("b"), col("dst").as("c")))
      time("  close join + count") {
        println("  t=" + wedges.join(closing, Seq("b", "c")).count())
      }
      canon.unpersist(blocking = false)
      mat2.unpersist(false)
    }
    time("full q56 (cold)") {
      graft.SparkEntry.queries("q56_triangle_count")(spark, sfDir).count()
    }
    spark.stop()
  }
}
