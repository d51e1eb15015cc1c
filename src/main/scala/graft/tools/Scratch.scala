package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.GeoFunctions._
import graft.operators.SJoin

/** Throwaway timing experiments (not part of the public surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    graft.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val s = builder.getOrCreate()
    s.sparkContext.setLogLevel("WARN")

    def t(name: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"$name run $i: ${(System.nanoTime() - t0) / 1e9}%.3fs rows=$n")
      }
    }

    val pts = graft.readTable(s, sfDir, "lineitem").withColumn("geometry",
      st_point(expr("(l_orderkey % 100) * 0.004 + 0.05"),
        expr("(l_partkey % 100) * 0.004 + 0.05")))
    val lon0 = expr("(s_suppkey % 20) * 0.02")
    val lat0 = expr("(s_suppkey % 25) * 0.016")
    val rects = graft.readTable(s, sfDir, "supplier").withColumn("geometry",
      st_envelope(st_makeline(st_point(lon0, lat0), st_point(lon0 + lit(0.05), lat0 + lit(0.05)))))

    // 0: left side alone (scan + point + bbox + cellcover + salt)
    val l0 = pts
      .withColumn("lb", st_bbox(col("geometry")))
      .withColumn("cell", explode(st_cellcover(col("geometry"), lit(0.02))))
      .withColumn("salt", pmod(xxhash64(col("geometry")), lit(8)).cast("int"))
    t("leftside")(l0.count())

    // 1: keys-only join (counts all candidate pairs, no refcell/pred)
    val r0 = rects
      .withColumnRenamed("geometry", "geometry_right")
      .withColumn("rb", st_bbox(col("geometry_right")))
      .withColumn("cell", explode(st_cellcover(col("geometry_right"), lit(0.02))))
      .withColumn("salt", explode(sequence(lit(0), lit(7))))
    val joined = l0.join(r0, Seq("cell", "salt"))
    t("keysonly")(joined.count())

    // 2: + refcell dedup
    val refCell = st_cellof(
      greatest(element_at(col("lb"), 1), element_at(col("rb"), 1)),
      greatest(element_at(col("lb"), 2), element_at(col("rb"), 2)),
      lit(0.02))
    t("refcell")(joined.where(refCell === col("cell")).count())

    // 3: + bbox gate
    def lb(i: Int) = element_at(col("lb"), i)
    def rb(i: Int) = element_at(col("rb"), i)
    val eps = lit(1e-12)
    val gate = lb(1) >= rb(1) - eps && lb(2) >= rb(2) - eps &&
      lb(3) <= rb(3) + eps && lb(4) <= rb(4) + eps
    t("bboxgate")(joined.where(refCell === col("cell") && gate).count())

    // 4: full predicate
    t("full")(joined.where(refCell === col("cell") && gate &&
      st_within(col("geometry"), col("geometry_right"))).count())

    // 5: full query incl. aggregation
    t("query")(graft.SparkEntry.queries("sjoin_skew")(s, sfDir).count())

    s.stop()
  }
}
