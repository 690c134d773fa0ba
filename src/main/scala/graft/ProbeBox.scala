package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: absolute box-speed anchors (see CLAUDE.md round-12 close).
  * Prints per-job scheduling overhead (spark.range(1).count x30) and a
  * 32-core compute anchor (32M-mult sum) so bench totals can be compared
  * across rounds on a drifting box. Usage: runMain graft.ProbeBox
  */
object ProbeBox {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm
    (1 to 5).foreach(_ => spark.range(1).count())
    val t0 = System.nanoTime()
    (1 to 30).foreach(_ => spark.range(1).count())
    val perJob = (System.nanoTime() - t0) / 30e6
    val t1 = System.nanoTime()
    spark.range(32L * 1000 * 1000).selectExpr("sum(id * 3 + 1)").collect()
    val mult = (System.nanoTime() - t1) / 1e6
    println(f"PROBEBOX perJobMs=$perJob%.0f mult32mMs=$mult%.0f")
    spark.stop()
  }
}
