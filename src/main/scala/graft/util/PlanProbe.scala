package graft.util

import org.apache.spark.sql.SparkSession

/** Dev tool: time planning vs execution of a SparkEntry query, print the formatted
  * plan. Usage: runMain graft.util.PlanProbe <sfDir> <queryName> [limitRows] */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val spark = Sessions.local(8, "probe")
    val fn = graft.SparkEntry.queries(name)
    var df = fn(spark, sfDir)
    val t0 = System.nanoTime()
    val optimized = df.queryExecution.optimizedPlan
    val t1 = System.nanoTime()
    val exec = df.queryExecution.executedPlan
    val t2 = System.nanoTime()
    val n = df.count()
    val t3 = System.nanoTime()
    println(f"[probe] optimize=${(t1 - t0) / 1e9}%.1fs physical=${(t2 - t1) / 1e9}%.1fs " +
      f"execute=${(t3 - t2) / 1e9}%.1fs rows=$n")
    if (args.length > 2 && args(2) == "explain") df.explain("formatted")
    spark.stop()
  }
}
