package graft.util

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Diagnostic: time each sub-stage of jaccardPairs at a given sf. */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.local(8, "dedup-probe")
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[dprobe] $label%-22s ${(System.nanoTime() - t0) / 1e9}%6.2fs  n=$n")
    }
    val sh = df.select(col("doc_id").as("id"),
      graft.dedup.Dedup.shingles(col("text"), 4).as("sh"))
      .withColumn("sz", size(col("sh")))
    timed("shingles")(sh.queryExecution.toRdd.count())
    val posts = sh.select(col("id"), col("sz"), explode(col("sh")).as("g"))
    timed("postings")(posts.queryExecution.toRdd.count())
    val capped = posts.withColumn("rn",
        row_number().over(Window.partitionBy("g").orderBy("id")))
      .filter(col("rn") <= 1000).drop("rn")
    timed("capped")(capped.queryExecution.toRdd.count())
    val a = capped.select(col("g"), col("id").as("id_a"), col("sz").as("size_a"))
    val b = capped.select(col("g"), col("id").as("id_b"), col("sz").as("size_b"))
    val joined = a.join(b.hint("shuffle_hash"), Seq("g")).filter(col("id_a") < col("id_b"))
    timed("join")(joined.queryExecution.toRdd.count())
    val agg = joined.groupBy("id_a", "id_b", "size_a", "size_b").agg(count(lit(1)).as("inter"))
    timed("agg")(agg.queryExecution.toRdd.count())
    timed("full-q19")(graft.dedup.Dedup.jaccardPairs(df, "doc_id", "text",
      n = 4, minJaccardBp = 3000L, maxPosting = 1000).queryExecution.toRdd.count())
    timed("full-q19-again")(graft.dedup.Dedup.jaccardPairs(df, "doc_id", "text",
      n = 4, minJaccardBp = 3000L, maxPosting = 1000).queryExecution.toRdd.count())
    spark.stop()
  }
}
