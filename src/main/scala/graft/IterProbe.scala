package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object IterProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    val pairs = ops.Dedup.minHashNearDupPairs(docs, "doc_id", "text").localCheckpoint(true)
    println(s"[probe] pairs=${pairs.count()}")
    val t0 = System.nanoTime()
    val out = ops.Dedup.minLabelComponents(pairs, docs, "doc_id")
    println(s"[probe] components rows=${out.count()} in ${(System.nanoTime()-t0)/1e9} s")
    spark.stop()
  }
}
