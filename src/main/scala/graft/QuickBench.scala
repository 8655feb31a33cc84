package graft
import org.apache.spark.sql.SparkSession
object QuickBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    val cold = sys.env.get("QUICK_COLD").contains("1")
    for (q <- args) {
      val fn = SparkEntry.queries(q)
      if (!cold) fn(spark, sf).count() // warm
      val t0 = System.nanoTime(); val n = fn(spark, sf).count()
      println(f"QUICK $q rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    // kernel recheck
    val docs = ops.BenchKernel.prepareInput(spark, sf).cache()
    val nd = docs.count()
    ops.BenchKernel.run(spark, docs)
    val t0 = System.nanoTime(); val r = ops.BenchKernel.run(spark, docs)
    println(f"QUICK kernel rows=${r._1} sec=${(System.nanoTime() - t0) / 1e9}%.2f docs_per_sec=${nd / ((System.nanoTime() - t0) / 1e9)}%.0f")
    spark.stop()
  }
}
