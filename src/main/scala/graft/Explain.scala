package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of named driver queries —
  * the plan-audit loop ("is the filter pushed, is the small side
  * broadcast, does codegen span the hot path"). Usage:
  * `runMain graft.Explain <sfDir> <query> [<query> ...]` */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.plans.catalyst.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===== $n =====")
      try SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"failed: ${e.getMessage}") }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
