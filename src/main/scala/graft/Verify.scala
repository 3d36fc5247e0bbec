package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional comma-separated query-name filter (dev-loop use; the driver
    // passes two args and gets the full surface)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    def keep(name: String) = only.forall(_.contains(name))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_STATE_STORE=rocksdb runs the whole surface (all streaming
    // gates included) on the RocksDB provider — the 100 TB state path
    val spark = graft.streaming.StateStores.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.catalyst.GraftExtensions")
      // shuffle/spill on the same tmpfs-first scratch as checkpoints (see
      // TempDirs): identical policy to Bench so the two surfaces agree
      .config("spark.local.dir", graft.core.TempDirs.sparkLocalDir())
      .config("spark.ui.enabled", "false")
      // same harness hygiene as Bench (r16 finding): the janino codegen
      // cache defaults to 100 units while the 193-query surface generates
      // far more, so a full Verify pass otherwise recompiles every plan it
      // revisits; the status stores retain 1000 executions of metrics +
      // SparkPlanInfo trees as old-gen ballast. Correctness is unaffected
      // either way — this only cuts wall-clock of the round ritual.
      .config("spark.sql.codegen.cache.maxEntries", "4000")
      .config("spark.sql.ui.retainedExecutions", "8")
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "100")
      .config("spark.ui.retainedTasks", "1000")
      .config("spark.ui.retainedDeadExecutors", "1"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.streaming.StreamDebug.installIfRequested(spark)
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(kv => keep(kv._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // remove any stale/partial output for the failed query: leftovers
        // from a previous run would be validated as a PASS by the driver's
        // compare, silently masking the breakage
        val dir = Paths.get(s"$outDir/$name")
        if (Files.exists(dir)) {
          val walk = Files.walk(dir)
          try walk.sorted(java.util.Comparator.reverseOrder())
            .forEach(p => Files.deleteIfExists(p))
          finally walk.close()
        }
      }
      spark.catalog.clearCache() // drop per-query persists between queries
      // localCheckpoint blocks (PageRank's per-iteration ranks, the dedup
      // keep-lists) live in RDD storage, not the SQL cache — without this
      // sweep they accumulate across the 193-query loop as storage-memory
      // ballast (same rationale as Bench's per-run sweep)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => keep(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
