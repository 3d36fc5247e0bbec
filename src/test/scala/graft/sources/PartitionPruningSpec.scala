package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Hive-style partitioned layout + partition pruning: the 100 TB lever the
  * testdata's flat files can't show. A predicate on the partition column
  * must be resolved from directory names alone (PartitionFilters on the
  * scan node), so the scan never opens the other partitions' files. */
class PartitionPruningSpec extends SparkSuite {

  private lazy val dir = {
    val d = Files.createTempDirectory("graft-partprune").toString
    graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").partitionBy("event_type").parquet(d)
    d
  }

  test("a partition-column predicate prunes to one directory's files") {
    val q = spark.read.parquet(dir).filter(col("event_type") === "purchase")
    val scan = q.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.getOrElse(fail("no file scan in plan"))
    // the predicate lives in partitionFilters (directory pruning), not in
    // dataFilters (per-row evaluation over opened files)
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "event_type")),
      s"partition filter missing: ${scan.partitionFilters}")
    assert(!scan.dataFilters.exists(_.references.exists(_.name == "event_type")))
    assert(scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .forall(_.files.nonEmpty))
    // selected files all come from the one matching partition directory
    val selected = scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .flatMap(_.files.map(_.getPath.toString))
    assert(selected.nonEmpty && selected.forall(_.contains("event_type=purchase")))
    // and the full listing has more (the pruned-away partitions)
    val all = scan.relation.location.listFiles(Nil, Nil)
      .flatMap(_.files.map(_.getPath.toString))
    assert(all.size > selected.size)
  }

  test("pruned read returns exactly the partition's rows") {
    val expected = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("event_type") === "purchase").count()
    val got = spark.read.parquet(dir).filter(col("event_type") === "purchase").count()
    assert(got == expected && got > 0)
  }
}
