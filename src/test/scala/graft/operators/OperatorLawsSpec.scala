package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Property tests for the session-10 relational operators on RANDOM
  * inputs (deterministic seeded sampling, [[graft.plans.PropertiesSpec]]'s
  * offline idiom): the laws a user silently relies on — merge composition,
  * trailing-window agreement with brute force, funnel monotonicity. */
class OperatorLawsSpec extends SparkSuite {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  // ---- mergeUpsert: applying key-disjoint changesets sequentially equals
  // applying their union at once (the law q_streaming_merge's gate rests on)

  private val genMergeCase: Gen[(List[(Long, String)], List[(Long, String, String)])] =
    for {
      nb <- Gen.choose(0, 12)
      baseKeys <- Gen.listOfN(nb, Gen.choose(0L, 20L))
      nc <- Gen.choose(0, 12)
      changeKeys <- Gen.listOfN(nc, Gen.choose(0L, 30L))
      ops <- Gen.listOfN(nc, Gen.oneOf("U", "D"))
    } yield {
      val base = baseKeys.distinct.map(k => (k, s"b$k"))
      val changes = changeKeys.distinct.zip(ops).map { case (k, op) => (k, s"c$k", op) }
      (base, changes)
    }

  test("mergeUpsert: sequential key-disjoint application == single merged application") {
    samples(genMergeCase, 25).foreach { case (base, changes) =>
      val baseDf = base.toDF("k", "v")
      val (lo, hi) = changes.partition(_._1 < 15L) // key-disjoint split
      def df(cs: List[(Long, String, String)]) = cs.toDF("k", "v", "op")
      val sequential = Relational.mergeUpsert(
        Relational.mergeUpsert(baseDf, df(lo), "k"), df(hi), "k")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val atOnce = Relational.mergeUpsert(baseDf, df(lo ++ hi), "k")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(sequential == atOnce, s"base=$base changes=$changes")
    }
  }

  test("mergeUpsert: result keys = (base − deletes) ∪ upserts") {
    samples(genMergeCase, 25).foreach { case (base, changes) =>
      val got = Relational.mergeUpsert(base.toDF("k", "v"),
        changes.toDF("k", "v", "op"), "k")
        .collect().map(_.getLong(0)).toSet
      val dels = changes.filter(_._3 == "D").map(_._1).toSet
      val ups = changes.filter(_._3 == "U").map(_._1).toSet
      assert(got == (base.map(_._1).toSet -- dels) ++ ups)
    }
  }

  // ---- trailing window stats (the q_rolling_zscore frame): Spark's window
  // must agree with a brute-force per-row computation on random data

  private val genSeries: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(0, 30)
    vs <- Gen.listOfN(n, Gen.choose(-100L, 100L))
  } yield vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }

  test("trailing-10 n/s/q agree with brute force on random series") {
    val fr = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1)).orderBy(col("i")).rowsBetween(-9, 0)
    samples(genSeries, 20).filter(_.nonEmpty).foreach { series =>
      val got = series.toDF("i", "v")
        .select(col("i"), count(lit(1)).over(fr).as("n"),
          sum(col("v")).over(fr).as("s"),
          sum(col("v") * col("v")).over(fr).as("q"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      series.foreach { case (i, _) =>
        val win = series.filter { case (j, _) => j <= i && j > i - 10 }.map(_._2)
        assert(got(i) == ((win.length.toLong, win.sum, win.map(x => x * x).sum)),
          s"at i=$i of $series")
      }
    }
  }

  // ---- funnel: stage entry times are strictly increasing and each stage's
  // entry is an event of that stage's type

  private val genEvents: Gen[List[(Long, Long, String)]] = for {
    n <- Gen.choose(0, 25)
    users <- Gen.listOfN(n, Gen.choose(1L, 4L))
    times <- Gen.listOfN(n, Gen.choose(0L, 50L))
    types <- Gen.listOfN(n, Gen.oneOf("view", "click", "purchase", "other"))
  } yield users.lazyZip(times).lazyZip(types).toList

  test("funnel stage times strictly increase and match stage events") {
    samples(genEvents, 30).filter(_.nonEmpty).foreach { events =>
      val df = events.map { case (u, t, e) => (u, new java.sql.Timestamp(t * 1000), e) }
        .toDF("user_id", "ts", "event_type")
      val out = Relational.funnelStages(df, col("user_id"), col("ts"),
        col("event_type"), Seq("view", "click", "purchase")).collect()
      out.foreach { r =>
        val u = r.getLong(0)
        val ms = (1 to 3).map(i => Option(r.getTimestamp(i)).map(_.getTime / 1000))
        // nulls only from the first unreached stage on
        assert(!ms.sliding(2).exists(p => p.head.isEmpty && p.last.nonEmpty), s"gap in $r")
        // strictly increasing where present
        ms.flatten.sliding(2).foreach(p =>
          if (p.length == 2) assert(p.head < p.last, s"non-increasing stages in $r"))
        // each entry time is a real event of that stage for that user
        val stages = Seq("view", "click", "purchase")
        ms.zipWithIndex.foreach { case (m, i) =>
          m.foreach(t => assert(events.contains((u, t, stages(i))),
            s"stage ${i + 1} time $t is not a (${stages(i)}) event of user $u"))
        }
      }
    }
  }
}
