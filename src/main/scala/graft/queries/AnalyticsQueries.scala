package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Relational.{medianUpper, roundp}

/** Second wave of beyond-the-reference analytics (SURVEY §2.6 context:
  * the reference has none of these; a Spark-native engine gets them
  * nearly for free and a training-data pipeline uses all of them):
  * grouping sets, higher-moment statistics (skewness/kurtosis, OLS
  * regression), histograms, mode, ordered string aggregation, Shannon
  * entropy, robust statistics (median absolute deviation), PageRank
  * power iteration, time-series gap fill (LOCF resampling), and Pareto
  * frontier (skyline). Every query keeps the repo's engine-exactness
  * discipline: integer/cents arithmetic for anything summed across rows,
  * and any floating-point math is a FIXED sequence of IEEE ops over
  * exact integers, mirrored token-for-token in the DuckDB oracle.
  */
object AnalyticsQueries {

  /** exact cents recovery for a 2-decimal double column */
  private def cents(c: Column): Column = floor(c * 100 + 0.5).cast("bigint")

  private val prBase  = 150000000000L // 0.15 * SCALE, SCALE = 1e12
  private val prIters = 10

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // GROUPING SETS — the general form rollup/cube specialize: exactly
    // the three sets (flag,status), (flag), (status) — note no grand
    // total, which neither rollup nor cube can express alone. One Expand
    // + one map-side-combined aggregate (|sets| × input rows expanded,
    // single shuffle). grouping() flags disambiguate "aggregated away"
    // from a genuinely-NULL key, which bare NULLs cannot.
    "q_grouping_sets" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(grouping(col("l_returnflag")).cast("int").as("g_flag"),
          grouping(col("l_linestatus")).cast("int").as("g_status"),
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast("bigint")).as("sum_qty"))),

    // Skewness and excess kurtosis per returnflag from EXACT raw moments
    // (q_corr's discipline, one power higher): quantity is integer ≤ 50,
    // so x²,x³,x⁴ are exact per-row bigints; the ³/⁴ power sums go
    // through decimal(38) (DuckDB mirrors with HUGEINT) so no sum can
    // overflow at any SF. Only the FINAL standardized moments are a
    // fixed sequence of double ops over those exact values —
    // m2 = Σx²/n − μ², m3/m4 via the binomial expansions, skew =
    // m3/(m2·√m2) (√ is IEEE-exact; pow(x,1.5) is libm-dependent and
    // deliberately avoided), kurt = m4/(m2·m2) − 3 — then 6dp-rounded.
    // No double is ever summed across rows.
    "q_skew_stats" -> ((s, dir) => {
      val m = Tables.lineitem(s, dir)
        .select(col("l_returnflag"), col("l_quantity").cast("bigint").as("x"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
          sum((col("x") * col("x") * col("x")).cast("decimal(38,0)")).as("sxxx"),
          sum((col("x") * col("x") * col("x") * col("x")).cast("decimal(38,0)")).as("sxxxx"))
        .select(col("l_returnflag"), col("n"),
          col("n").cast("double").as("dn"), col("sx").cast("double").as("dsx"),
          col("sxx").cast("double").as("dsxx"), col("sxxx").cast("double").as("dsxxx"),
          col("sxxxx").cast("double").as("dsxxxx"))
        .withColumn("m1", col("dsx") / col("dn"))
        .withColumn("m2", col("dsxx") / col("dn") - col("m1") * col("m1"))
        .withColumn("m3", col("dsxxx") / col("dn")
          - lit(3.0) * col("m1") * (col("dsxx") / col("dn"))
          + lit(2.0) * col("m1") * col("m1") * col("m1"))
        .withColumn("m4", col("dsxxxx") / col("dn")
          - lit(4.0) * col("m1") * (col("dsxxx") / col("dn"))
          + lit(6.0) * col("m1") * col("m1") * (col("dsxx") / col("dn"))
          - lit(3.0) * col("m1") * col("m1") * col("m1") * col("m1"))
      m.select(col("l_returnflag"), col("n"),
        roundp(col("m1"), 6).as("mean"),
        roundp(col("m3") / (col("m2") * sqrt(col("m2"))), 6).as("skewness"),
        roundp(col("m4") / (col("m2") * col("m2")) - lit(3.0), 6).as("kurtosis"))
    }),

    // Ordinary least squares per returnflag — price (exact cents) on
    // quantity (exact integer): slope = (n·Σxy − Σx·Σy)/(n·Σx² − Σx²),
    // intercept = (Σy − slope·Σx)/n, r² = num²/(varx·vary). The same
    // five exact moments as q_corr; the closed-form solution is a fixed
    // double-op sequence, 6dp-rounded. The distributed-regression shape:
    // one scan, one map-side-combined aggregate, O(|groups|) output.
    "q_linreg" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .select(col("l_returnflag"),
          col("l_quantity").cast("bigint").as("x"),
          cents(col("l_extendedprice")).as("y"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
          sum((col("y") * col("y")).cast("decimal(38,0)")).as("syy"),
          sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"))
        .select(col("l_returnflag"), col("n"),
          col("n").cast("double").as("dn"), col("sx").cast("double").as("dsx"),
          col("sy").cast("double").as("dsy"), col("sxx").cast("double").as("dsxx"),
          col("syy").cast("double").as("dsyy"), col("sxy").cast("double").as("dsxy"))
        .withColumn("num", col("dn") * col("dsxy") - col("dsx") * col("dsy"))
        .withColumn("varx", col("dn") * col("dsxx") - col("dsx") * col("dsx"))
        .withColumn("vary", col("dn") * col("dsyy") - col("dsy") * col("dsy"))
        .withColumn("slope", col("num") / col("varx"))
        .select(col("l_returnflag"), col("n"),
          roundp(col("slope"), 6).as("slope_cents_per_qty"),
          roundp((col("dsy") - col("slope") * col("dsx")) / col("dn"), 6).as("intercept_cents"),
          roundp(col("num") * col("num") / (col("varx") * col("vary")), 6).as("r2"))),

    // Fixed-width histogram of extended price — $5,000 bins over exact
    // cents (bin id = integer division, no float boundary ambiguity).
    // ONE map-side-combined aggregate; output is |bins|, data-size-
    // independent. The profiling primitive behind every data-quality
    // dashboard.
    "q_histogram" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .select(expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) DIV 500000").as("bin"),
          cents(col("l_extendedprice")).as("c"),
          col("l_quantity").cast("bigint").as("q"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"), sum(col("q")).as("sum_qty"),
          min(col("c")).as("min_cents"), max(col("c")).as("max_cents"))
        .withColumn("price_lo", col("bin") * 5000L)),

    // Statistical mode per user — most frequent event type, deterministic
    // tie-break (higher count first, then lexicographically smallest
    // type). Two-level aggregate: the count table is |users|×|types|, so
    // the row_number window sees a collapsed input, never raw events.
    "q_mode" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("n_mode").desc, col("mode_type"))
      Tables.events(s, dir)
        .groupBy(col("user_id"), col("event_type").as("mode_type"))
        .agg(count(lit(1)).as("n_mode"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
    }),

    // Ordered string aggregation (LISTAGG / string_agg) — per nation, the
    // first 10 supplier names in key order joined with ','; bounded by
    // the rank filter so a group's string can never grow with corpus
    // size (the unbounded-listagg OOM trap). collect_list is order-
    // nondeterministic under shuffles, so elements carry their sort key:
    // sort_array on (s_suppkey, s_name) structs gives a total order,
    // then the names are projected and joined.
    "q_listagg" -> ((s, dir) => {
      val w = Window.partitionBy(col("s_nationkey")).orderBy(col("s_suppkey"))
      val top = Tables.supplier(s, dir)
        .withColumn("n_suppliers", count(lit(1)).over(Window.partitionBy(col("s_nationkey"))))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 10)
      top.groupBy(col("s_nationkey"), col("n_suppliers"))
        .agg(array_join(
          transform(sort_array(collect_list(struct(col("s_suppkey"), col("s_name")))),
            x => x.getField("s_name")), ",").as("top10_names"))
        .join(Tables.nation(s, dir), col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("n_suppliers").cast("bigint").as("n_suppliers"),
          col("top10_names"))
    }),

    // Shannon entropy of each user's event-type distribution — the
    // mixture-health metric next to q_lang_balance. Conditional counts
    // per (statically-listed) type, then H = ln(n) − (Σᵢ cᵢ·ln cᵢ)/n
    // with the five terms written in a FIXED alphabetical order — the
    // only cross-row sums are integer counts; ln over exact integers is
    // the same libm-vs-Math.log exposure q_tfidf/q_bm25 already rely on,
    // and the 6dp round absorbs any last-ulp difference.
    "q_entropy" -> ((s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      def cnt(t: String) = count(when(col("event_type") === t, 1)).as(s"c_$t")
      def term(t: String): Column = {
        val c = col(s"c_$t").cast("double")
        when(col(s"c_$t") > 0, c * log(c)).otherwise(lit(0.0))
      }
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), cnt(types(0)), cnt(types(1)), cnt(types(2)),
          cnt(types(3)), cnt(types(4)))
        .select(col("user_id"), col("n"),
          roundp(log(col("n").cast("double"))
            - (term(types(0)) + term(types(1)) + term(types(2))
               + term(types(3)) + term(types(4))) / col("n").cast("double"),
            6).as("entropy_nats"))
    }),

    // Robust statistics per user: median and median-absolute-deviation of
    // the value series, both the reference's exact upper-middle-element
    // median (Taxi.hs:272-274 via Relational.medianUpper) over integer
    // cents — no interpolation, no floats, hash-exact. Two aggregates
    // and one join, all hash-partitioned on user_id (co-keyed — one
    // logical exchange reused). MAD is the outlier-scale every robust
    // anomaly detector (modified z-score) needs where q_rolling_zscore's
    // mean/variance would be poisoned by the outliers themselves.
    "q_mad" -> ((s, dir) => {
      val c = Tables.events(s, dir)
        .select(col("user_id"), cents(col("value")).as("c"))
      val med = c.groupBy(col("user_id"))
        .agg(medianUpper(col("c")).as("med"), count(lit(1)).as("n"))
      c.join(med, "user_id")
        .select(col("user_id"), col("med"), col("n"), abs(col("c") - col("med")).as("dev"))
        .groupBy(col("user_id"), col("med"), col("n"))
        .agg(medianUpper(col("dev")).as("mad"))
        .select(col("user_id"), col("med"), col("mad"), col("n"))
    }),

    // PageRank power iteration (d = 0.85, 10 iterations) over the
    // nation-level trade graph: an edge src→dst when any customer of
    // nation src ordered from a supplier of nation dst. The heavy part —
    // edge extraction — is the distributed join chain over lineitem;
    // the iteration is the honest at-scale shape: ranks stay a DataFrame
    // end-to-end (no driver-side collect — per-node state does NOT fit
    // a driver at real graph sizes), each step a join against the cached
    // edge list + one aggregate. Determinism: ranks are FIXED-POINT
    // integers (SCALE = 1e12): contrib = rank DIV outdeg, next =
    // 0.15·SCALE + (85·Σcontrib) DIV 100 — integer sums are order-free,
    // so the result is hash-exact with no float accumulation anywhere.
    "q_pagerank" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"))
      val o  = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
      val cu = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
      val su = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey"))
      val edges = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(cu, col("o_custkey") === col("c_custkey"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .select(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
        .distinct()
      val withDeg = edges
        .join(edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg")), "src")
        .persist()
      val nodes = Tables.nation(s, dir)
        .select(col("n_nationkey").as("node"), col("n_name")).persist()
      var ranks = nodes.select(col("node"), lit(1000000000000L).as("r"))
      for (_ <- 1 to prIters) {
        val incoming = withDeg
          .join(ranks, col("src") === col("node"))
          .select(col("dst"), expr("r DIV outdeg").as("contrib"))
          .groupBy(col("dst")).agg(sum(col("contrib")).as("in_sum"))
        // materialize each iteration (per-node rows — bounded by graph
        // order, not stream size): the lazy form stacks 10 join+agg
        // rounds into ONE logical plan, and optimizing/executing that
        // 30-join tree cost more than the iteration's actual work
        // (8.8 s -> see OPTIMIZATION_r19.md; the standard lineage-
        // truncation move for iterative algorithms). Values unchanged —
        // the same integer fixed-point arithmetic, just evaluated
        // eagerly per round.
        ranks = nodes.join(incoming, col("node") === col("dst"), "left")
          .select(col("node"),
            (lit(prBase) + expr("coalesce(in_sum, 0L) * 85 DIV 100")).as("r"))
          .localCheckpoint()
      }
      ranks.join(nodes, "node")
        .select(col("node").as("n_nationkey"), col("n_name"), col("r").as("pagerank"))
    }),

    // Chi-square independence test over the lang × source contingency
    // table — q_ab_test's sibling for categorical experiment readouts
    // (is the language mix independent of the crawl source?). The cell
    // grid is the FULL label cross product (zero-observation cells still
    // contribute their expected mass — omitting them would bias the
    // statistic), built by a deliberate cross join of the two
    // query-set-sized distinct-label relations; row/column/grand totals
    // are window sums over that ≤|langs|·|sources| relation, so no 1-row
    // broadcast and no second scan. Determinism: observed counts are
    // exact integers; each cell's (o−e)²/e is a fixed double-op sequence
    // CONVERTED TO INTEGER MICRO-UNITS (floor(x·10⁶+0.5) as bigint), so
    // the total χ² is an exact integer sum — no cross-cell float
    // accumulation anywhere.
    "q_chisq" -> ((s, dir) => {
      val c = Tables.documents(s, dir)
        .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("obs"))
      val cells = c.select(col("lang")).distinct()
        .crossJoin(c.select(col("source")).distinct())
        .join(c, Seq("lang", "source"), "left")
        .withColumn("obs", coalesce(col("obs"), lit(0L)))
      val (wl, ws, wg) = (Window.partitionBy(col("lang")),
        Window.partitionBy(col("source")), Window.partitionBy())
      cells
        .withColumn("rowt", sum(col("obs")).over(wl))
        .withColumn("colt", sum(col("obs")).over(ws))
        .withColumn("n", sum(col("obs")).over(wg))
        .withColumn("e", col("rowt").cast("double") * col("colt").cast("double")
          / col("n").cast("double"))
        .withColumn("d", col("obs").cast("double") - col("e"))
        .select(col("lang"), col("source"), col("obs"),
          roundp(col("e"), 6).as("expected"),
          floor(col("d") * col("d") / col("e") * lit(1000000.0) + lit(0.5))
            .cast("bigint").as("contrib_micro"))
        .withColumn("chi2_total_micro", sum(col("contrib_micro")).over(wg))
    }),

    // Triangle counting over the undirected nation trade graph — the
    // clustering-coefficient primitive. The standard distributed
    // orientation trick: normalize every edge to (lo, hi) with lo < hi
    // and DISTINCT, then two co-keyed equi-joins enumerate each triangle
    // exactly once as i<j<k (at real graph scale the orientation would
    // be by degree, which bounds the join fan-out by the arboricity —
    // same plan shape, different sort key). Output is per-node triangle
    // participation — |nodes| rows, integer counts, hash-exact.
    "q_triangles" -> ((s, dir) => {
      val raw = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"))
        .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("c_nationkey").as("a"), col("s_nationkey").as("b"))
        .filter(col("a") =!= col("b"))
      val edges = raw
        .select(least(col("a"), col("b")).as("lo"), greatest(col("a"), col("b")).as("hi"))
        .distinct().persist()
      val tri = edges.as("e1")
        .join(edges.as("e2"), col("e1.hi") === col("e2.lo"))
        .join(edges.as("e3"),
          col("e1.lo") === col("e3.lo") && col("e2.hi") === col("e3.hi"))
        .select(col("e1.lo").as("i"), col("e1.hi").as("j"), col("e2.hi").as("k"))
      tri.select(explode(array(col("i"), col("j"), col("k"))).as("n_nationkey"))
        .groupBy(col("n_nationkey")).agg(count(lit(1)).as("n_triangles"))
        .join(Tables.nation(s, dir), "n_nationkey")
        .select(col("n_nationkey"), col("n_name"), col("n_triangles"))
    }),

    // Deterministic stratified sampling — exactly k documents per
    // language, selected by rank of xxhash64(doc_id) (seed 42): the
    // hash-rank makes the draw pseudo-random yet reproducible on ANY
    // engine that can replay the hash (the DuckDB oracle replays Spark's
    // XXH64 bit-for-bit — XxhashOracleSql), and adding documents never
    // changes whether an EXISTING document would have ranked in the top
    // k of its stratum given the same competitors, unlike rand()-based
    // sampling. One window per stratum; the per-stratum sort is the
    // at-scale cost and k is a constant.
    "q_stratified_sample" -> ((s, dir) => {
      val w = Window.partitionBy(col("lang"))
        .orderBy(xxhash64(col("doc_id")), col("doc_id"))
      Tables.documents(s, dir)
        .select(col("lang"), col("doc_id"), col("n_chars"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 50)
    }),

    // Time-series resampling with forward fill (LOCF) — per user, one row
    // per calendar day from their first to last event: the day's LAST
    // observed value (exact cents; latest (ts, event_id) wins) carried
    // forward across gap days. The feature-engineering join spine every
    // daily-aggregation pipeline builds. Scale shape: the spine is
    // |users| × |calendar days| — bounded by the calendar, not the event
    // count — and the fill is one per-user window over that spine; daily
    // last values collapse events FIRST (row_number on the user-day
    // partition), so the window input is already resampled.
    "q_gap_fill" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), expr("unix_micros(ts) DIV 86400000000").as("d"),
          col("ts"), col("event_id"), cents(col("value")).as("c"))
      // day's last value as ONE hash aggregate — max of the (ts, event_id,
      // c) struct is lexicographic, so "latest (ts, event_id) wins"
      // exactly like a desc row_number window, but with map-side partial
      // aggregation: each task ships one row per (user, day) instead of
      // sorting every raw event through the shuffle (the window form
      // measured 40x wall-clock at the 100x step; this collapses first).
      val daily = ev
        .groupBy(col("user_id"), col("d"))
        .agg(max(struct(col("ts"), col("event_id"), col("c"))).as("m"))
        .select(col("user_id"), col("d"), col("m").getField("c").as("day_last"))
      val spine = ev.groupBy(col("user_id"))
        .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
        .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("d"))
      val wFill = Window.partitionBy(col("user_id")).orderBy(col("d"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(daily, Seq("user_id", "d"), "left")
        .select(col("user_id"), col("d"),
          last(col("day_last"), ignoreNulls = true).over(wFill).as("filled_cents"),
          col("day_last").isNull.as("is_gap"))
    }),

    // Pointwise mutual information over word co-occurrence — the corpus-
    // statistics backbone of collocation mining / embedding evaluation.
    // Vocabulary = words in ≥5% of documents (a FRACTIONAL document-
    // frequency threshold, so selection needs no global top-k sort and
    // the set stays distribution-bounded as the corpus grows); pairs =
    // distinct vocab words co-occurring in a document, built by ONE
    // doc_id-co-keyed self-join whose per-doc fan-out is capped by
    // |vocab|². Counts are exact integers; PMI = ln(N·c_ab/(c_a·c_b)) is
    // a fixed op sequence per output row, 6dp-rounded; c_ab ≥ 10 bounds
    // the emitted matrix to the statistically meaningful cells.
    "q_pmi" -> ((s, dir) => {
      // N is a SCALAR (one count job, kmeans-style model-sized driver
      // state) — folding it in as a literal keeps the plan free of the
      // 1-row crossJoin shape q_tfidf carries.
      val nDocs = Tables.documents(s, dir).count()
      // docw feeds BOTH the df aggregate and the pair join, and vw feeds
      // both sides of the self-join — without persist the tokenize +
      // distinct would run four times (measured ~2x query time). The
      // materialize-for-reuse tradeoff is the right one at scale too:
      // vw is the vocab-filtered minority of tokens.
      val docw = Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(graft.text.TextAnalysis.tokens(col("text"))).as("word"))
        .distinct().persist()
      val df = docw.groupBy(col("word")).agg(count(lit(1)).as("df"))
        .filter(col("df").cast("double") >= lit(0.05) * lit(nDocs.toDouble))
      val vw = docw.join(broadcast(df), "word").persist()
      vw.select(col("doc_id"), col("word").as("w1"), col("df").as("df1"))
        .join(vw.select(col("doc_id"), col("word").as("w2"), col("df").as("df2")), "doc_id")
        .filter(col("w1") < col("w2"))
        .groupBy(col("w1"), col("w2"), col("df1"), col("df2"))
        .agg(count(lit(1)).as("c_ab"))
        .filter(col("c_ab") >= 10)
        .select(col("w1"), col("w2"), col("c_ab"), col("df1"), col("df2"),
          roundp(log(lit(nDocs.toDouble) * col("c_ab").cast("double")
            / (col("df1").cast("double") * col("df2").cast("double"))), 6).as("pmi"))
    }),

    // Two-proportion z-test — experiment analysis over the event stream:
    // users split A/B by user_id parity, conversion = a heavy purchaser
    // (≥ 14 purchase events — near the per-user median, so both outcome
    // classes are populated; "any purchase" is 100% in this data and
    // makes the statistic undefined). One per-user reduction (single
    // shuffle on user_id) collapses the stream to |users| rows; the test
    // statistic is a fixed double-op sequence over the four exact counts
    // (pooled-variance z), engine-exact at 6dp, NULL in the degenerate
    // all-convert/none-convert case where z is undefined (Spark 4 ANSI
    // raises DIVIDE_BY_ZERO even for doubles, so the guard is
    // correctness, not cosmetics). Output is ONE row regardless of scale.
    "q_ab_test" -> ((s, dir) => {
      val perUser = Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(when(count(when(col("event_type") === "purchase", 1)) >= 14, 1)
          .otherwise(0).as("conv"))
        .select((col("user_id") % 2).as("variant"), col("conv"))
      perUser.agg(
        count(when(col("variant") === 0, 1)).as("n_a"),
        count(when(col("variant") === 1, 1)).as("n_b"),
        sum(when(col("variant") === 0, col("conv")).otherwise(0)).as("conv_a"),
        sum(when(col("variant") === 1, col("conv")).otherwise(0)).as("conv_b"))
        .select(col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
          col("n_a").cast("double").as("dna"), col("n_b").cast("double").as("dnb"),
          col("conv_a").cast("double").as("dca"), col("conv_b").cast("double").as("dcb"))
        .withColumn("p_a", col("dca") / col("dna"))
        .withColumn("p_b", col("dcb") / col("dnb"))
        .withColumn("p_pool", (col("dca") + col("dcb")) / (col("dna") + col("dnb")))
        .select(col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
          roundp(col("p_a"), 6).as("rate_a"), roundp(col("p_b"), 6).as("rate_b"),
          when(col("p_pool") > 0.0 && col("p_pool") < 1.0,
            roundp((col("p_b") - col("p_a"))
              / sqrt(col("p_pool") * (lit(1.0) - col("p_pool"))
                * (lit(1.0) / col("dna") + lit(1.0) / col("dnb"))), 6)).as("z_score"))
    }),

    // Last-touch attribution — each purchase credited to the user's most
    // recent PRIOR non-purchase event type ('direct' when none). ONE
    // per-user window (rows-frame, 1-preceding upper bound keeps the
    // purchase itself out of its own attribution) carries the last
    // channel forward; revenue stays exact cents. The marketing-
    // analytics sibling of q_funnel/q_retention.
    "q_attribution" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, dir)
        .withColumn("channel", coalesce(
          last(when(col("event_type") =!= "purchase", col("event_type")),
            ignoreNulls = true).over(w),
          lit("direct")))
        .filter(col("event_type") === "purchase")
        .groupBy(col("channel"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(cents(col("value"))).as("revenue_cents"))
    }),

    // Exact per-user order statistics — p25/p50/p75/p90 of the value
    // series as SELECTED elements (0-based index ⌊p·(n−1)⌋ of the sorted
    // cents list; the lower-element convention — no interpolation, no
    // floats, hash-exact; medianUpper's sibling generalized to arbitrary
    // ranks). Per-group lists are user-bounded, the same memory contract
    // as q_median.
    "q_percentiles" -> ((s, dir) => {
      val sorted = sort_array(collect_list(col("c")))
      def pick(p: Double) =
        try_element_at(sorted,
          (floor(lit(p) * (size(sorted) - 1)) + 1).cast("int"))
      Tables.events(s, dir)
        .select(col("user_id"), cents(col("value")).as("c"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), pick(0.25).as("p25"), pick(0.50).as("p50"),
          pick(0.75).as("p75"), pick(0.90).as("p90"))
    }),

    // Pareto frontier (skyline) per brand: parts not strictly dominated
    // on (cheaper price, larger size). Dominance is resolved with TWO
    // range-frame window maxima over exact price cents — max size among
    // strictly-cheaper parts (RANGE … 1 PRECEDING: integer keys make
    // "strictly cheaper" exact) and max size among same-price peers
    // (RANGE CURRENT ROW) — so the O(n²) NOT EXISTS collapses to one
    // per-brand sort. dominated ⇔ cheaper_max ≥ size ∨ peer_max > size,
    // the exact strict-Pareto rule (equal price+size duplicates are
    // mutually non-dominating and both kept).
    "q_skyline" -> ((s, dir) => {
      val base = Window.partitionBy(col("p_brand")).orderBy(col("c"))
      val wPrev = base.rangeBetween(Window.unboundedPreceding, -1)
      val wPeer = base.rangeBetween(Window.currentRow, Window.currentRow)
      Tables.part(s, dir)
        .select(col("p_brand"), col("p_partkey"), col("p_size"),
          cents(col("p_retailprice")).as("c"))
        .withColumn("prev_max", max(col("p_size")).over(wPrev))
        .withColumn("peer_max", max(col("p_size")).over(wPeer))
        .filter(!(coalesce(col("prev_max") >= col("p_size"), lit(false))
          || col("peer_max") > col("p_size")))
        .select(col("p_brand"), col("p_partkey"),
          col("c").as("price_cents"), col("p_size"))
    })
  )

  /** unrolled fixed-point PageRank iterations — mirrors the Spark loop's
    * integer arithmetic exactly (same DIV, same 85/100 order) */
  private def pagerankSql: String = {
    val iters = (1 to prIters).map { i =>
      s"""r$i AS (
         |  SELECT n.node,
         |         $prBase + CAST(coalesce(s.in_sum, 0) AS BIGINT) * 85 // 100 AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst, sum(r.r // e.outdeg) AS in_sum
         |    FROM edges e JOIN r${i - 1} r ON r.node = e.src
         |    GROUP BY e.dst) s ON n.node = s.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH raw AS (
       |  SELECT DISTINCT c.c_nationkey AS src, su.s_nationkey AS dst
       |  FROM lineitem l
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  JOIN supplier su ON l.l_suppkey = su.s_suppkey),
       |edges AS (
       |  SELECT src, dst, count(*) OVER (PARTITION BY src) AS outdeg FROM raw),
       |nodes AS (SELECT n_nationkey AS node, n_name FROM nation),
       |r0 AS (SELECT node, CAST(1000000000000 AS BIGINT) AS r FROM nodes),
       |$iters
       |SELECT n.node AS n_nationkey, n.n_name, CAST(r.r AS BIGINT) AS pagerank
       |FROM r$prIters r JOIN nodes n USING (node)""".stripMargin
  }

  val oracles: Map[String, String] = Map(

    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
        |       CAST(GROUPING(l_linestatus) AS INT) AS g_status,
        |       count(*) AS n,
        |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |                        (l_returnflag), (l_linestatus))""".stripMargin,

    // identical moment recovery and the identical final double-op tree
    "q_skew_stats" ->
      """WITH m AS (
        |  SELECT l_returnflag, count(*) AS n,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
        |         sum(CAST(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) AS HUGEINT)) AS sxx,
        |         sum(CAST(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
        |                  * CAST(l_quantity AS BIGINT) AS HUGEINT)) AS sxxx,
        |         sum(CAST(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
        |                  * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) AS HUGEINT)) AS sxxxx
        |  FROM lineitem GROUP BY l_returnflag),
        |d AS (
        |  SELECT l_returnflag, n, CAST(n AS DOUBLE) AS dn, CAST(sx AS DOUBLE) AS dsx,
        |         CAST(sxx AS DOUBLE) AS dsxx, CAST(sxxx AS DOUBLE) AS dsxxx,
        |         CAST(sxxxx AS DOUBLE) AS dsxxxx
        |  FROM m),
        |m1t AS (SELECT *, dsx / dn AS m1 FROM d),
        |m2t AS (SELECT *, dsxx / dn - m1 * m1 AS m2 FROM m1t),
        |m3t AS (SELECT *, dsxxx / dn - 3.0 * m1 * (dsxx / dn) + 2.0 * m1 * m1 * m1 AS m3 FROM m2t),
        |m4t AS (SELECT *, dsxxxx / dn - 4.0 * m1 * (dsxxx / dn)
        |               + 6.0 * m1 * m1 * (dsxx / dn) - 3.0 * m1 * m1 * m1 * m1 AS m4 FROM m3t)
        |SELECT l_returnflag, n,
        |       floor(m1 * 1000000 + 0.5) / 1000000 AS mean,
        |       floor(m3 / (m2 * sqrt(m2)) * 1000000 + 0.5) / 1000000 AS skewness,
        |       floor((m4 / (m2 * m2) - 3.0) * 1000000 + 0.5) / 1000000 AS kurtosis
        |FROM m4t""".stripMargin,

    "q_linreg" ->
      """WITH m AS (
        |  SELECT l_returnflag, count(*) AS n,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
        |         CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sy,
        |         sum(CAST(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) AS HUGEINT)) AS sxx,
        |         sum(CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |                  * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS HUGEINT)) AS syy,
        |         sum(CAST(CAST(l_quantity AS BIGINT)
        |                  * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS HUGEINT)) AS sxy
        |  FROM lineitem GROUP BY l_returnflag),
        |d AS (
        |  SELECT l_returnflag, n, CAST(n AS DOUBLE) AS dn, CAST(sx AS DOUBLE) AS dsx,
        |         CAST(sy AS DOUBLE) AS dsy, CAST(sxx AS DOUBLE) AS dsxx,
        |         CAST(syy AS DOUBLE) AS dsyy, CAST(sxy AS DOUBLE) AS dsxy
        |  FROM m),
        |t AS (
        |  SELECT *, dn * dsxy - dsx * dsy AS num,
        |         dn * dsxx - dsx * dsx AS varx, dn * dsyy - dsy * dsy AS vary
        |  FROM d),
        |sl AS (SELECT *, num / varx AS slope FROM t)
        |SELECT l_returnflag, n,
        |       floor(slope * 1000000 + 0.5) / 1000000 AS slope_cents_per_qty,
        |       floor((dsy - slope * dsx) / dn * 1000000 + 0.5) / 1000000 AS intercept_cents,
        |       floor(num * num / (varx * vary) * 1000000 + 0.5) / 1000000 AS r2
        |FROM sl""".stripMargin,

    "q_histogram" ->
      """SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) // 500000 AS bin,
        |       count(*) AS n,
        |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |       min(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS min_cents,
        |       max(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS max_cents,
        |       CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) // 500000 * 5000 AS price_lo
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q_mode" ->
      """WITH c AS (
        |  SELECT user_id, event_type AS mode_type, count(*) AS n_mode
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |                               ORDER BY n_mode DESC, mode_type) AS rn
        |  FROM c)
        |SELECT user_id, mode_type, n_mode FROM r WHERE rn = 1""".stripMargin,

    "q_listagg" ->
      """WITH r AS (
        |  SELECT s_nationkey, s_suppkey, s_name,
        |         row_number() OVER (PARTITION BY s_nationkey ORDER BY s_suppkey) AS rn,
        |         count(*) OVER (PARTITION BY s_nationkey) AS n_suppliers
        |  FROM supplier)
        |SELECT n.n_name, CAST(max(r.n_suppliers) AS BIGINT) AS n_suppliers,
        |       string_agg(r.s_name, ',' ORDER BY r.s_suppkey) AS top10_names
        |FROM r JOIN nation n ON r.s_nationkey = n.n_nationkey
        |WHERE r.rn <= 10
        |GROUP BY n.n_name""".stripMargin,

    // the identical fixed-order five-term ln expression
    "q_entropy" ->
      """WITH c AS (
        |  SELECT user_id, count(*) AS n,
        |         count(*) FILTER (event_type = 'click') AS c_click,
        |         count(*) FILTER (event_type = 'error') AS c_error,
        |         count(*) FILTER (event_type = 'purchase') AS c_purchase,
        |         count(*) FILTER (event_type = 'signup') AS c_signup,
        |         count(*) FILTER (event_type = 'view') AS c_view
        |  FROM events GROUP BY user_id)
        |SELECT user_id, n,
        |       floor((ln(CAST(n AS DOUBLE))
        |          - (CASE WHEN c_click > 0 THEN CAST(c_click AS DOUBLE) * ln(CAST(c_click AS DOUBLE)) ELSE 0.0 END
        |             + CASE WHEN c_error > 0 THEN CAST(c_error AS DOUBLE) * ln(CAST(c_error AS DOUBLE)) ELSE 0.0 END
        |             + CASE WHEN c_purchase > 0 THEN CAST(c_purchase AS DOUBLE) * ln(CAST(c_purchase AS DOUBLE)) ELSE 0.0 END
        |             + CASE WHEN c_signup > 0 THEN CAST(c_signup AS DOUBLE) * ln(CAST(c_signup AS DOUBLE)) ELSE 0.0 END
        |             + CASE WHEN c_view > 0 THEN CAST(c_view AS DOUBLE) * ln(CAST(c_view AS DOUBLE)) ELSE 0.0 END)
        |            / CAST(n AS DOUBLE)) * 1000000 + 0.5) / 1000000 AS entropy_nats
        |FROM c""".stripMargin,

    // the reference's upper-middle median at both levels, over exact
    // integer cents / deviations
    "q_mad" ->
      """WITH c AS (
        |  SELECT user_id, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
        |  FROM events),
        |med AS (
        |  SELECT user_id,
        |         list_sort(list(c))[CAST(floor(count(*) / 2) AS INT) + 1] AS med,
        |         count(*) AS n
        |  FROM c GROUP BY user_id),
        |dev AS (
        |  SELECT c.user_id, m.med, m.n, abs(c.c - m.med) AS dev
        |  FROM c JOIN med m ON c.user_id = m.user_id)
        |SELECT user_id, med,
        |       list_sort(list(dev))[CAST(floor(count(*) / 2) AS INT) + 1] AS mad,
        |       max(n) AS n
        |FROM dev GROUP BY user_id, med""".stripMargin,

    "q_pagerank" -> pagerankSql,

    // the identical whitespace tokenizer (TextQueries' Toks convention),
    // fractional-df vocabulary, and fixed-op PMI
    "q_pmi" ->
      """WITH docw AS (
        |  SELECT DISTINCT doc_id, word FROM (
        |    SELECT doc_id,
        |           unnest(list_filter(string_split_regex(text, '\s+'), t -> t <> '')) AS word
        |    FROM documents)),
        |nd AS (SELECT count(*) AS n_docs FROM documents),
        |df AS (
        |  SELECT word, count(*) AS df FROM docw GROUP BY word),
        |vocab AS (
        |  SELECT word, df FROM df, nd
        |  WHERE CAST(df AS DOUBLE) >= 0.05 * CAST(n_docs AS DOUBLE)),
        |vw AS (SELECT d.doc_id, d.word, v.df FROM docw d JOIN vocab v USING (word)),
        |pairs AS (
        |  SELECT a.word AS w1, b.word AS w2, a.df AS df1, b.df AS df2,
        |         count(*) AS c_ab
        |  FROM vw a JOIN vw b ON a.doc_id = b.doc_id AND a.word < b.word
        |  GROUP BY 1, 2, 3, 4
        |  HAVING count(*) >= 10)
        |SELECT w1, w2, c_ab, df1, df2,
        |       floor(ln(CAST(n_docs AS DOUBLE) * CAST(c_ab AS DOUBLE)
        |                / (CAST(df1 AS DOUBLE) * CAST(df2 AS DOUBLE)))
        |             * 1000000 + 0.5) / 1000000 AS pmi
        |FROM pairs, nd""".stripMargin,

    // the identical pooled-variance z over the four exact counts
    "q_ab_test" ->
      """WITH pu AS (
        |  SELECT user_id, user_id % 2 AS variant,
        |         CASE WHEN count(*) FILTER (event_type = 'purchase') >= 14
        |              THEN 1 ELSE 0 END AS conv
        |  FROM events GROUP BY user_id),
        |c AS (
        |  SELECT count(*) FILTER (variant = 0) AS n_a,
        |         count(*) FILTER (variant = 1) AS n_b,
        |         CAST(sum(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
        |         CAST(sum(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS BIGINT) AS conv_b
        |  FROM pu),
        |d AS (
        |  SELECT *, CAST(n_a AS DOUBLE) AS dna, CAST(n_b AS DOUBLE) AS dnb,
        |         CAST(conv_a AS DOUBLE) AS dca, CAST(conv_b AS DOUBLE) AS dcb
        |  FROM c),
        |p AS (
        |  SELECT *, dca / dna AS p_a, dcb / dnb AS p_b,
        |         (dca + dcb) / (dna + dnb) AS p_pool
        |  FROM d)
        |SELECT n_a, n_b, conv_a, conv_b,
        |       floor(p_a * 1000000 + 0.5) / 1000000 AS rate_a,
        |       floor(p_b * 1000000 + 0.5) / 1000000 AS rate_b,
        |       CASE WHEN p_pool > 0.0 AND p_pool < 1.0 THEN
        |         floor((p_b - p_a) / sqrt(p_pool * (1.0 - p_pool) * (1.0 / dna + 1.0 / dnb))
        |               * 1000000 + 0.5) / 1000000 END AS z_score
        |FROM p""".stripMargin,

    "q_attribution" ->
      """WITH a AS (
        |  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c,
        |         coalesce(last_value(CASE WHEN event_type <> 'purchase'
        |                                  THEN event_type END IGNORE NULLS)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |           'direct') AS channel
        |  FROM events)
        |SELECT channel, count(*) AS n_purchases,
        |       CAST(sum(c) AS BIGINT) AS revenue_cents
        |FROM a WHERE event_type = 'purchase'
        |GROUP BY channel""".stripMargin,

    // the identical lower-element order statistics over sorted cents
    "q_percentiles" ->
      """WITH c AS (
        |  SELECT user_id, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
        |  FROM events)
        |SELECT user_id, count(*) AS n,
        |       list_sort(list(c))[CAST(floor(0.25 * (count(*) - 1)) AS INT) + 1] AS p25,
        |       list_sort(list(c))[CAST(floor(0.5 * (count(*) - 1)) AS INT) + 1] AS p50,
        |       list_sort(list(c))[CAST(floor(0.75 * (count(*) - 1)) AS INT) + 1] AS p75,
        |       list_sort(list(c))[CAST(floor(0.9 * (count(*) - 1)) AS INT) + 1] AS p90
        |FROM c GROUP BY user_id""".stripMargin,

    "q_chisq" ->
      """WITH c AS (
        |  SELECT lang, source, count(*) AS obs FROM documents GROUP BY 1, 2),
        |x AS (
        |  SELECT l.lang, s.source
        |  FROM (SELECT DISTINCT lang FROM c) l, (SELECT DISTINCT source FROM c) s),
        |cells AS (
        |  SELECT x.lang, x.source, coalesce(c.obs, 0) AS obs
        |  FROM x LEFT JOIN c USING (lang, source)),
        |w AS (
        |  SELECT lang, source, obs,
        |         CAST(sum(obs) OVER (PARTITION BY lang) AS BIGINT) AS rowt,
        |         CAST(sum(obs) OVER (PARTITION BY source) AS BIGINT) AS colt,
        |         CAST(sum(obs) OVER () AS BIGINT) AS n
        |  FROM cells),
        |t AS (
        |  SELECT lang, source, obs,
        |         CAST(rowt AS DOUBLE) * CAST(colt AS DOUBLE) / CAST(n AS DOUBLE) AS e
        |  FROM w),
        |u AS (SELECT lang, source, obs, e, CAST(obs AS DOUBLE) - e AS d FROM t),
        |v AS (
        |  SELECT lang, source, obs,
        |         floor(e * 1000000 + 0.5) / 1000000 AS expected,
        |         CAST(floor(d * d / e * 1000000 + 0.5) AS BIGINT) AS contrib_micro
        |  FROM u)
        |SELECT lang, source, obs, expected, contrib_micro,
        |       CAST(sum(contrib_micro) OVER () AS BIGINT) AS chi2_total_micro
        |FROM v""".stripMargin,

    "q_triangles" ->
      """WITH raw AS (
        |  SELECT DISTINCT c.c_nationkey AS a, su.s_nationkey AS b
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier su ON l.l_suppkey = su.s_suppkey
        |  WHERE c.c_nationkey <> su.s_nationkey),
        |edges AS (
        |  SELECT DISTINCT least(a, b) AS lo, greatest(a, b) AS hi FROM raw),
        |tri AS (
        |  SELECT e1.lo AS i, e1.hi AS j, e2.hi AS k
        |  FROM edges e1
        |  JOIN edges e2 ON e1.hi = e2.lo
        |  JOIN edges e3 ON e1.lo = e3.lo AND e2.hi = e3.hi),
        |pernode AS (
        |  SELECT node, count(*) AS n_triangles FROM (
        |    SELECT unnest([i, j, k]) AS node FROM tri)
        |  GROUP BY node)
        |SELECT p.node AS n_nationkey, n.n_name, p.n_triangles
        |FROM pernode p JOIN nation n ON p.node = n.n_nationkey""".stripMargin,

    "q_stratified_sample" -> XxhashOracleSql.stratifiedSampleOracle(50),

    "q_gap_fill" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS d, ts, event_id,
        |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
        |  FROM events),
        |daily AS (
        |  SELECT user_id, d, c AS day_last FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id, d
        |                                 ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM ev) WHERE rn = 1),
        |spine AS (
        |  SELECT user_id, unnest(generate_series(min(d), max(d))) AS d
        |  FROM ev GROUP BY user_id)
        |SELECT s.user_id, s.d,
        |       last_value(dl.day_last IGNORE NULLS)
        |         OVER (PARTITION BY s.user_id ORDER BY s.d
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_cents,
        |       dl.day_last IS NULL AS is_gap
        |FROM spine s LEFT JOIN daily dl ON s.user_id = dl.user_id AND s.d = dl.d""".stripMargin,

    // the same two range-frame maxima; RANGE over integer cents makes
    // "strictly cheaper" exact in both engines
    "q_skyline" ->
      """WITH p AS (
        |  SELECT p_brand, p_partkey, p_size,
        |         CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS c
        |  FROM part),
        |w AS (
        |  SELECT *,
        |         max(p_size) OVER (PARTITION BY p_brand ORDER BY c
        |           RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max,
        |         max(p_size) OVER (PARTITION BY p_brand ORDER BY c
        |           RANGE BETWEEN CURRENT ROW AND CURRENT ROW) AS peer_max
        |  FROM p)
        |SELECT p_brand, p_partkey, c AS price_cents, p_size
        |FROM w
        |WHERE NOT (coalesce(prev_max >= p_size, false) OR peer_max > p_size)""".stripMargin
  )
}
