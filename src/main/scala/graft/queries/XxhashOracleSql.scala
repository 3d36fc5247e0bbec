package graft.queries

/** DuckDB SQL generators that replay Spark's `xxhash64` (XXH64, seed 42)
  * and the splitmix plane mix bit-for-bit, closing the oracle gap for the
  * five production-hash pipelines (`q_simhash`, `q_rolling_fp`,
  * `q_minhash_lsh`, `q_knn_lsh`, `q_knn_ivf`) that were previously
  * rows-only checked with fully-oracled portable twins.
  *
  * Three mechanics make XXH64 expressible as ONE DuckDB statement:
  *
  *  1. **Wraparound arithmetic in HUGEINT.** DuckDB has no mod-2⁶⁴
  *     integer ring; `mul64` splits the left operand into 32-bit halves
  *     so every intermediate fits a 128-bit HUGEINT, then reduces mod
  *     2⁶⁴ back to UBIGINT. Rotations build from a HUGEINT left shift
  *     (the `<<` operator overflow-checks) plus a logical right shift.
  *  2. **MATERIALIZED CTE chains.** Each mixing step references its
  *     predecessor 2-3 times; DuckDB inlines plain CTEs and lateral
  *     aliases TEXTUALLY, so a 25-step chain would explode to 2²⁵ plan
  *     nodes (measured: planning hangs). One MATERIALIZED CTE per step
  *     is a hard optimizer barrier — planning and execution stay linear
  *     in chain length.
  *  3. **Hashing DISTINCT values only.** Token strings (31-word corpus
  *     vocabulary), shingle triples (≤ |vocab|³), and permutation inputs
  *     are hashed once per distinct value and joined back, so the chain
  *     tables stay bounded by vocabulary — not corpus — size.
  *
  * The byte-level semantics mirror Spark's `XXH64.hashUTF8String` /
  * `hashLong` / `hashInt` (validated value-for-value against
  * `F.xxhash64` output for string lengths 0-40, longs, ints, and
  * multi-arg seed chaining). String hashing here supports ASCII tokens
  * of 1-31 bytes — beyond that the SQL `error()`s loudly rather than
  * silently mismatching (the ≥32-byte stripe loop is deliberately not
  * generated; corpus tokens are ≤8 bytes).
  */
private[queries] object XxhashOracleSql {

  private val M64 = "18446744073709551616" // 2^64
  private val P1 = "11400714785074694791::UBIGINT"
  private val P2 = "14029467366897019727::UBIGINT"
  private val P3 = "1609587929392839161::UBIGINT"
  private val P4 = "9650029242287828579::UBIGINT"
  private val P5 = "2870177450012600261::UBIGINT"

  /** (a*b) mod 2^64 via 32-bit splitting of `a`; operands must be cheap
    * expressions (column names) — each is referenced twice. */
  private def mul64(a: String, b: String): String =
    s"CAST((( ($a % 4294967296) * CAST($b AS HUGEINT)" +
      s" + (($a // 4294967296) * CAST($b AS HUGEINT) % 4294967296) * 4294967296 )" +
      s" % $M64) AS UBIGINT)"

  private def add64(a: String, b: String): String =
    s"CAST((CAST($a AS HUGEINT) + CAST($b AS HUGEINT)) % $M64 AS UBIGINT)"

  /** rotl64: HUGEINT-shift high part (bottom r bits zero) + logical low. */
  private def rotl(a: String, r: Int): String =
    s"(CAST((CAST($a AS HUGEINT) * ${BigInt(1) << r}) % $M64 AS UBIGINT)" +
      s" + ($a >> ${64 - r}))"

  /** signed BIGINT expression -> two's-complement UBIGINT. */
  private def u64(e: String): String =
    s"CAST((CAST($e AS HUGEINT) % $M64 + $M64) % $M64 AS UBIGINT)"

  /** UBIGINT column -> signed BIGINT (Spark LongType bit pattern). */
  private def i64(u: String): String =
    s"CAST(CASE WHEN $u >= 9223372036854775808::UBIGINT" +
      s" THEN CAST($u AS HUGEINT) - $M64 ELSE CAST($u AS HUGEINT) END AS BIGINT)"

  /** Linear builder of MATERIALIZED CTE steps over a base relation; each
    * step adds one column computed from the previous step's columns. */
  private final class Chain(pfx: String, base: String, var cols: Seq[String]) {
    private var n = 0
    private val ctes = scala.collection.mutable.ArrayBuffer[(String, String)]((s"${pfx}_s0", base))

    def step(newCol: String, expr: String): String = {
      val prev = s"${pfx}_s$n"
      n += 1
      ctes += ((s"${pfx}_s$n", s"SELECT ${(cols :+ s"$expr AS $newCol").mkString(", ")} FROM $prev"))
      cols = cols :+ newCol
      newCol
    }

    /** Drop columns no longer needed by later steps (keeps the
      * materialized intermediates narrow). */
    def carry(keep: Seq[String]): Unit = { cols = keep }

    def last: String = s"${pfx}_s$n"
    def cteSql: String = ctes.map { case (name, sql) => s"$name AS MATERIALIZED ($sql)" }.mkString(",\n")
  }

  /** fmix finishing steps. `keep` = columns that must survive past this
    * sub-chain; every step prunes everything else (each materialized CTE
    * copies all carried columns, so stale intermediates cost real time on
    * wide tables — measured ~40% of the 870k-row permutation chain). */
  private def fmixSteps(ch: Chain, h0: String, t: String, keep: Seq[String]): String = {
    ch.carry(keep :+ h0)
    val f1 = ch.step(s"${t}f1", s"xor($h0, ($h0 >> 33))")
    ch.carry(keep :+ f1)
    val f2 = ch.step(s"${t}f2", mul64(f1, P2))
    ch.carry(keep :+ f2)
    val f3 = ch.step(s"${t}f3", s"xor($f2, ($f2 >> 29))")
    ch.carry(keep :+ f3)
    val f4 = ch.step(s"${t}f4", mul64(f3, P3))
    ch.carry(keep :+ f4)
    ch.step(s"${t}f5", s"xor($f4, ($f4 >> 32))")
  }

  /** XXH64 of an 8-byte value (Spark's hashLong); inp/seed are columns. */
  private def hashLongSteps(ch: Chain, inp: String, seed: String, t: String,
                            keep: Seq[String]): String = {
    ch.carry(keep ++ Seq(inp, seed))
    val h0 = ch.step(s"${t}h0", add64(add64(seed, P5), "8::UBIGINT"))
    ch.carry(keep ++ Seq(inp, h0))
    val k1a = ch.step(s"${t}k1a", mul64(inp, P2))
    ch.carry(keep ++ Seq(h0, k1a))
    val k1b = ch.step(s"${t}k1b", rotl(k1a, 31))
    ch.carry(keep ++ Seq(h0, k1b))
    val k1 = ch.step(s"${t}k1", mul64(k1b, P1))
    ch.carry(keep ++ Seq(h0, k1))
    val h1 = ch.step(s"${t}h1", s"xor($h0, $k1)")
    ch.carry(keep :+ h1)
    val h2 = ch.step(s"${t}h2", rotl(h1, 27))
    ch.carry(keep :+ h2)
    val h3 = ch.step(s"${t}h3", add64(mul64(h2, P1), P4))
    fmixSteps(ch, h3, t, keep)
  }

  /** XXH64 of a 4-byte value (Spark's hashInt); inp is the int's unsigned
    * 32-bit pattern as a UBIGINT column/cheap expression. */
  private def hashIntSteps(ch: Chain, inp: String, seed: String, t: String,
                           keep: Seq[String]): String = {
    ch.carry(keep ++ Seq(inp, seed))
    val g0 = ch.step(s"${t}g0", add64(add64(seed, P5), "4::UBIGINT"))
    ch.carry(keep ++ Seq(inp, g0))
    val g1 = ch.step(s"${t}g1", mul64(inp, P1))
    ch.carry(keep ++ Seq(g0, g1))
    val g2 = ch.step(s"${t}g2", s"xor($g0, $g1)")
    ch.carry(keep :+ g2)
    val g3 = ch.step(s"${t}g3", rotl(g2, 23))
    ch.carry(keep :+ g3)
    val g4 = ch.step(s"${t}g4", add64(mul64(g3, P2), P3))
    fmixSteps(ch, g4, t, keep)
  }

  private def byteAt(s: String, j: Int): String =
    s"CASE WHEN length($s) >= $j THEN CAST(ord(substr($s, $j, 1)) AS UBIGINT) ELSE 0::UBIGINT END"

  private def wordLe(s: String, off: Int, nBytes: Int): String =
    "(" + (0 until nBytes).map(j => s"${byteAt(s, off + j)} * ${BigInt(256).pow(j)}::UBIGINT")
      .mkString(" + ") + ")"

  /** XXH64 of an ASCII string column with length 1..31 — Spark's
    * hashUTF8String below the 32-byte stripe threshold: guarded 8-byte
    * word rounds, one guarded 4-byte round, up to 3 byte rounds, fmix.
    * Non-ASCII or ≥32-byte input raises a DuckDB error (never silently
    * mismatches). */
  private def tokenHashSteps(ch: Chain, s: String, t: String, seed: String = "42::UBIGINT"): String = {
    val ln = ch.step(s"${t}len",
      s"CASE WHEN octet_length(encode($s)) <> length($s) OR length($s) > 31" +
        s" THEN CAST(error('xxhash64 oracle: token not ASCII or too long: ' || $s) AS UBIGINT)" +
        s" ELSE CAST(length($s) AS UBIGINT) END")
    val w1 = ch.step(s"${t}w1", wordLe(s, 1, 8))
    val w2 = ch.step(s"${t}w2", wordLe(s, 9, 8))
    val w3 = ch.step(s"${t}w3", wordLe(s, 17, 8))
    var acc = ch.step(s"${t}a0", add64(add64(seed, P5), ln))
    for ((r, w) <- Seq((1, w1), (2, w2), (3, w3))) {
      val k1a = ch.step(s"${t}r${r}a", mul64(w, P2))
      val k1b = ch.step(s"${t}r${r}b", rotl(k1a, 31))
      val k1 = ch.step(s"${t}r${r}c", mul64(k1b, P1))
      val x1 = ch.step(s"${t}r${r}d", s"xor($acc, $k1)")
      val x2 = ch.step(s"${t}r${r}e", rotl(x1, 27))
      val x3 = ch.step(s"${t}r${r}f", add64(mul64(x2, P1), P4))
      acc = ch.step(s"${t}a$r", s"CASE WHEN $ln >= ${8 * r} THEN $x3 ELSE $acc END")
    }
    val off = ch.step(s"${t}off", s"CAST(($ln // 8) * 8 AS BIGINT)")
    val w4 = ch.step(s"${t}w4",
      "(" + (0 until 4).map(j =>
        s"(CASE WHEN length($s) >= CAST($off AS INT) + ${j + 1}" +
          s" THEN CAST(ord(substr($s, CAST($off AS INT) + ${j + 1}, 1)) AS UBIGINT)" +
          s" ELSE 0::UBIGINT END) * ${BigInt(256).pow(j)}::UBIGINT").mkString(" + ") + ")")
    val q1 = ch.step(s"${t}q1", mul64(w4, P1))
    val q2 = ch.step(s"${t}q2", s"xor($acc, $q1)")
    val q3 = ch.step(s"${t}q3", rotl(q2, 23))
    val q4 = ch.step(s"${t}q4", add64(mul64(q3, P2), P3))
    acc = ch.step(s"${t}a4", s"CASE WHEN $ln - ($ln // 8) * 8 >= 4 THEN $q4 ELSE $acc END")
    val off4 = ch.step(s"${t}off4",
      s"CAST(($ln // 8) * 8 + (CASE WHEN $ln - ($ln // 8) * 8 >= 4 THEN 4 ELSE 0 END) AS BIGINT)")
    for (j <- 1 to 3) {
      val bj = ch.step(s"${t}b$j",
        s"CASE WHEN length($s) >= CAST($off4 AS INT) + $j" +
          s" THEN CAST(ord(substr($s, CAST($off4 AS INT) + $j, 1)) AS UBIGINT)" +
          s" ELSE 0::UBIGINT END")
      val y1 = ch.step(s"${t}y${j}a", s"xor($acc, ${mul64(bj, P5)})")
      val y2 = ch.step(s"${t}y${j}b", mul64(s"(${rotl(y1, 11)})", P1))
      acc = ch.step(s"${t}a${4 + j}", s"CASE WHEN CAST($ln AS BIGINT) >= $off4 + $j THEN $y2 ELSE $acc END")
    }
    fmixSteps(ch, acc, t, Seq(s))
  }

  // ---------------------------------------------------------------------
  // q_simhash: per-token XXH64 votes ±1 per bit; bit set iff votes > 0
  // (mirrors graft.functions.SimHash64 exactly, incl. the multiset).
  // ---------------------------------------------------------------------
  /** q_stratified_sample: Spark's `xxhash64(doc_id)` (hashLong, seed 42)
    * replayed per document, then the same rank-by-(hash, id) window and
    * k-per-stratum cut. doc_id must be non-negative (true at every SF by
    * construction) for the UBIGINT bit-pattern cast to be the identity. */
  def stratifiedSampleOracle(k: Int): String = {
    val ch = new Chain("ss",
      "SELECT doc_id, lang, n_chars, CAST(doc_id AS UBIGINT) AS du FROM documents",
      Seq("doc_id", "lang", "n_chars", "du"))
    val fin = hashLongSteps(ch, "du", "42::UBIGINT", "x",
      keep = Seq("doc_id", "lang", "n_chars"))
    s"""WITH ${ch.cteSql},
       |__h AS (SELECT doc_id, lang, n_chars, ${i64(fin)} AS h FROM ${ch.last}),
       |__r AS (
       |  SELECT lang, doc_id, n_chars,
       |         row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn
       |  FROM __h)
       |SELECT lang, doc_id, n_chars, CAST(rn AS INT) AS rn
       |FROM __r WHERE rn <= $k""".stripMargin
  }

  val simhashOracle: String = {
    val ch = new Chain("th", "SELECT DISTINCT t FROM __toks", Seq("t"))
    val fin = tokenHashSteps(ch, "t", "z")
    s"""WITH __toks AS MATERIALIZED (
       |  SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS t
       |  FROM documents),
       |${ch.cteSql},
       |__th AS MATERIALIZED (SELECT t, $fin AS hu FROM ${ch.last}),
       |__tokc AS MATERIALIZED (
       |  SELECT doc_id, t, count(*) AS cnt FROM __toks GROUP BY doc_id, t),
       |__tb AS MATERIALIZED (
       |  SELECT h.t, b.b,
       |         CASE WHEN (h.hu >> CAST(b.b AS INT)) % 2 = 1 THEN 1 ELSE -1 END AS s
       |  FROM __th h, range(0, 64) b(b)),
       |__votes AS (
       |  SELECT k.doc_id, tb.b, sum(k.cnt * tb.s) AS v
       |  FROM __tokc k JOIN __tb tb USING (t)
       |  GROUP BY k.doc_id, tb.b)
       |SELECT doc_id,
       |       ${i64("CAST(coalesce(sum(CASE WHEN v > 0 THEN CAST(1 AS HUGEINT) << CAST(b AS INT) ELSE 0 END), 0) % " + M64 + " AS UBIGINT)")} AS simhash
       |FROM __votes GROUP BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_rolling_fp: closed form of the fold acc = pmod(acc*257 + pmod(h,M), M)
  // -> fp = Σ pmod(h_i, M)·257^(k-i) mod M, powers from a recursive CTE.
  // ---------------------------------------------------------------------
  val rollingFpOracle: String = {
    val ch = new Chain("rh", "SELECT DISTINCT t FROM __toks", Seq("t"))
    val fin = tokenHashSteps(ch, "t", "z")
    s"""WITH __toksl AS MATERIALIZED (
       |  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS ts
       |  FROM documents),
       |__toks AS MATERIALIZED (
       |  SELECT doc_id, i, ts[CAST(i AS INT)] AS t FROM (
       |    SELECT doc_id, ts, unnest(range(1, len(ts) + 1)) AS i FROM __toksl)),
       |${ch.cteSql},
       |__th AS MATERIALIZED (
       |  SELECT t, ((${i64(fin)} % 1000000007) + 1000000007) % 1000000007 AS hp
       |  FROM ${ch.last}),
       |__pows AS MATERIALIZED (
       |  WITH RECURSIVE p(j, v) AS (
       |    SELECT 0, CAST(1 AS BIGINT)
       |    UNION ALL
       |    SELECT j + 1, v * 257 % 1000000007 FROM p
       |    WHERE j < (SELECT coalesce(max(len(ts)), 1) FROM __toksl))
       |  SELECT j, v FROM p),
       |__terms AS (
       |  SELECT k.doc_id, h.hp * p.v % 1000000007 AS term
       |  FROM __toks k
       |  JOIN __th h USING (t)
       |  JOIN (SELECT doc_id, len(ts) AS n FROM __toksl) c USING (doc_id)
       |  JOIN __pows p ON p.j = c.n - k.i)
       |SELECT d.doc_id, CAST(coalesce(s.fp, 0) AS BIGINT) AS fp
       |FROM (SELECT doc_id FROM documents) d
       |LEFT JOIN (SELECT doc_id, sum(term) % 1000000007 AS fp FROM __terms GROUP BY doc_id) s
       |  USING (doc_id)""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_minhash_lsh: token hash -> order-sensitive 3-token hashLong chain
  // (ShingleHash64) -> per-doc DISTINCT shingles -> 32 permutations
  // hashLong(h, hashInt(k, 42)) -> per-(doc,k) SIGNED min -> 8 band
  // hashes (multi-arg xxhash64 chain over 4 slots) -> banded self-join.
  // ---------------------------------------------------------------------
  def minhashLshOracle(numPerms: Int = 32, rowsPerBand: Int = 4): String = {
    val numBands = numPerms / rowsPerBand
    val th = new Chain("mt", "SELECT DISTINCT t FROM __toks", Seq("t"))
    val thFin = tokenHashSteps(th, "t", "z")

    val sh = new Chain("ms", "SELECT DISTINCT h1, h2, h3 FROM __wins", Seq("h1", "h2", "h3"))
    val c1 = hashLongSteps(sh, "h1", "42::UBIGINT", "p", keep = Seq("h1", "h2", "h3"))
    val c2 = hashLongSteps(sh, "h2", c1, "q", keep = Seq("h1", "h2", "h3"))
    val c3 = hashLongSteps(sh, "h3", c2, "r", keep = Seq("h1", "h2", "h3"))
    sh.carry(Seq("h1", "h2", "h3", c3))

    val ks = new Chain("mk", s"SELECT CAST(k AS UBIGINT) AS ku FROM range(0, $numPerms) r(k)", Seq("ku"))
    val ksFin = hashIntSteps(ks, "ku", "42::UBIGINT", "s", keep = Seq("ku"))
    // per-permutation seed state h0 = kseed + P5 + 8 precomputed on the
    // 32-row table so the pair chain skips it
    ks.carry(Seq("ku", ksFin))
    val ksH0 = ks.step("sh0", add64(add64(ksFin, P5), "8::UBIGINT"))

    // the input mix k1 = mul64(rotl31(mul64(h, P2)), P1) is independent of
    // the permutation seed — hash it ONCE per distinct shingle (27k rows)
    // instead of per (shingle, k) pair (870k rows): the pair chain then
    // runs only the 8 seed-dependent steps
    val kh = new Chain("mh", "SELECT h FROM __shd", Seq("h"))
    val khA = kh.step("k1a", mul64("h", P2))
    kh.carry(Seq("h", khA))
    val khB = kh.step("k1b", rotl(khA, 31))
    kh.carry(Seq("h", khB))
    val khFin = kh.step("k1", mul64(khB, P1))
    kh.carry(Seq("h", khFin))

    val pm = new Chain("mp", "SELECT s.h, k.ku, s.k1, k.h0 FROM __k1 s, __kseed k",
      Seq("h", "ku", "k1", "h0"))
    val pmH1 = pm.step("uh1", "xor(h0, k1)")
    pm.carry(Seq("h", "ku", pmH1))
    val pmH2 = pm.step("uh2", rotl(pmH1, 27))
    pm.carry(Seq("h", "ku", pmH2))
    val pmH3 = pm.step("uh3", add64(mul64(pmH2, P1), P4))
    val pmFin = fmixSteps(pm, pmH3, "u", keep = Seq("h", "ku"))
    pm.carry(Seq("h", "ku", pmFin))

    val slotCols = (1 to rowsPerBand).map(r => s"su$r")
    val bh = new Chain("mb",
      s"""SELECT doc_id, b, ${(1 to rowsPerBand).map(r => s"${u64(s"s$r")} AS su$r").mkString(", ")},
         |       CAST(b AS UBIGINT) AS bu FROM __bands""".stripMargin,
      Seq("doc_id", "b") ++ slotCols :+ "bu")
    var acc = hashIntSteps(bh, "bu", "42::UBIGINT", "v", keep = Seq("doc_id", "b") ++ slotCols)
    for (r <- 1 to rowsPerBand) {
      acc = hashLongSteps(bh, s"su$r", acc, s"w$r",
        keep = Seq("doc_id", "b") ++ (r + 1 to rowsPerBand).map(j => s"su$j"))
    }
    bh.carry(Seq("doc_id", "b", acc))

    s"""WITH __toksl AS MATERIALIZED (
       |  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS ts
       |  FROM documents),
       |__toks AS MATERIALIZED (
       |  SELECT doc_id, i, ts[CAST(i AS INT)] AS t FROM (
       |    SELECT doc_id, ts, unnest(range(1, len(ts) + 1)) AS i FROM __toksl)),
       |${th.cteSql},
       |__th AS MATERIALIZED (SELECT t, $thFin AS hu FROM ${th.last}),
       |__hlist AS MATERIALIZED (
       |  SELECT k.doc_id, list(h.hu ORDER BY k.i) AS hs
       |  FROM __toks k JOIN __th h USING (t)
       |  GROUP BY k.doc_id),
       |__wins AS MATERIALIZED (
       |  SELECT doc_id, hs[CAST(i AS INT)] AS h1, hs[CAST(i AS INT) + 1] AS h2,
       |         hs[CAST(i AS INT) + 2] AS h3
       |  FROM (SELECT doc_id, hs, unnest(range(1, len(hs) - 1)) AS i FROM __hlist)
       |  WHERE len(hs) >= 3),
       |${sh.cteSql},
       |__shingle3 AS MATERIALIZED (SELECT h1, h2, h3, $c3 AS sh FROM ${sh.last}),
       |__docsh AS MATERIALIZED (
       |  SELECT DISTINCT w.doc_id, s.sh
       |  FROM __wins w JOIN __shingle3 s USING (h1, h2, h3)),
       |__shd AS MATERIALIZED (SELECT DISTINCT sh AS h FROM __docsh),
       |${ks.cteSql},
       |__kseed AS MATERIALIZED (SELECT ku, $ksH0 AS h0 FROM ${ks.last}),
       |${kh.cteSql},
       |__k1 AS MATERIALIZED (SELECT h, $khFin AS k1 FROM ${kh.last}),
       |${pm.cteSql},
       |__perm AS MATERIALIZED (
       |  SELECT h, ku, ${i64(pmFin)} AS pv FROM ${pm.last}),
       |__sig AS MATERIALIZED (
       |  SELECT doc_id, list(mn ORDER BY ku) AS sig
       |  FROM (SELECT ds.doc_id, p.ku, min(p.pv) AS mn
       |        FROM __docsh ds JOIN __perm p ON p.h = ds.sh
       |        GROUP BY ds.doc_id, p.ku)
       |  GROUP BY doc_id),
       |__bands AS MATERIALIZED (
       |  SELECT doc_id, b, ${(1 to rowsPerBand).map(r => s"sig[CAST(b AS INT) * $rowsPerBand + $r] AS s$r").mkString(", ")}
       |  FROM __sig, range(0, $numBands) r(b)),
       |${bh.cteSql},
       |__bhash AS MATERIALIZED (SELECT doc_id, b, $acc AS bh FROM ${bh.last})
       |SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS n_shared_bands
       |FROM __bhash l JOIN __bhash r ON l.b = r.b AND l.bh = r.bh
       |WHERE l.doc_id < r.doc_id
       |GROUP BY l.doc_id, r.doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_knn_lsh: splitmix plane signs (SrpBuckets.planeSign closed form —
  // z0 = plane·γ + dim·φ is position-computable, no RNG state), ordered
  // double projections, per-table sign-bit buckets, candidate join,
  // exact-cosine rerank.
  // ---------------------------------------------------------------------
  def knnLshOracle(tables: Int = 8, planes: Int = 6, k: Int = 5): String = {
    val A = "11400714819323198485::UBIGINT" // 0x9E3779B97F4A7C15
    val B = "13787848793156543929::UBIGINT" // 0xBF58476D1CE4E5B9
    val C = "10723151780598845931::UBIGINT" // 0x94D049BB133111EB
    val ch = new Chain("pl",
      s"SELECT p, d, CAST(p AS UBIGINT) AS pu, CAST(d AS UBIGINT) AS du " +
        s"FROM range(0, ${tables * planes}) r(p), range(0, 64) s(d)",
      Seq("p", "d", "pu", "du"))
    val z0 = ch.step("z0", add64(mul64("pu", A), mul64("du", B)))
    val z1 = ch.step("z1", mul64(s"xor($z0, ($z0 >> 30))", B))
    val z2 = ch.step("z2", mul64(s"xor($z1, ($z1 >> 27))", C))
    val sgn = ch.step("sgn", s"CASE WHEN xor($z2, ($z2 >> 31)) % 2 = 0 THEN -1.0 ELSE 1.0 END")
    s"""WITH ${ch.cteSql},
       |__w AS MATERIALIZED (
       |  SELECT p, list($sgn ORDER BY d) AS w FROM ${ch.last} GROUP BY p),
       |__b AS MATERIALIZED (
       |  SELECT vec_id, t,
       |         sum(CASE WHEN proj > 0 THEN CAST(1 AS BIGINT) << pp ELSE 0 END) AS bucket
       |  FROM (
       |    SELECT e.vec_id, w.p // $planes AS t, w.p % $planes AS pp,
       |           list_sum(list_transform(range(1, len(e.embedding) + 1),
       |             i -> CAST(e.embedding[i] AS DOUBLE) * w.w[CAST(i AS INT)])) AS proj
       |    FROM embeddings e, __w w)
       |  GROUP BY vec_id, t),
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS q_id, n.vec_id AS n_id
       |  FROM __b q JOIN __b n ON q.t = n.t AND q.bucket = n.bucket
       |  WHERE q.vec_id < 10 AND n.vec_id <> q.vec_id),
       |pairs AS (
       |  SELECT c.q_id, c.n_id,
       |         floor(list_cosine_similarity(
       |           list_transform(eq.embedding, x -> CAST(x AS DOUBLE)),
       |           list_transform(en.embedding, x -> CAST(x AS DOUBLE))) * 1000000 + 0.5) / 1000000 AS cos
       |  FROM cand c
       |  JOIN embeddings eq ON eq.vec_id = c.q_id
       |  JOIN embeddings en ON en.vec_id = c.n_id),
       |ranked AS (
       |  SELECT q_id, n_id, cos,
       |         CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS INT) AS rank
       |  FROM pairs)
       |SELECT q_id, n_id, cos, rank FROM ranked WHERE rank <= $k""".stripMargin
  }
}
