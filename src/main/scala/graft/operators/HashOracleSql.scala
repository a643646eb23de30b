package graft.operators

/** DuckDB SQL builders for the engine's 64-bit hash kernels
  * (`functions/TextKernels.scala`: `mix64` splitmix avalanche,
  * `gramHash` poly-31, `simHash` token bit-votes), so q27/q30 can be
  * oracle-gated instead of rows-only.
  *
  * DuckDB has no wrapping 64-bit integer ops, so every value rides
  * HUGEINT in [0, 2^64): wrapping ADD/poly-step is `% 2^64`; the
  * wrapping MULTIPLY splits the left operand into 32-bit limbs
  * (`a·b mod 2^64 = (al·b + ((ah·b) mod 2^32)·2^32) mod 2^64` — every
  * intermediate < 2^97, inside HUGEINT); unsigned shift is integer
  * division by 2^n; XOR is DuckDB's native `xor`, which accepts
  * HUGEINT. The signed view (for outputs and for MIN, which the
  * kernel takes over SIGNED longs) subtracts 2^64 above 2^63.
  *
  * Token/gram parity note: the kernels fold UTF-16 code units, the
  * SQL folds `ord()` codepoints — identical on the ASCII fixtures
  * (same caveat `gramHashes` documents for q28's oracle).
  */
private[operators] object HashOracleSql {
  private val U64 = "CAST('18446744073709551616' AS HUGEINT)"
  private def u(c: Long): String = java.lang.Long.toUnsignedString(c)

  private def mulmod(a: String, b: Long): String =
    s"((($a) % 4294967296) * ${u(b)} + " +
      s"(((($a) // 4294967296) * ${u(b)}) % 4294967296) * 4294967296) % $U64"
  private def shr(a: String, n: Int): String =
    s"(($a) // CAST('${BigInt(1) << n}' AS HUGEINT))"
  private def s64(a: String): String =
    s"CAST(CASE WHEN ($a) >= CAST('9223372036854775808' AS HUGEINT) " +
      s"THEN ($a) - $U64 ELSE ($a) END AS BIGINT)"

  /** mix64 as a 3-CTE stage chain over column `col` of CTE `from`,
    * emitting CTEs `${p}1..${p}3` and a final `${p}h` with column `hm`.
    */
  private def mix64Ctes(p: String, from: String, col: String): String = {
    def x(a: String, b: String) = s"xor($a, $b)"
    s"""${p}1 AS (SELECT doc_id, ($col + ${u(0x9e3779b97f4a7c15L)}) % $U64 AS z1 FROM $from),
       |${p}2 AS (SELECT doc_id, ${mulmod(x("z1", shr("z1", 30)), 0xbf58476d1ce4e5b9L)} AS z2 FROM ${p}1),
       |${p}3 AS (SELECT doc_id, ${mulmod(x("z2", shr("z2", 27)), 0x94d049bb133111ebL)} AS z3 FROM ${p}2),
       |${p}h AS (SELECT doc_id, xor(z3, ${shr("z3", 31)}) AS hm FROM ${p}3)""".stripMargin
  }

  /** CTE chain `n, gpos, g1..g3, gh, fp`: per-doc winnowing-style
    * fingerprint = MIN over positions of the SIGNED mixed 8-gram
    * poly-31 hash (`docFingerprint`). Sub-8-char docs take the
    * kernel's `mix64(String.hashCode)` fallback, reproduced here as a
    * single gpos row: the int32-wrapping poly-31 fold, sign-extended
    * to the unsigned-64 view, then the SAME mix chain — so the oracle
    * is TOTAL and a short-doc corpus diverges loudly in the hash
    * compare instead of silently dropping rows.
    */
  private val fpCtes: String = {
    var h = "CAST(1125899906842597 AS HUGEINT)"
    for (j <- 0 until 8)
      h = s"(($h)*31 + ord(substring(t, i+$j, 1))) % $U64"
    // Java String.hashCode: signed-int32 31-fold (h starts at 0);
    // .toLong sign-extends, so the u64 view adds 2^64 - 2^32 above 2^31
    val hc32 =
      "list_reduce(list_prepend(CAST(0 AS HUGEINT), " +
        "list_transform(range(1, length(t)+1), " +
        "i -> CAST(ord(substring(t,i,1)) AS HUGEINT))), " +
        "(h, c) -> (h*31 + c) % 4294967296)"
    val hcU64 = s"(CASE WHEN ($hc32) < 2147483648 THEN ($hc32) " +
      s"ELSE ($hc32) - 4294967296 + $U64 END)"
    s"""n AS (SELECT doc_id, text AS t FROM documents),
       |gpos AS (SELECT doc_id, $h AS h0
       |         FROM n, UNNEST(range(1, length(t) - 6)) AS u(i)
       |         WHERE length(t) >= 8
       |         UNION ALL
       |         SELECT doc_id, $hcU64 AS h0 FROM n WHERE length(t) < 8),
       |${mix64Ctes("g", "gpos", "h0")},
       |fp AS (SELECT doc_id, MIN(${s64("hm")}) AS fingerprint
       |       FROM gh GROUP BY doc_id)""".stripMargin
  }

  /** CTE chain `n, tok, t0, m1..m3, mh, vt, sim`: per-doc 64-bit
    * SimHash — whitespace tokens, poly-31 folded by `list_reduce`
    * (variable token length), mix64, then 64 per-bit majority votes.
    * `sim` carries both the unsigned (`simu`, for band keys) and
    * signed (`sig`) views.
    */
  private val simCtes: String = {
    val poly =
      "list_reduce(list_prepend(CAST(1125899906842597 AS HUGEINT), " +
        "list_transform(range(1, length(tk)+1), " +
        "i -> CAST(ord(substring(tk,i,1)) AS HUGEINT))), " +
        s"(h, c) -> (h*31 + c) % $U64)"
    val votes = (0 until 64).map { b =>
      s"SUM(CASE WHEN (hm // CAST('${BigInt(1) << b}' AS HUGEINT)) % 2 = 1 " +
        s"THEN 1 ELSE -1 END) AS v$b"
    }.mkString(", ")
    val bits = (0 until 64).map { b =>
      s"CASE WHEN v$b > 0 THEN CAST('${BigInt(1) << b}' AS HUGEINT) ELSE 0 END"
    }.mkString(" + ")
    s"""tok AS (SELECT doc_id, tk FROM (
       |    SELECT doc_id, unnest(string_split_regex(t, '\\s+')) AS tk FROM n)
       |  WHERE length(tk) > 0),
       |t0 AS (SELECT doc_id, $poly AS h0 FROM tok),
       |${mix64Ctes("m", "t0", "h0")},
       |vt AS (SELECT doc_id, $votes FROM mh GROUP BY doc_id),
       |sim0 AS (SELECT doc_id, ($bits) AS simu, ${s64(s"($bits)")} AS sig
       |        FROM vt),
       |sim AS (SELECT n.doc_id, COALESCE(simu, 0) AS simu,
       |          COALESCE(sig, CAST(0 AS BIGINT)) AS sig
       |        FROM n LEFT JOIN sim0 USING (doc_id))""".stripMargin
  }

  /** q27 oracle: (doc_id, fingerprint, simhash). `sim` is TOTAL over
    * the doc set (a doc with no tokens has no vote rows, but the
    * kernel still emits simhash 0 — all 64 votes negative), so the
    * join drops nothing.
    */
  val q27Oracle: String =
    s"""WITH $fpCtes,
       |$simCtes
       |SELECT fp.doc_id, fingerprint, sig AS simhash
       |FROM fp JOIN sim USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  /** q30 oracle: SimHash near-dup pairs via the same lossless 4-band
    * blocking the Spark side uses (16-bit band keys off the unsigned
    * view), Hamming via `bit_count(xor)` on the signed view.
    */
  val q30Oracle: String = {
    val bands = (0 until 4).map { i =>
      s"SELECT doc_id, $i AS band, " +
        s"(simu // CAST('${BigInt(1) << (16 * i)}' AS HUGEINT)) % 65536 AS key, sig FROM sim"
    }.mkString(" UNION ALL ")
    s"""WITH n AS (SELECT doc_id, text AS t FROM documents),
       |$simCtes,
       |bands AS ($bands)
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
       |FROM bands a JOIN bands b USING (band, key)
       |WHERE a.doc_id < b.doc_id
       |  AND bit_count(xor(a.sig, b.sig)) <= 3
       |ORDER BY doc_a, doc_b""".stripMargin
  }
}
