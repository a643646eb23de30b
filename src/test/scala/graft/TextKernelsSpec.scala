package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.TextKernels

/** Property + example tests for the scalar kernels backing the custom
  * Catalyst expressions.
  */
class TextKernelsSpec extends AnyFunSuite {
  private def u(s: String) = UTF8String.fromString(s)
  private val asciiStr = Gen.listOf(Gen.choose(' ', '~')).map(_.mkString)

  /** Deterministic property loop: 200 samples from a fixed seed
    * (scalatestplus isn't resolvable offline, so a minimal stand-in).
    */
  private def forAll[A](g: Gen[A])(f: A => Unit): Unit = {
    var seed = Seed(42L)
    (1 to 200).foreach { i =>
      g.apply(Gen.Parameters.default.withSize(i % 40), seed).foreach(f)
      seed = seed.next
    }
  }
  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(g1, g2)) { case (a, b) => f(a, b) }
  private def whenever(c: Boolean)(f: => Unit): Unit = if (c) f

  // ---- fuzz_ratio (InDel similarity, rapidfuzz fuzz.ratio semantics)
  test("fuzz_ratio: identity is 100") {
    forAll(asciiStr) { s => assert(TextKernels.indelRatio(u(s), u(s)) == 100.0) }
  }
  test("fuzz_ratio: symmetric and bounded") {
    forAll(asciiStr, asciiStr) { (a, b) =>
      val r = TextKernels.indelRatio(u(a), u(b))
      assert(r >= 0.0 && r <= 100.0)
      assert(r == TextKernels.indelRatio(u(b), u(a)))
    }
  }
  test("fuzz_ratio: known values (InDel, not Levenshtein)") {
    // "abcd" vs "abed": LCS=3, dist=8-6=2, ratio=100*(1-2/8)=75
    assert(TextKernels.indelRatio(u("abcd"), u("abed")) == 75.0)
    // disjoint alphabets -> 0
    assert(TextKernels.indelRatio(u("aaaa"), u("bbbb")) == 0.0)
    // empty vs empty -> 100; empty vs non-empty -> 0
    assert(TextKernels.indelRatio(u(""), u("")) == 100.0)
    assert(TextKernels.indelRatio(u(""), u("xyz")) == 0.0)
    // reference-style use: vowel-stripped keyword still scores high
    assert(TextKernels.indelRatio(u("ntn_0"), u("nation_0")) > 70.0)
  }

  test("bit-parallel LCS agrees with the scalar DP oracle") {
    forAll(asciiStr, asciiStr) { (a, b) =>
      assert(TextKernels.lcsLen(a, b) == TextKernels.lcsLenDP(a, b),
        s"mismatch for '$a' vs '$b'")
    }
    // exercise the multi-word (>64 chars) and unicode paths
    val long1 = "abcdefghij" * 20
    val long2 = "acegik" * 30 + "北京欢迎你"
    assert(TextKernels.lcsLen(long1, long2) == TextKernels.lcsLenDP(long1, long2))
    assert(TextKernels.lcsLen(long2, long2) == long2.length)
  }

  // ---- ascii_fold
  test("ascii_fold: strips accents, preserves base letters") {
    assert(TextKernels.asciiFold(u("Björk")).toString == "Bjork")
    assert(TextKernels.asciiFold(u("café naïve señor")).toString == "cafe naive senor")
  }
  test("ascii_fold: ASCII fixpoint and idempotence") {
    forAll(asciiStr) { s =>
      assert(TextKernels.asciiFold(u(s)).toString == s)
    }
    val tricky = "Björk ≠ café 北京"
    val once = TextKernels.asciiFold(u(tricky)).toString
    assert(TextKernels.asciiFold(u(once)).toString == once)
  }

  // ---- jaccard over char k-grams
  test("jaccard_grams: bounds, identity, symmetry") {
    forAll(asciiStr, asciiStr) { (a, b) =>
      val j = TextKernels.jaccardGrams(u(a), u(b), 3)
      assert(j >= 0.0 && j <= 1.0)
      assert(j == TextKernels.jaccardGrams(u(b), u(a), 3))
    }
    forAll(asciiStr) { s =>
      // sub-k strings have NO grams (matches the SQL-comprehension
      // oracle, whose 0/0 is NULL): similarity is 0, even to itself
      val expected = if (s.length >= 3) 1.0 else 0.0
      assert(TextKernels.jaccardGrams(u(s), u(s), 3) == expected)
    }
  }
  test("jaccard_grams: agrees with a slow set oracle") {
    def oracle(a: String, b: String, k: Int): Double = {
      def grams(s: String) =
        if (s.length < k) Set.empty[String] else s.sliding(k).toSet
      val (sa, sb) = (grams(a), grams(b))
      if (sa.isEmpty && sb.isEmpty) 0.0
      else sa.intersect(sb).size.toDouble / sa.union(sb).size
    }
    forAll(Gen.alphaStr, Gen.alphaStr) { (a, b) =>
      whenever(a.length >= 3 && b.length >= 3) {
        assert(TextKernels.jaccardGrams(u(a), u(b), 3) == oracle(a, b, 3))
      }
    }
  }

  // ---- minhash: signature similarity estimates jaccard
  test("min_hash: deterministic; near-dup signatures mostly agree") {
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val b = "the quick brown fox jumps over the lazy cat again and again"
    val sa = TextKernels.minHash(u(a), 3).toLongArray()
    val sb = TextKernels.minHash(u(b), 3).toLongArray()
    assert(sa.sameElements(TextKernels.minHash(u(a), 3).toLongArray()))
    val agree = sa.zip(sb).count { case (x, y) => x == y }
    val trueJ = TextKernels.jaccardGrams(u(a), u(b), 3)
    // 64 permutations: agreement rate within 0.25 of true jaccard whp
    assert(math.abs(agree / 64.0 - trueJ) < 0.25)
  }

  // ---- simhash: near-identical docs get near hashes
  test("sim_hash: hamming distance tracks similarity") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val base = "spark catalyst tungsten codegen shuffle partition broadcast join"
    val near = base.replace("join", "joins")
    val far = "completely different words about cooking pasta tonight ok"
    assert(ham(TextKernels.simHash(u(base)), TextKernels.simHash(u(near))) <
      ham(TextKernels.simHash(u(base)), TextKernels.simHash(u(far))))
  }

  // ---- fingerprint
  test("doc_fingerprint: content-determined, order-sensitive") {
    val a = "abcdefghijklmnop"
    assert(TextKernels.docFingerprint(u(a), 8) == TextKernels.docFingerprint(u(a), 8))
    assert(TextKernels.docFingerprint(u(a), 8) != TextKernels.docFingerprint(u(a.reverse), 8))
  }

  // ---- cosine
  test("cosine_sim: unit/orthogonal/antiparallel") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def v(xs: Float*) = new GenericArrayData(xs.toArray)
    assert(TextKernels.cosineSim(v(1f, 0f), v(1f, 0f)) == 1.0)
    assert(TextKernels.cosineSim(v(1f, 0f), v(0f, 1f)) == 0.0)
    assert(TextKernels.cosineSim(v(1f, 0f), v(-1f, 0f)) == -1.0)
    assert(TextKernels.cosineSim(v(0f, 0f), v(1f, 0f)) == 0.0) // zero-norm guard
  }

  // ---- winnowSet: the O(n) deque pass must agree with a brute
  // per-window rightmost-argmin reference, and honor the MOSS
  // guarantee: a shared substring of length >= w + k - 1 always
  // yields a shared fingerprint.
  private def winnowRef(s: String, k: Int, w: Int): Seq[Long] = {
    val P = 1048573L
    val m = s.length - k + 1
    if (m < w) return Seq.empty
    val h = (0 until m).map(i =>
      s.substring(i, i + k).foldLeft(0L)((a, c) => (a * 31 + c) % P))
    (0 to m - w).map { st =>
      val win = st until st + w
      val mn = win.map(h).min
      win.filter(p => h(p) == mn).max // rightmost minimal position
    }.map(h).distinct.sorted
  }
  private def winnowKernel(s: String, k: Int, w: Int): Seq[Long] = {
    val a = TextKernels.winnowSet(u(s), k, w)
    (0 until a.numElements()).map(a.getLong)
  }

  test("winnow_set: matches the brute rightmost-argmin reference") {
    // small alphabet + small k/w force frequent hash ties and repeated
    // grams — the cases where the deque tie rule could diverge
    val loAlpha = Gen.listOf(Gen.oneOf('a', 'b', 'c')).map(_.mkString)
    for ((k, w) <- Seq((3, 4), (5, 2), (20, 8))) {
      forAll(asciiStr) { s => assert(winnowKernel(s, k, w) == winnowRef(s, k, w)) }
      forAll(loAlpha) { s => assert(winnowKernel(s, k, w) == winnowRef(s, k, w)) }
    }
  }

  test("winnow_set: shared substring of length >= w + k - 1 shares a fingerprint") {
    val (k, w) = (20, 8)
    val alpha = Gen.listOf(Gen.alphaLowerChar).map(_.mkString)
    val shared = Gen.listOfN(w + k - 1, Gen.alphaLowerChar).map(_.mkString)
    forAll(Gen.zip(shared, alpha, alpha, alpha, alpha)) {
      case (core, p1, s1, p2, s2) =>
        val fa = winnowKernel(p1 + core + s1, k, w).toSet
        val fb = winnowKernel(p2 + core + s2, k, w).toSet
        assert((fa & fb).nonEmpty,
          s"no shared fingerprint for shared run '$core'")
    }
  }

  test("winnow_set: output is sorted distinct; short inputs are empty") {
    assert(winnowKernel("", 20, 8).isEmpty)
    assert(winnowKernel("a" * 26, 20, 8).isEmpty) // m = 7 < w
    assert(winnowKernel("a" * 27, 20, 8).size == 1) // exactly one window
    forAll(asciiStr) { s =>
      val f = winnowKernel(s, 5, 4)
      assert(f == f.distinct.sorted)
    }
  }

  // ---- cdcChunks: the O(n) rolling pass must agree with a brute
  // per-position polynomial hash, chunks must reassemble the input,
  // and boundaries must be shift-invariant (the CDC property).
  test("cdc_chunks: matches brute-force boundaries and reassembles the text") {
    val (w, div, p, b) = (8, 16, 1000003L, 31L)
    def bruteCuts(s: String): Seq[Int] = {
      val pow = (0 until w).map(j => (0 until w - 1 - j)
        .foldLeft(1L)((a, _) => a * b % p))
      (w until s.length).filter { i => // 1-based window end i in [w, n-1]
        val h = (0 until w).foldLeft(0L)((a, j) =>
          (a + s.charAt(i - w + j) * pow(j)) % p)
        h % div == 0
      }
    }
    forAll(asciiStr) { s =>
      val got = {
        val a = TextKernels.cdcChunks(u(s), w, div)
        (0 until a.numElements()).map(a.getUTF8String(_).toString)
      }
      assert(got.mkString == s, "chunks must reassemble the input")
      assert(got.forall(_.nonEmpty) || s.isEmpty || got == Seq(""))
      val cuts = got.init.scanLeft(0)(_ + _.length).drop(1)
      assert(cuts == bruteCuts(s), s"boundaries differ for '$s'")
    }
    // shift invariance: an embedded passage chunks identically far
    // from its edges — interior cuts of the passage appear at the
    // shifted offsets regardless of prefix
    val passage = "the quick brown fox jumps over the lazy dog repeatedly"
    val inner = bruteCuts(passage).filter(c => c >= w && c <= passage.length - 1)
    Seq("XX", "prefix-of-different-length-", "").foreach { pre =>
      val shifted = bruteCuts(pre + passage)
        .filter(c => c >= pre.length + w && c <= pre.length + passage.length - 1)
        .map(_ - pre.length)
      assert(inner.toSet.subsetOf(shifted.toSet),
        s"interior boundaries not shift-invariant under prefix '$pre'")
    }
  }

  // ---- IVF kernels (best_cell / top_cells): agree with a plain
  // reference ranking by (dot desc, cell asc), including ties — the
  // in-kernel selection sort permutes positions, so tie order is the
  // part most worth pinning.
  test("best_cell/top_cells: match a reference ranking, ties to lowest cell") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val dim = 8
    val k = 6
    val vecGen = Gen.listOfN(dim, Gen.choose(-5, 5)).map(_.map(_.toFloat).toArray)
    // coarse integer coordinates make exact dot-product TIES common
    val centsGen = Gen.listOfN(k * dim, Gen.choose(-2, 2)).map(_.map(_.toDouble).toArray)
    forAll(Gen.zip(vecGen, centsGen)) { case (vec, cents) =>
      val a = new GenericArrayData(vec)
      val dots = (0 until k).map { c =>
        (0 until dim).foldLeft(0.0)((s, d) => s + vec(d).toDouble * cents(c * dim + d))
      }
      val ranked = (0 until k).sortBy(c => (-dots(c), c))
      assert(TextKernels.bestCell(a, cents, k) == ranked.head)
      (1 to k).foreach { nprobe =>
        val got = TextKernels.topCells(a, cents, k, nprobe)
        assert((0 until got.numElements()).map(got.getInt) == ranked.take(nprobe))
      }
    }
  }

  // ---- sorted_inter_atleast: the q139/q144 verify kernel must agree
  // with the plain set intersection it replaces (array_intersect):
  // exact size when it reaches `need`, -1 otherwise — over every
  // early-exit path (size pigeonhole, mid-walk bound, full walk).
  test("sorted_inter_atleast (long): equals set-intersection semantics for all thresholds") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val setGen = Gen.listOf(Gen.choose(0L, 40L)).map(_.distinct.sorted.toArray)
    forAll(Gen.zip(setGen, setGen)) { case (xs, ys) =>
      val inter = xs.toSet.intersect(ys.toSet).size
      val (a, b) = (new GenericArrayData(xs), new GenericArrayData(ys))
      (0 to math.min(xs.length, ys.length) + 2).foreach { need =>
        val got = TextKernels.sortedInterAtLeastLong(a, b, need)
        assert(got == (if (inter >= need) inter else -1),
          s"xs=${xs.toList} ys=${ys.toList} need=$need got=$got inter=$inter")
      }
    }
  }
  test("sorted_inter_atleast (string): equals set-intersection semantics in UTF8 binary order") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val word = Gen.listOfN(3, Gen.choose('a', 'f')).map(_.mkString)
    val setGen = Gen.listOf(word).map(_.distinct.toArray)
    forAll(Gen.zip(setGen, setGen)) { case (xs, ys) =>
      val inter = xs.toSet.intersect(ys.toSet).size
      // Spark's sort_array order over ASCII == UTF8String.compareTo order
      def arr(ws: Array[String]) =
        new GenericArrayData(ws.sorted.map(w => UTF8String.fromString(w): Any))
      val (a, b) = (arr(xs), arr(ys))
      (0 to math.min(xs.length, ys.length) + 2).foreach { need =>
        val got = TextKernels.sortedInterAtLeastStr(a, b, need)
        assert(got == (if (inter >= need) inter else -1),
          s"xs=${xs.toList} ys=${ys.toList} need=$need got=$got inter=$inter")
      }
    }
  }
}
