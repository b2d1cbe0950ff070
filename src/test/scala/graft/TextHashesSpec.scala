package graft

import graft.functions.TextHashes
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
/** Kernel-level properties of the sketch functions. */
class TextHashesSpec extends SparkSpec {

  private def arr(ss: Seq[String]) =
    new GenericArrayData(ss.map(s => UTF8String.fromString(s)).toArray[Any])

  test("minhash: deterministic, right length, multiplicity-insensitive") {
    val a = TextHashes.minhash(arr(Seq("x y z", "y z w")), 128)
    val b = TextHashes.minhash(arr(Seq("y z w", "x y z", "x y z")), 128)
    assert(a.numElements() == 128)
    assert(a.toLongArray().toSeq == b.toLongArray().toSeq)
  }

  test("minhash: signature agreement estimates Jaccard") {
    val base = (1 to 100).map(i => s"sh$i")
    val mut = base.drop(10) ++ (1 to 10).map(i => s"other$i") // J = 90/110 ≈ 0.818
    val sa = TextHashes.minhash(arr(base), 256).toLongArray()
    val sb = TextHashes.minhash(arr(mut), 256).toLongArray()
    val agree = sa.zip(sb).count { case (x, y) => x == y } / 256.0
    assert(math.abs(agree - 0.818) < 0.1, s"agreement $agree should approximate 0.818")
  }

  test("simhash: identical inputs collide; near inputs have small Hamming distance") {
    val toks = (1 to 60).map(i => s"w$i")
    val h1 = TextHashes.simhash(arr(toks))
    val h2 = TextHashes.simhash(arr(toks))
    val h3 = TextHashes.simhash(arr(toks.updated(0, "CHANGED")))
    val far = TextHashes.simhash(arr((1 to 60).map(i => s"z$i")))
    assert(h1 == h2)
    assert(java.lang.Long.bitCount(h1 ^ h3) < 12)
    assert(java.lang.Long.bitCount(h1 ^ far) > 12)
  }

  test("winnow: fingerprints are a subset-stable edit-robust sketch") {
    val toks = (1 to 200).map(i => s"t${i % 50}_$i")
    val fp1 = TextHashes.winnow(arr(toks), 4, 5).toLongArray().toSet
    val fp2 = TextHashes.winnow(arr(toks.updated(100, "EDIT")), 4, 5).toLongArray().toSet
    val overlap = fp1.intersect(fp2).size.toDouble / fp1.size
    assert(overlap > 0.8, s"one edit should preserve most fingerprints, got $overlap")
    // short input: single window
    assert(TextHashes.winnow(arr(Seq("a", "b")), 4, 5).numElements() == 0)
    assert(TextHashes.winnow(arr(Seq("a", "b", "c", "d")), 4, 5).numElements() == 1)
  }

  test("cosineF: exact on known vectors; zero-norm guarded") {
    def farr(xs: Seq[Float]) = new GenericArrayData(xs.toArray[Any])
    assert(TextHashes.cosineF(farr(Seq(1f, 0f)), farr(Seq(1f, 0f))) == 1.0)
    assert(TextHashes.cosineF(farr(Seq(1f, 0f)), farr(Seq(0f, 1f))) == 0.0)
    assert(math.abs(TextHashes.cosineF(farr(Seq(1f, 1f)), farr(Seq(1f, 0f))) - math.sqrt(0.5)) < 1e-12)
    assert(TextHashes.cosineF(farr(Seq(0f, 0f)), farr(Seq(1f, 2f))) == 0.0)
  }

  test("hyperplaneBucket: deterministic, bounded, table-dependent") {
    def farr(xs: Seq[Float]) = new GenericArrayData(xs.toArray[Any])
    val v = farr((1 to 64).map(_.toFloat))
    val b0 = TextHashes.hyperplaneBucket(v, 0, 12)
    assert(b0 == TextHashes.hyperplaneBucket(v, 0, 12))
    assert(b0 >= 0 && b0 < 4096)
    val others = (1 to 7).map(t => TextHashes.hyperplaneBucket(v, t, 12))
    assert((b0 +: others).distinct.size > 1)
  }

  test("md5-60 kernels: SQL-replayable hash, empty-input edges") {
    // md5Hash60 == ('0x' || substr(md5(s),1,15))::BIGINT — pin one value
    // computed independently (md5("hello") = 5d41402abc4b2a76...)
    assert(TextHashes.md5Hash60(UTF8String.fromString("hello")) ==
      java.lang.Long.parseLong("5d41402abc4b2a7", 16))
    // empty token array: simhash 0, winnow empty — the SQL left-join
    // coalesce path mirrors both
    assert(TextHashes.simhash60(arr(Seq.empty)) == 0L)
    assert(TextHashes.winnow60(arr(Seq.empty), 4, 5).numElements() == 0)
    assert(TextHashes.winnow60(arr(Seq("a", "b", "c", "d")), 4, 5).numElements() == 1)
    // byte features on empty payloads
    assert(TextHashes.byteEntropy(Array.emptyByteArray) == 0.0)
    assert(TextHashes.distinctBytes(Array.emptyByteArray) == 0)
    assert(TextHashes.fakeDim(Array.emptyByteArray, 0) == 64)
    assert(TextHashes.fakeDim(Array[Byte](0x7F.toByte), 0) == 64 + 0x7F)
    // entropy of a uniform 256-byte payload is exactly 8 bits/byte
    assert(TextHashes.byteEntropy((0 until 256).map(_.toByte).toArray) == 8.0)
  }

  test("gramHashes60 ≡ md5Hash60 of each space-joined k-gram, positional") {
    val toks = Seq("a", "bb", "c", "dd", "e")
    for (k <- 1 to 5) {
      val got = TextHashes.gramHashes60(arr(toks), k).toLongArray().toSeq
      val want = toks.sliding(k).map(g =>
        TextHashes.md5Hash60(UTF8String.fromString(g.mkString(" ")))).toSeq
      assert(got == want, s"k=$k")
    }
    // shorter-than-k input → empty, matching shingles()'s guard
    assert(TextHashes.gramHashes60(arr(Seq("a", "b")), 3).numElements() == 0)
    assert(TextHashes.gramHashes60(arr(Seq.empty), 2).numElements() == 0)
  }

  test("property: minhash sig of a superset never exceeds the subset sig elementwise") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 100) {
      val base = (0 until 1 + rnd.nextInt(50)).map(_ => rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString)
      val extra = (0 until rnd.nextInt(20)).map(_ => rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString)
      val sa = TextHashes.minhash(arr(base), 32).toLongArray()
      val sb = TextHashes.minhash(arr(base ++ extra), 32).toLongArray()
      // adding elements can only lower (or keep) each min
      assert(sa.zip(sb).forall { case (x, y) => y <= x })
    }
  }

  test("jaroWinkler: bit-equal to DuckDB's independent implementation on probed constants") {
    import org.apache.spark.unsafe.types.UTF8String
    def jw(a: String, b: String): Double =
      graft.functions.TextHashes.jaroWinkler(
        UTF8String.fromString(a), UTF8String.fromString(b))
    // every expected value below is the VERBATIM output of DuckDB's
    // jaro_winkler_similarity on the same pair (probed r16) — the kernel
    // replays the RapidFuzz float op order, so equality is exact, not
    // approximate
    assert(jw("martha", "marhta") == 0.9611111111111111)
    assert(jw("dwayne", "duane") == 0.8400000000000001)
    assert(jw("dixon", "dicksonx") == 0.8133333333333332)
    assert(jw("crate", "trace") == 0.7333333333333334) // prefix 0: no boost
    assert(jw("arnab", "raanb") == 0.8666666666666667)
    assert(jw("hello world", "helo world") == 0.9787878787878788)
    // odd raw transposition count (traw = 3): integer halving, t = 1
    assert(jw("abcdef", "bcadef") == 0.9444444444444445)
    // the boost-threshold boundary pair from the REAL harness corpus:
    // true jaro is exactly 7/10; the three-division accumulation lands
    // one ulp ABOVE the 0.7 literal, so the boost fires — the
    // exact-rational formulation got this wrong on first contact
    assert(jw("hot gizmo", "hot widget") == 0.8200000000000001)
    assert(jw("abc", "abd") == 0.8222222222222222) // boost at any length
    assert(jw("xy", "xz") == 0.6666666666666666)   // below threshold: none
    assert(jw("ab", "ba") == 0.0)                  // window 0: no matches
    assert(jw("aabb", "bbaa") == 0.5)
    assert(jw("", "") == 0.0)                      // DuckDB: 0, not 1
    assert(jw("abc", "") == 0.0)
    assert(jw("a", "a") == 1.0)
    assert(jw("abc", "abc") == 1.0)
    // symmetry: the jaro sum is IEEE-commutative in its first two terms
    // and matching/transpositions are direction-independent
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val a = (1 to rnd.nextInt(12)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      val b = (1 to rnd.nextInt(12)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      assert(jw(a, b) == jw(b, a), s"asymmetric on ($a, $b)")
      assert(jw(a, b) >= 0.0 && jw(a, b) <= 1.0)
    }
  }

  test("hashedWeightSum ≡ the ordered aggregate(transform(weight)) fold " +
      "it replaced (random token arrays)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val buckets = 4096
    def weightExpr(tok: org.apache.spark.sql.Column) =
      (graft.functions.GraftFunctions.md5Hash60(concat(lit("w_"),
        (graft.functions.GraftFunctions.md5Hash60(tok) % buckets)
          .cast("string"))) % 2001 - 1000) / lit(1000.0)
    val rnd = new scala.util.Random(43)
    val vocab = (1 to 50).map(i => s"tok$i")
    val rows = Seq(Seq.empty[String], Seq("a")) ++ Seq.fill(80)(
      Seq.fill(rnd.nextInt(200))(vocab(rnd.nextInt(vocab.length))))
    val df = rows.toDF("t").select(
      graft.functions.GraftFunctions.weightSum(col("t"), buckets).as("k"),
      aggregate(transform(col("t"), x => weightExpr(x)),
        lit(0.0), (a, c) => a + c).as("e"))
    df.collect().foreach { r =>
      // bit-identical, not approximately equal: same order, same adds
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("interCount ≡ size(array_intersect) on distinct long arrays " +
      "(random sets, zero values, empties, self)") {
    def larr(xs: Seq[Long]) = new GenericArrayData(xs.toArray[Any])
    val rnd = new scala.util.Random(45)
    for (_ <- 1 to 300) {
      // draw from a small domain so intersections are non-trivial; keep
      // each side DISTINCT (the kernel's documented input contract —
      // matches the array_distinct shingle sets it verifies)
      val a = rnd.shuffle((0L until 60L).toList).take(rnd.nextInt(40))
      val b = rnd.shuffle((0L until 60L).toList).take(rnd.nextInt(40))
      val want = a.toSet.intersect(b.toSet).size.toLong
      assert(TextHashes.interCount(larr(a), larr(b)) == want, s"a=$a b=$b")
      assert(TextHashes.interCount(larr(b), larr(a)) == want)
    }
    // zero values are real elements (open-addressing uses a used[] array,
    // not a 0 sentinel)
    assert(TextHashes.interCount(larr(Seq(0L, 1L)), larr(Seq(0L, 2L))) == 1L)
    assert(TextHashes.interCount(larr(Seq.empty), larr(Seq(1L))) == 0L)
    assert(TextHashes.interCount(larr(Seq(1L)), larr(Seq.empty)) == 0L)
    val s = (1L to 100L).map(_ * 0x9e3779b97f4a7c15L)
    assert(TextHashes.interCount(larr(s), larr(s)) == 100L)
  }

  test("hashedWeightSum cache cap is a memory bound, never a semantics " +
      "dial: capped ≡ uncapped bit-for-bit") {
    // distinct numBuckets from every other consumer so this test owns its
    // cache instance; cap 2 forces the inline-compute fallback for most
    // tokens while the uncapped run memoizes everything
    val buckets = 12345
    val rnd = new scala.util.Random(44)
    val vocab = (1 to 200).map(i => s"cap_tok$i")
    for (_ <- 1 to 50) {
      val toks = Seq.fill(1 + rnd.nextInt(300))(vocab(rnd.nextInt(vocab.length)))
      val capped = TextHashes.hashedWeightSumBounded(arr(toks), buckets, 2)
      val full = TextHashes.hashedWeightSumBounded(arr(toks), buckets,
        TextHashes.weightCacheMaxEntries)
      assert(java.lang.Double.doubleToLongBits(capped) ==
        java.lang.Double.doubleToLongBits(full))
      // cap 0: pure inline computation, still identical
      val none = TextHashes.hashedWeightSumBounded(arr(toks), buckets, 0)
      assert(java.lang.Double.doubleToLongBits(none) ==
        java.lang.Double.doubleToLongBits(full))
    }
  }

  test("textFeatures: exotic code points that lowercase INTO ascii alnum " +
      "stay non-word (the documented kernel contract)") {
    // ADVICE r18: U+0130 (İ → 'i'+combining dot under full Unicode
    // lowercasing), U+212A (KELVIN SIGN → 'k'), fullwidth digits — the
    // kernel ASCII-lowers only A-Z, so none of these joins a word run;
    // each counts as punct and splits its run. This test PINS that
    // contract so a future "fix" toward full-Unicode lowercasing can't
    // slip in silently (it would hash-mismatch the oracle's regex twin
    // on out-of-contract corpora in untestable ways).
    def feats(s: String): Seq[Long] =
      TextHashes.textFeatures(UTF8String.fromString(s))
        .toLongArray().toSeq
    // [n_chars, n_words, n_punct, en, de, fr, es, cjk]
    assert(feats("aİb") == Seq(3L, 2L, 1L, 1L, 0L, 0L, 0L, 0L)) // "a" is an en marker
    assert(feats("xKy") == Seq(3L, 2L, 1L, 0L, 0L, 0L, 1L, 0L)) // "y" is an es marker
    // fullwidth digits １２３ are not [0-9]
    assert(feats("１２３") == Seq(3L, 0L, 3L, 0L, 0L, 0L, 0L, 0L))
    // marker hit across an exotic break: "the" before İ still counts
    assert(feats("theİthe") == Seq(7L, 2L, 1L, 2L, 0L, 0L, 0L, 0L))
    // astral code point (surrogate pair) counts as ONE char, like
    // Spark length() on code points
    assert(feats("a😀b") == Seq(3L, 2L, 1L, 1L, 0L, 0L, 0L, 0L))
  }

  test("textFeatures ≡ the expression formulation it replaced (random " +
      "ASCII+CJK inputs)") {
    // the single-pass kernel behind qualityFeatures/langId must count
    // exactly what length / split(lower)+filter / regexp_count / marker
    // filters counted — compared against Spark's own expressions
    import org.apache.spark.sql.functions._
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(41)
    val alphabet = "the andofis der die das undistlela lesetest ellos lasy" +
      "ABC XYZ019.,!?:;-儿那 中文"
    val texts = Seq("", "the and of a is", "der und das", "el y los", "中文儿",
      "a", "is is is", "Y") ++ Seq.fill(300)(
      Seq.fill(rnd.nextInt(120))(alphabet(rnd.nextInt(alphabet.length))).mkString)
    val toks = graft.functions.GraftFunctions.tokens(col("text"))
    def hits(lang: String) = size(filter(toks,
      t => graft.operators.TextAnalysis.langMarkers(lang)
        .map(m => t === m).reduce(_ || _))).cast("long")
    val df = texts.toDF("text").select(
      graft.functions.GraftFunctions.textFeatures(col("text")).as("f"),
      length(col("text")).cast("long").as("n_chars"),
      size(toks).cast("long").as("n_words"),
      regexp_count(col("text"), lit("[^a-zA-Z0-9 ]")).cast("long").as("n_punct"),
      hits("en").as("en"), hits("de").as("de"),
      hits("fr").as("fr"), hits("es").as("es"),
      when(col("text").rlike("[\\x{4E00}-\\x{9FFF}]"), 1L).otherwise(0L).as("cjk"))
    df.collect().foreach { r =>
      val f = r.getSeq[Long](0)
      val expected = Seq(r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))
      assert(f == expected, s"kernel $f != expressions $expected")
    }
  }
}
