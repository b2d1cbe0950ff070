package graft

import graft.functions.{GraftFunctions, TextBpe}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** BPE tokenizer kernel: semantics, the kernel≡oracle-replay equivalence
  * (the property the recursive-CTE oracle rests on), and plan shape. */
class BpeSpec extends SparkSpec {

  private def enc(s: String): Seq[String] = TextBpe.encodeJava(s).asScala.toSeq

  test("normalization: ASCII lowercase, strip, space marker") {
    assert(TextBpe.normalize("Hello, World! 42") == "hello_world_42")
    assert(TextBpe.normalize("\tnew\nline") == "newline") // \t,\n stripped, no space
    assert(TextBpe.normalize("汉字 only") == "_only")
    assert(TextBpe.normalize("") == "")
  }

  test("known words tokenize through the pinned merges") {
    // "the" = (t,h)->th then (th,e)->the
    assert(enc("the") == Seq("the"))
    // "testing": t,e,s,t,i,n,g -> min-rank (i,n)r2 -> (e,s)r10 -> (in,g)r31
    // -> [t, es, t, ing] ... then (es,t)? not a rule; (t,es)? not a rule
    assert(enc("testing") == Seq("t", "es", "t", "ing"))
    // word-boundary marker merges: " the" -> _the via (_ , the)
    assert(enc("on the mat") == Seq("on", "_the", "_", "m", "at"))
    assert(enc("") == Seq.empty)
  }

  test("kernel ≡ sequential-replace oracle replay on random inputs") {
    val rnd = new scala.util.Random(13)
    val alphabet = "aethinorsdg_ 0THE.!x" // dense in merge-active chars
    for (i <- 1 to 2000) {
      val len = rnd.nextInt(60)
      val s = Seq.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString
      val k = TextBpe.encodeJava(s).asScala.toSeq
      val r = TextBpe.replayJava(s).asScala.toSeq
      assert(k == r, s"mismatch on <$s>: kernel=$k replay=$r")
      // concatenated tokens reconstruct the normalized string (lossless)
      assert(k.mkString == TextBpe.normalize(s))
    }
  }

  test("bpeCount agrees with the token array; kernels stay in codegen") {
    GraftFunctions.register(spark)
    // spark.range (not a local Seq): ConvertToLocalRelation would fold a
    // LocalRelation projection at plan time and leave no codegen stage
    val df = spark.range(1, 4).toDF("id")
      .select(col("id"),
        when(col("id") === 1, "the testing of the tokenizer")
          .when(col("id") === 2, "").otherwise("汉字").as("text"))
      .select(col("id"),
        size(GraftFunctions.bpeTokens(col("text"))).cast("long").as("n_arr"),
        GraftFunctions.bpeCount(col("text")).as("n_cnt"))
    val rows = df.collect()
    assert(rows.forall(r => r.getLong(1) == r.getLong(2)))
    assert(rows.find(_.getLong(0) == 2L).get.getLong(1) == 0L)
    // whole-stage codegen must cover the kernel projection (StaticInvoke,
    // not a UDF): the formatted plan shows the project inside a codegen span
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)") || plan.contains("WholeStageCodegen"),
      s"kernel projection fell out of codegen:\n$plan")
  }

  test("bpePairsWith ≡ exploded adjacent pairs of bpeTokensWith (random specs)") {
    // the pre-aggregated kernel that feeds bpeTrain's inner loop must
    // count exactly what the explode formulation counted, pair strings
    // rendered identically, for empty/runtime-spec tables alike
    GraftFunctions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val alphabet = "aethinorsdg_ 0x"
    val texts = Seq.fill(40)(
      Seq.fill(rnd.nextInt(80))(alphabet(rnd.nextInt(alphabet.length))).mkString)
    for (spec <- Seq("", "t h", "t h,th e,e s", "a t,_ t")) {
      val df = texts.toDF("text")
      val viaExplode = df
        .select(GraftFunctions.bpeTokensWith(col("text"), spec).as("t"))
        .where(size(col("t")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(t)-2), i -> concat(t[i], ' ', t[i+1]))")).as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("cnt"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val viaKernel = df
        .select(explode(GraftFunctions.bpePairsWith(col("text"), spec)).as("pc"))
        .groupBy(col("pc.pair").as("pair")).agg(sum(col("pc.cnt")).as("cnt"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(viaKernel == viaExplode, s"pair-count mismatch for spec '$spec'")
    }
  }

  test("bpePairs (pinned table) ≡ exploded adjacent pairs of bpeTokens") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val alphabet = "aethinorsdg_ 0x.QZ"
    val texts = "the cat sat on the mat" +: Seq.fill(40)(
      Seq.fill(rnd.nextInt(120))(alphabet(rnd.nextInt(alphabet.length))).mkString)
    val df = texts.toDF("text")
    val viaExplode = df
      .select(GraftFunctions.bpeTokens(col("text")).as("t"))
      .where(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(t)-2), i -> concat(t[i], ' ', t[i+1]))")).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val viaKernel = df
      .select(explode(GraftFunctions.bpePairs(col("text"))).as("pc"))
      .groupBy(col("pc.pair").as("pair")).agg(sum(col("pc.cnt")).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(viaKernel == viaExplode)
  }

  test("incremental byte-id state ≡ full re-encode under the grown table " +
      "(r18 training-state kernels, random inputs)") {
    // the property q_bpe_train's rewrite rests on: charIds advanced by one
    // bpeMergeOne pass per rank reproduces bpeWith's full re-encode, and
    // bpePairIdCounts counts exactly what bpePairsWith counts
    val rnd = new scala.util.Random(29)
    val alphabet = "aethinorsdg_ 0x"
    // a well-formed ladder like a training loop produces (each side formed)
    val specMerges = Seq("t" -> "h", "e" -> "s", "th" -> "e", "a" -> "t",
      "_" -> "at", "es" -> "t")
    def u8(s: String) = org.apache.spark.unsafe.types.UTF8String.fromString(s)
    for (_ <- 1 to 500) {
      val len = rnd.nextInt(90)
      val s = Seq.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString
      // advance the byte state one merge pass per rank
      var state = TextBpe.bpeCharIds(u8(s))
      val tok = scala.collection.mutable.ArrayBuffer.empty[String]
      var ci = 0
      while (ci < 26) { tok += ('a' + ci).toChar.toString; ci += 1 }
      while (ci < 36) { tok += ('0' + ci - 26).toChar.toString; ci += 1 }
      tok += "_"
      specMerges.zipWithIndex.foreach { case ((a, b), r) =>
        val aId = tok.indexOf(a); val bId = tok.indexOf(b)
        assert(aId >= 0 && bId >= 0)
        state = TextBpe.bpeMergeOne(state, aId, bId, tok.length)
        tok += a + b
        // state decoded through the surface table ≡ full re-encode at rank r
        val spec = specMerges.take(r + 1).map { case (x, y) => s"$x $y" }.mkString(",")
        val full = TextBpe.bpeWith(u8(s), u8(spec))
        val fullToks = (0 until full.numElements())
          .map(i => full.getUTF8String(i).toString)
        val stateToks = state.map(id => tok(id & 0x7f)).toSeq
        assert(stateToks == fullToks,
          s"state != re-encode at rank ${r + 1} on <$s>")
        // pair histogram over the byte state ≡ the string-pair kernel
        val viaIds = {
          val ad = TextBpe.bpePairIdCounts(state)
          (0 until ad.numElements()).map { i =>
            val row = ad.getStruct(i, 2)
            val k = row.getLong(0)
            (tok((k >>> 7).toInt) + " " + tok((k & 0x7f).toInt), row.getLong(1))
          }.toMap
        }
        val viaStrings = {
          val ad = TextBpe.bpePairsWith(u8(s), u8(spec))
          (0 until ad.numElements()).map { i =>
            val row = ad.getStruct(i, 2)
            (row.getUTF8String(0).toString, row.getLong(1))
          }.toMap
        }
        assert(viaIds == viaStrings, s"histogram mismatch at rank ${r + 1} on <$s>")
      }
    }
  }
}
