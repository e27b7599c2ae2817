package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.text.Bpe

class BpeSpec extends AnyFunSuite with SparkTestBase with Matchers {

  private def docs(texts: String*) = {
    val s = spark
    import s.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("learnMerges picks the highest-count pair, lexicographic tiebreak, in order") {
    // words: aa ×3, ab ×2 → round 1 merges (a,a) cnt 3, round 2 (a,b) cnt 2
    val df = docs("aa ab aa", "ab aa")
    val merges = Bpe.learnMerges(df, "text", numMerges = 5)
    merges.map(m => (m.rank, m.left, m.right, m.freq)) shouldBe
      Seq((1, "a", "a", 3L), (2, "a", "b", 2L))
    // exhausted after 2: every vocab word is a single symbol
  }

  test("tiebreak is lexicographic on (left, right)") {
    // "ba" and "ab" each once → pairs (b,a):1 and (a,b):1 → (a,b) wins
    val df = docs("ba ab")
    val merges = Bpe.learnMerges(df, "text", numMerges = 1)
    merges.head.left shouldBe "a"
    merges.head.right shouldBe "b"
  }

  test("driver-local and distributed merge loops produce identical tables") {
    // The local fast path must be bit-identical to the distributed
    // loop — counts, freqs, and the (count desc, left, right)
    // tiebreak. maxLocalVocab = 0 forces the distributed loop.
    val df = docs(
      "the cat sat on the mat", "the dog ate the cat food",
      "Dr. O'Brien said: \"stop, the cost is $12\"", "aa ab aa ba")
    for (byteLevel <- Seq(false, true)) {
      val local = Bpe.learnMerges(df, "text", numMerges = 10, byteLevel = byteLevel)
      val dist = Bpe.learnMerges(df, "text", numMerges = 10, byteLevel = byteLevel,
        maxLocalVocab = 0)
      withClue(s"byteLevel=$byteLevel: ") { local shouldBe dist }
    }
  }

  test("learnMergesLocal: lazy-invalidated queue survives count churn (pure unit)") {
    // "aaab" ×3 framed: merging (a,a) creates the NEW pair (aa,a) and
    // leaves (a,b) — the queue must re-rank from live counts, not
    // stale snapshots. Hand-computed: r1 (a,a) 6 [two slots ×3];
    // r2 ties (a,b)=3 vs (aa,a)=3 → lexicographic left "a" < "aa"
    // picks (a,b); r3 (aa,ab) 3.
    val merges = Bpe.learnMergesLocal(
      Array("|a||a||a||b|"), Array(3L), numMerges = 5)
    merges.map(m => (m.rank, m.left, m.right, m.freq)) shouldBe
      Seq((1, "a", "a", 6L), (2, "a", "b", 3L), (3, "aa", "ab", 3L))
  }

  test("pruned distributed learning: certified rounds + exact fallback match unpruned") {
    // High-frequency words dominate early rounds (margin certified);
    // as counts decay the certificate fails, the hapax tail folds
    // back in (re-framed through the learned merges), and the final
    // table's merge SEQUENCE matches exact learning everywhere.
    val common = Seq.fill(30)("thequick brownfox").mkString(" ")
    val rare = "zebra yonder xylem walnut vortex umber"
    val df = docs(common, common, rare)
    val exact = Bpe.learnMerges(df, "text", numMerges = 12, maxLocalVocab = 0)
    val pruned = Bpe.learnMerges(df, "text", numMerges = 12, maxLocalVocab = 0,
      pruneBelow = 2)
    pruned.map(m => (m.rank, m.left, m.right)) shouldBe
      exact.map(m => (m.rank, m.left, m.right))
    // Deep enough that the rare words' own pairs must appear — proof
    // the fallback actually restored them.
    exact.size shouldBe 12
  }

  test("merge-order determinism: two runs produce the identical table") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = Bpe.learnMerges(df, "text", numMerges = 8)
    val b = Bpe.learnMerges(df, "text", numMerges = 8)
    a shouldBe b
    a should have size 8
  }

  test("encode applies merges in rank order, exhaustive left-to-right") {
    // merges (a,a) then (a,b): "aaab" → [aa, ab]; "aaa" → [aa, a]
    val merges = Seq(Bpe.Merge(1, "a", "a", 3), Bpe.Merge(2, "a", "b", 2))
    val out = docs("aaab aaa")
      .select(Bpe.bpeTokens(col("text"), merges).as("t"))
      .head().getSeq[String](0)
    out shouldBe Seq("aa", "ab", "aa", "a")
  }

  test("pre-tokenization: lower, non-alphanumeric split, empties dropped") {
    val merges = Seq.empty[Bpe.Merge]
    val out = docs("  Ab,9-c!  ")
      .select(Bpe.bpeTokens(col("text"), merges).as("t"))
      .head().getSeq[String](0)
    out shouldBe Seq("a", "b", "9", "c")
  }

  test("learned merges reproduce words as single tokens once fully merged") {
    // one word repeated: enough merges collapse it back to itself
    val df = docs("table table table")
    val merges = Bpe.learnMerges(df, "text", numMerges = 10)
    val toks = Bpe.tokenize(df, "text", "doc_id", merges)
    val row = toks.orderBy("doc_id").head()
    row.getLong(1) shouldBe 3L        // n_tokens: 3 occurrences × 1 token
    row.getLong(2) shouldBe 1L        // n_unique_tokens
    row.getString(3) shouldBe "table table table"
  }

  test("chunk: sliding BPE-token windows with overlap; short doc → one window") {
    // no merges → tokens are chars; "a b c ..." of 80 single-char words
    val text = (0 until 80).map(i => ('a' + i % 26).toChar).mkString(" ")
    val df = docs(text, "ab cd")
    val out = graft.text.Bpe.chunk(df, "text", "doc_id", Seq.empty,
        maxTokens = 32, overlap = 8)
      .orderBy("doc_id", "chunk_idx").collect()
    val chunks0 = out.filter(_.getLong(0) == 0L)
    chunks0.map(_.getLong(1)) shouldBe Array(0L, 1L, 2L) // ceil((80-32)/24)+1
    chunks0.map(_.getLong(2)) shouldBe Array(32L, 32L, 32L)
    // stride 24: chunk 1 starts at token 25 (1-based) — its first 8
    // tokens are chunk 0's last 8
    val c0 = chunks0(0).getString(3).split(" ")
    val c1 = chunks0(1).getString(3).split(" ")
    c1.take(8) shouldBe c0.takeRight(8)
    val chunks1 = out.filter(_.getLong(0) == 1L)
    chunks1.map(r => (r.getLong(1), r.getLong(2), r.getString(3))) shouldBe
      Array((0L, 4L, "a b c d"))
  }

  test("merge table file round-trip: save → load → identical table and tokenization") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = Bpe.learnMerges(df, "text", numMerges = 6)
    val f = java.nio.file.Files.createTempFile("bpe_merges", ".json").toString
    try {
      Bpe.saveMerges(merges, f)
      val loaded = Bpe.loadMerges(f)
      loaded shouldBe merges
      val a = Bpe.tokenize(df, "text", "doc_id", merges).orderBy("doc_id").collect()
      val b = Bpe.tokenize(df, "text", "doc_id", loaded).orderBy("doc_id").collect()
      a.toSeq shouldBe b.toSeq
    } finally { java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(f)); () }
  }

  test("loadMerges fails loudly on malformed input") {
    val f = java.nio.file.Files.createTempFile("bpe_bad", ".json")
    try {
      java.nio.file.Files.writeString(f, """[{"rank": 2, "left": "a"}]""")
      an[IllegalArgumentException] should be thrownBy Bpe.loadMerges(f.toString)
      java.nio.file.Files.writeString(f,
        """[{"rank": 2, "left": "a", "right": "b"}, {"rank": 1, "left": "c", "right": "d"}]""")
      an[IllegalArgumentException] should be thrownBy Bpe.loadMerges(f.toString)
    } finally { java.nio.file.Files.deleteIfExists(f); () }
  }

  test("property: tokens always concatenate back to the pre-tokenized words") {
    // whatever the merge table, BPE only groups adjacent characters —
    // concatenating a doc's tokens must equal its words joined
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (rounds <- Seq(1, 4, 9)) {
      val merges = Bpe.learnMerges(df, "text", numMerges = rounds)
      val check = df.filter(col("text").isNotNull)
        .select(
          concat_ws("", Bpe.bpeTokens(col("text"), merges)).as("joined"),
          concat_ws("", filter(split(lower(col("text")), "[^a-z0-9]+"),
            w => org.apache.spark.sql.functions.length(w) > 0)).as("words"))
        .filter(col("joined") =!= col("words"))
      check.count() shouldBe 0L
    }
  }

  test("byte-level: whitespace/case/punctuation round-trip losslessly through tokens") {
    // Byte mode's whole point: nothing is destroyed before encoding.
    // Decoding the concatenated hex tokens must reproduce the EXACT
    // original text — including case, punctuation, a double space,
    // a tab, and multi-byte UTF-8.
    val df = docs(
      "Dr. O'Brien said: \"Hello,  World!\"\tcost $1,234.56",
      "plain lower text",
      "café — résumé; twice  spaced")
    for (rounds <- Seq(1, 6)) {
      val merges = Bpe.learnMerges(df, "text", numMerges = rounds, byteLevel = true)
      val bad = df
        .select(col("text"),
          decode(unhex(concat_ws("", Bpe.bpeTokens(col("text"), merges, byteLevel = true))),
            "UTF-8").as("roundtrip"))
        .filter(col("roundtrip") =!= col("text"))
      bad.count() shouldBe 0L
    }
  }

  test("byte-level: U+000B joins the whitespace pre-token run (explicit class, not \\s)") {
    // BytePattern spells whitespace out as [ \t\n\x0B\f\r] so the
    // DuckDB replay (RE2, whose \s omits VT) pre-tokenizes a vertical
    // tab identically. VT must land in a whitespace RUN, not a
    // punctuation pre-token — and round-trip losslessly.
    val vt = 11.toChar.toString  // U+000B, built from the code point
    val df = docs("a" + vt + " b")
    val merges = Bpe.learnMerges(df, "text", numMerges = 1, byteLevel = true)
    val row = df
      .select(
        decode(unhex(concat_ws("", Bpe.bpeTokens(col("text"), merges, byteLevel = true))),
          "UTF-8").as("roundtrip"),
        graft.text.Bpe.preTokensBytes(col("text")).as("pre"))
      .collect().head
    row.getString(0) shouldBe "a" + vt + " b"
    row.getSeq[String](1) shouldBe Seq("a", vt + " ", "b")
  }

  test("byte-level: merges are hex byte symbols with deterministic tiebreak") {
    // "to be to be": pre-tokens "to", " be", " to", " be" → pair
    // counts (74,6f)=2 [to], (20,62)=2 [space+b], (62,65)=2 [be],
    // (20,74)=1 — three-way count tie broken lexicographically.
    val df = docs("to be to be")
    val merges = Bpe.learnMerges(df, "text", numMerges = 3, byteLevel = true)
    merges.map(m => (m.left, m.right, m.freq)) shouldBe
      Seq(("20", "62", 2L), ("2062", "65", 2L), ("74", "6f", 2L))
  }

  test("tokenize output shape and null text → null tokens row") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Option("aa ab")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val merges = Seq(Bpe.Merge(1, "a", "a", 1))
    val out = Bpe.tokenize(df, "text", "doc_id", merges).orderBy("doc_id").collect()
    out(0).getLong(1) shouldBe 3L // aa → [aa]; ab → [a, b]
    out(1).isNullAt(1) shouldBe true
  }
}
