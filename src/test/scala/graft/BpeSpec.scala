package graft

import graft.functions.{Bpe, TextFunctions}
import org.apache.spark.sql.functions._

/** Real BPE (learned merge tables): the Sennrich word-count fixture is
  * hand-computed, the corpus-level properties (bounds, merge-list
  * monotonicity, round-trip) hold on the real documents table, and the
  * broadcast encode expression matches the driver-side reference
  * implementation row for row.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // Sennrich-style fixture, char-level, no end marker. Pair counts:
  // e-s 9, s-t 9 (tie → lexicographically smaller ("e","s") first),
  // then ("es","t") 9, then l-o / o-w tie at 7 → ("l","o").
  private val fixture = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("learnMerges reproduces the hand-computed merge sequence") {
    val merges = Bpe.learnMerges(fixture, 3)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o")))
  }

  test("encodeWord applies merges greedily by rank") {
    val ranks = Bpe.ranksOf(Bpe.learnMerges(fixture, 3))
    assert(Bpe.encodeWord("newest", ranks).toSeq == Seq("n", "e", "w", "est"))
    assert(Bpe.encodeWord("low", ranks).toSeq == Seq("lo", "w"))
    assert(Bpe.encodeWord("x", ranks).toSeq == Seq("x"))
    assert(Bpe.encodeWord("", ranks).toSeq == Seq.empty)
    // unseen word: merges still apply where its pairs match
    assert(Bpe.encodeWord("west", ranks).toSeq == Seq("w", "est"))
  }

  test("corpus-learned encode: bounds, monotonicity, round-trip, expression parity") {
    val docs = Tables.documents(spark, sf).limit(200).cache()
    val merges = Bpe.learnFromCorpus(docs, "text", numMerges = 200)
    assert(merges.nonEmpty && merges.size <= 200)
    assert(merges.distinct.size == merges.size)

    val enc = docs.select(col("doc_id"), col("text"),
      Bpe.bpeEncode(docs, col("text"), merges).as("toks"),
      TextFunctions.bpeTokenCount(col("text")).as("pre"),
      length(col("text")).as("chars"))
    val rows = enc.select(size(col("toks")).as("n"), col("pre"), col("chars"),
      concat_ws("", col("toks")).as("joined"), col("text")).collect()
    // merges act WITHIN pre-token pieces, so every piece yields at
    // least 1 and at most len(piece) tokens: pre <= n <= chars
    rows.foreach { r =>
      val (n, pre, chars) = (r.getInt(0), r.getInt(1), r.getInt(2))
      assert(n >= pre, s"a piece yields >= 1 token: n=$n pre=$pre")
      assert(n <= chars, s"tokens can't exceed characters: n=$n chars=$chars")
    }
    // round-trip: concatenating tokens reproduces the pre-tokenizable
    // text (single-spaced corpus text survives byte-for-byte modulo
    // characters the pre-tokenizer drops; assert token concat equals
    // piece concat)
    val pieces = docs.select(col("doc_id"),
      concat_ws("", TextFunctions.bpeTokens(col("text"))).as("pjoined"))
    val mismatch = enc.select(col("doc_id"), concat_ws("", col("toks")).as("joined"))
      .join(pieces, "doc_id")
      .filter(col("joined") =!= col("pjoined")).count()
    assert(mismatch == 0L)

    // more merges -> never more tokens (prefix merge lists)
    val merges50 = merges.take(50)
    val t50 = docs.select(sum(size(Bpe.bpeEncode(docs, col("text"), merges50))))
      .collect().head.getLong(0)
    val t200 = docs.select(sum(size(Bpe.bpeEncode(docs, col("text"), merges))))
      .collect().head.getLong(0)
    assert(t200 <= t50, s"monotonicity: $t200 > $t50")

    // expression parity vs the driver-side reference implementation
    val ranks = Bpe.ranksOf(merges)
    val m = java.util.regex.Pattern.compile(TextFunctions.BpePattern)
    enc.select(col("text"), col("toks")).collect().foreach { r =>
      val ref = {
        val b = Seq.newBuilder[String]
        val mm = m.matcher(r.getString(0))
        while (mm.find()) b ++= Bpe.encodeWord(mm.group(), ranks)
        b.result()
      }
      assert(r.getSeq[String](1) == ref)
    }
    docs.unpersist()
  }
}
