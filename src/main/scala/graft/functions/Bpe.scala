package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Real byte-pair-encoding over a LEARNED merge table — the upgrade
  * from the q78 pre-token COUNT proxy to actual subword tokenization
  * (the r6 what's-missing #4 item). Two halves, split the way real
  * tokenizer trainers split them:
  *
  *  - '''Learning''' (Sennrich, Haddow & Birch, "Neural Machine
  *    Translation of Rare Words with Subword Units", ACL 2016): BPE
  *    merges are a pure function of the corpus WORD-FREQUENCY table —
  *    word counts are the sufficient statistic, which is exactly why
  *    HuggingFace tokenizers trains from a word-count dict. So the
  *    corpus-sized work is ONE distributed pre-tokenize + count
  *    (shuffles 8-byte-hashable word keys, never documents), and the
  *    iterative merge loop runs driver-side over the
  *    vocabulary-bounded count table. At 100 TB the corpus pass is the
  *    same word-count aggregation as q31/q97; the driver loop is
  *    O(numMerges · vocab · avgWordLen) and independent of corpus
  *    size.
  *
  *  - '''Encoding''': the learned merge ranks ship as a broadcast
  *    variable consumed by the codegen'd
  *    [[graft.functions.expressions.BpeEncodeBroadcast]] expression —
  *    row-local, shuffle-free, with a per-task word→tokens memo (word
  *    frequency follows Zipf, so the memo hit rate is high).
  *
  * Scheme: GPT-2-style pre-tokenization ([[TextFunctions.BpePattern]] —
  * pieces carry their leading space), then char-level merges WITHIN
  * each piece (GPT-2 merges bytes within pieces; chars stand in for
  * bytes here — no end-of-word marker, exactly GPT-2's convention).
  * Deterministic: ties in pair frequency break toward the
  * lexicographically smallest pair, vocabulary truncation breaks
  * toward (count desc, word asc).
  */
object Bpe {

  /** One distributed corpus pass: pre-tokenize, count piece
    * frequencies, keep the `maxVocab` most frequent (count desc, word
    * asc — deterministic), collect to the driver. The collect is
    * vocabulary-bounded, never corpus-bounded.
    */
  def wordCounts(df: DataFrame, textCol: String,
                 maxVocab: Int = 1 << 16): Seq[(String, Long)] =
    df.select(explode(TextFunctions.bpeTokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w")).limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  /** Classic BPE merge learning over a word-frequency table. Returns
    * the ranked merge list (rank = list position). The loop is the
    * textbook O(numMerges · vocab · avgLen) recount — fine for the
    * numMerges ≤ ~1k this library's budgeting/fingerprinting uses
    * (a production 50k-merge train would keep an inverted pair→words
    * index like subword-nmt; the sufficient-statistic architecture is
    * unchanged).
    */
  def learnMerges(counts: Seq[(String, Long)],
                  numMerges: Int): Seq[(String, String)] = {
    if (counts.isEmpty || numMerges <= 0) return Seq.empty
    // each word as a mutable symbol sequence
    var words: Array[(Array[String], Long)] =
      counts.map { case (w, n) => (w.map(_.toString).toArray, n) }.toArray
    val merges = Seq.newBuilder[(String, String)]
    var m = 0
    var done = false
    while (m < numMerges && !done) {
      val pairCounts = new java.util.HashMap[(String, String), Long]()
      for ((syms, n) <- words if syms.length >= 2) {
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.merge(p, n, _ + _)
          i += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        var best: (String, String) = null
        var bestN = -1L
        val it = pairCounts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val p = e.getKey
          val n = e.getValue
          if (n > bestN || (n == bestN &&
            (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
            best = p; bestN = n
          }
        }
        if (bestN < 2) done = true // a pair seen once can't compress
        else {
          merges += best
          val joined = best._1 + best._2
          words = words.map { case (syms, n) =>
            if (syms.length < 2) (syms, n)
            else {
              val out = Array.newBuilder[String]
              var i = 0
              while (i < syms.length) {
                if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
                  out += joined; i += 2
                } else { out += syms(i); i += 1 }
              }
              (out.result(), n)
            }
          }
          m += 1
        }
      }
    }
    merges.result()
  }

  /** Learn a merge table from a corpus: the distributed count pass +
    * the driver loop. */
  def learnFromCorpus(df: DataFrame, textCol: String, numMerges: Int,
                      maxVocab: Int = 1 << 16): Seq[(String, String)] =
    learnMerges(wordCounts(df, textCol, maxVocab), numMerges)

  /** Merge ranks in the lookup shape the encode expression consumes
    * (key = left + NUL + right — text pieces never contain NUL, so
    * the key is unambiguous). */
  def ranksOf(merges: Seq[(String, String)]): java.util.HashMap[String, Integer] = {
    val h = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) => h.put(a + "\u0000" + b, i) }
    h
  }

  /** Encode one pre-token piece: repeatedly apply the lowest-ranked
    * applicable merge (all its occurrences, left to right) — the
    * standard greedy BPE apply loop. */
  def encodeWord(word: String, ranks: java.util.HashMap[String, Integer]): Array[String] = {
    var syms: Array[String] = word.map(_.toString).toArray
    var continue = syms.length >= 2
    while (continue) {
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.get(syms(i) + "\u0000" + syms(i + 1))
        if (r != null && r < bestRank) bestRank = r
        i += 1
      }
      if (bestRank == Int.MaxValue) continue = false
      else {
        val out = Array.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 &&
            { val r = ranks.get(syms(j) + "\u0000" + syms(j + 1)); r != null && r == bestRank }) {
            out += syms(j) + syms(j + 1); j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.result()
        continue = syms.length >= 2
      }
    }
    syms
  }

  /** `bpe_encode` as a Column: row-local tokenization against a learned
    * merge table (broadcast to executors; the plan carries the handle).
    * Token COUNT is `size(bpeEncode(...))`.
    */
  def bpeEncode(df: DataFrame, text: Column,
                merges: Seq[(String, String)]): Column = {
    val bc = df.sparkSession.sparkContext.broadcast(ranksOf(merges))
    org.apache.spark.sql.GraftColumnBridge.column(
      expressions.BpeEncodeBroadcast(bc,
        org.apache.spark.sql.GraftColumnBridge.expression(text)))
  }
}
