package graft

import org.apache.spark.sql.functions._
import graft.functions.TextClassifier

/** Multinomial NB classifier ([[graft.functions.TextClassifier]]) —
  * hand-computed likelihoods, separable-corpus accuracy, guards. The
  * full-corpus DuckDB replay is q150's oracle.
  */
class TextClassifierSpec extends SparkSpec {
  import spark.implicits._

  // spam: "buy now", "buy buy now"; ham: "hello friend"
  private def tiny = Seq(
    ("spam", "buy now"), ("spam", "buy buy now"), ("ham", "hello friend"))
    .toDF("lbl", "text")

  test("hand-computed model: counts, priors, add-one likelihoods") {
    val m = TextClassifier.trainNaiveBayes(tiny, col("lbl"),
      split(col("text"), " "), maxVocab = 10)
    assert(m.classes.toSeq == Seq("ham", "spam")) // sorted label order
    assert(m.docsPerClass.toSeq == Seq(1L, 2L) && m.nDocs == 3L)
    assert(m.tokTotals.toSeq == Seq(2L, 5L))
    assert(m.vSize == 4L) // buy, now, hello, friend — no UNK (cap unbound)
    assert(m.counts.get("buy").toSeq == Seq(0L, 3L))
    assert(m.counts.get("hello").toSeq == Seq(1L, 0L))
    val scores = tiny.select(TextClassifier.nbLogScores(tiny, m,
      split(col("text"), " ")).as("s")).collect().map(_.getSeq[Double](0))
    // doc 1 "buy now": ham = ln(1/3) + ln(1/6) + ln(1/6);
    //                  spam = ln(2/3) + ln(4/9) + ln(3/9)
    val ham1 = math.log(1.0 / 3) + math.log(1.0 / 6) + math.log(1.0 / 6)
    val spam1 = math.log(2.0 / 3) + math.log(4.0 / 9) + math.log(3.0 / 9)
    assert(math.abs(scores(0)(0) - ham1) < 1e-12)
    assert(math.abs(scores(0)(1) - spam1) < 1e-12)
    // predictions recover the training labels on this separable toy
    val preds = tiny.select(col("lbl"), TextClassifier.nbPredict(tiny, m,
      split(col("text"), " ")).as("p")).collect()
    assert(preds.forall(r => r.getString(0) == r.getString(1)))
  }

  test("unseen tokens fall to UNK (or flat smoothing); empty docs score NULL") {
    val m = TextClassifier.trainNaiveBayes(tiny, col("lbl"),
      split(col("text"), " "), maxVocab = 3) // hello folds (count-1 tie → token asc keeps friend)
    assert(m.counts.containsKey(graft.functions.expressions
      .BigramPerplexityBroadcast.Unk))
    assert(m.vSize == 4L) // 3 kept + UNK
    val oov = Seq("zz qq").toDF("text")
    val s = oov.select(TextClassifier.nbLogScores(oov, m,
      split(col("text"), " ")).as("s")).head().getSeq[Double](0)
    assert(s.forall(x => x < 0 && !x.isInfinite))
    val empty = Seq(Seq.empty[String]).toDF("ts")
    assert(empty.select(TextClassifier.nbLogScores(empty, m, col("ts")).as("s"))
      .head().isNullAt(0))
  }

  test("separable corpus: training accuracy 1.0; training is deterministic") {
    val rnd = new scala.util.Random(11)
    val spamWords = Seq("buy", "cheap", "offer", "click", "win")
    val hamWords = Seq("meeting", "report", "family", "dinner", "project")
    val docs = (1 to 200).map { i =>
      val w = if (i % 2 == 0) spamWords else hamWords
      (if (i % 2 == 0) "spam" else "ham",
        (1 to 12).map(_ => w(rnd.nextInt(w.size))).mkString(" "))
    }.toDF("lbl", "text")
    val m = TextClassifier.trainNaiveBayes(docs, col("lbl"),
      split(col("text"), " "))
    val acc = docs.select(col("lbl"), TextClassifier.nbPredict(docs, m,
        split(col("text"), " ")).as("p"))
      .agg(avg(when(col("lbl") === col("p"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    assert(acc == 1.0, s"accuracy $acc")
    val m2 = TextClassifier.trainNaiveBayes(docs, col("lbl"),
      split(col("text"), " "))
    assert(m.counts.keySet() == m2.counts.keySet())
    m.counts.forEach((k, v) => assert(v.toSeq == m2.counts.get(k).toSeq, k))
    assert(m.tokTotals.toSeq == m2.tokTotals.toSeq)
  }

  test("guards: NULL labels and unbounded class counts fail loudly") {
    val nulls = Seq((Option.empty[String], "x"), (Some("a"), "y"))
      .toDF("lbl", "text")
    val e = intercept[IllegalArgumentException](TextClassifier.trainNaiveBayes(
      nulls, col("lbl"), split(col("text"), " ")))
    assert(e.getMessage.contains("NULL labels"))
    val ids = (1 to 50).map(i => (s"c$i", "w")).toDF("lbl", "text")
    val e2 = intercept[IllegalArgumentException](TextClassifier.trainNaiveBayes(
      ids, col("lbl"), split(col("text"), " "), maxClasses = 10))
    assert(e2.getMessage.contains("maxClasses"))
  }

  test("r18: class order under non-ASCII labels matches Spark's binary string sort") {
    import org.apache.spark.sql.functions._
    // UTF-8 byte order puts 'Z' (0x5a) before 'é' (0xc3 0xa9) before
    // '日' (0xe6 ...) — same as Spark's UTF8String binary comparison;
    // a Java-String (UTF-16 char) comparator would agree here, but the
    // driver-side sort must stay byte-ordered by construction
    val df = spark.createDataFrame(Seq(
      ("日label", Seq("a", "b")), ("élabel", Seq("a")), ("Zlabel", Seq("b", "b"))
    )).toDF("lbl", "ts")
    val m = TextClassifier.trainNaiveBayes(df, col("lbl"), col("ts"))
    assert(m.classes.toSeq == Seq("Zlabel", "\u00e9label", "\u65e5label"))
    val nulls = spark.createDataFrame(Seq((Option.empty[String], Seq("a"))))
      .toDF("lbl", "ts")
    val e = intercept[IllegalArgumentException] {
      TextClassifier.trainNaiveBayes(nulls, col("lbl"), col("ts"))
    }
    assert(e.getMessage.contains("NULL labels"))
  }
}
