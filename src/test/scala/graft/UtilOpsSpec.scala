package graft

import graft.functions.{JsonOps, Scored, TopKAggregator}
import graft.operators.Skew
import org.apache.spark.sql.functions._

case class Li(l_returnflag: String, l_quantity: Double)

class UtilOpsSpec extends SparkSpec {
  import spark.implicits._

  test("Upsert.byKey replaces matched keys, keeps the rest, appends new keys") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val updates = Seq((2L, "B"), (9L, "NEW")).toDF("k", "v")
    val got = graft.operators.Upsert.byKey(base, updates, Seq("k"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "a"), (2L, "B"), (3L, "c"), (9L, "NEW")))
  }

  test("flattenJson expands sampled schema incl. nested structs") {
    val df = Seq(
      (1L, """{"a": 1, "b": {"c": "x"}}"""),
      (2L, """{"a": 2, "b": {"c": "y"}}""")).toDF("id", "js")
    val flat = JsonOps.flattenJson(df, "js")
    assert(flat.columns.toSeq == Seq("id", "a", "b"))
    val rows = flat.select(col("id"), col("a"), col("b.c")).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.toSeq == Seq((1L, 1L, "x"), (2L, 2L, "y")))
  }

  test("flattenJson is a no-op on all-null columns") {
    val df = Seq((1L, null.asInstanceOf[String])).toDF("id", "js")
    assert(JsonOps.flattenJson(df, "js").columns.toSeq == Seq("id", "js"))
  }

  test("TopKAggregator keeps k best with deterministic ties, merge-safe across partitions") {
    val topk = udaf(new TopKAggregator(2), org.apache.spark.sql.Encoders.product[Scored])
    val df = Seq(
      ("g1", 5.0, 10L), ("g1", 5.0, 3L), ("g1", 9.0, 7L), ("g1", 1.0, 99L),
      ("g2", 2.0, 1L)).toDF("g", "score", "id").repartition(4)
    val got = df.groupBy("g").agg(topk(col("score"), col("id")).as("ids"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got("g1") == Seq(7L, 3L)) // 9.0 first; 5.0 tie broken to lower id
    assert(got("g2") == Seq(1L))
  }

  test("typed Dataset API: case-class encoder + groupByKey aggregation") {
    import spark.implicits._
    val ds = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity")).as[Li]
    val typed = ds.groupByKey(_.l_returnflag)
      .mapGroups((flag, it) => (flag, it.map(_.l_quantity).sum))
      .collect().toMap
    val untyped = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag").agg(sum("l_quantity"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(typed.keySet == untyped.keySet)
    typed.foreach { case (k, v) => assert(math.abs(v - untyped(k)) < 1e-6) }
  }

  test("saltedJoin is row-identical to the plain equi-join") {
    val large = (1 to 1000).map(i => (i % 3, i)).toDF("k", "v")
    val small = Seq((0, "a"), (1, "b"), (2, "c"), (9, "zz")).toDF("k", "name")
    val plain = large.join(small, Seq("k")).select("k", "v", "name")
      .collect().map(_.toString).sorted
    val salted = Skew.saltedJoin(large, small, "k", salt = 8).select("k", "v", "name")
      .collect().map(_.toString).sorted
    assert(salted.toSeq == plain.toSeq)
    assert(salted.length == 1000)
  }

  test("stratified mix sampling: deterministic, rate-accurate, untouched strata kept whole") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val sampled = graft.functions.Mix.stratifiedSample(
      docs, col("lang"), col("doc_id"), Map("en" -> 12, "es" -> 8, "de" -> 4))
    val before = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // untouched strata identical; sampled strata near their rate
    assert(after("fr") == before("fr") && after("zh") == before("zh"))
    def rate(l: String) = after(l).toDouble / before(l)
    assert(math.abs(rate("en") - 12.0 / 16) < 0.15, s"en ${rate("en")}")
    assert(math.abs(rate("es") - 8.0 / 16) < 0.2, s"es ${rate("es")}")
    assert(math.abs(rate("de") - 4.0 / 16) < 0.2, s"de ${rate("de")}")
    // deterministic: the same ids every time
    val a = sampled.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = graft.functions.Mix.stratifiedSample(
      docs, col("lang"), col("doc_id"), Map("en" -> 12, "es" -> 8, "de" -> 4))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    // membership is monotone in the rate: 4/16 of a stratum ⊂ 8/16
    val deQuarter = graft.functions.Mix.stratifiedSample(
      docs.filter(col("lang") === "de"), col("lang"), col("doc_id"), Map("de" -> 4))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val deHalf = graft.functions.Mix.stratifiedSample(
      docs.filter(col("lang") === "de"), col("lang"), col("doc_id"), Map("de" -> 8))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(deQuarter.subsetOf(deHalf))
  }

  test("n-way split: total partition, rate-accurate, stable, grow-proof membership") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val w = Seq("train" -> 14, "val" -> 1, "test" -> 1)
    val split = graft.functions.Mix.split(docs, col("doc_id"), w)
    val n = docs.count()
    val byLabel = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // total partition: every row gets exactly one of the three labels
    assert(byLabel.values.sum == n && byLabel.keySet == Set("train", "val", "test"))
    assert(math.abs(byLabel("train").toDouble / n - 14.0 / 16) < 0.05)
    // membership is a pure function of the id: the corpus growing (here:
    // shrinking to a prefix) never reassigns an existing row
    val first = split.filter(col("doc_id") < 100)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val again = graft.functions.Mix.split(docs.filter(col("doc_id") < 100), col("doc_id"), w)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(first == again)
    // weights must sum to 16
    intercept[IllegalArgumentException] {
      graft.functions.Mix.split(docs, col("doc_id"), Seq("a" -> 8, "b" -> 4))
    }
  }

  test("token-budget mix: budgets never exceeded, untouched strata whole, deterministic") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val budgets = Map("en" -> 5000L, "de" -> 2000L)
    val kept = graft.functions.Mix.tokenBudget(
      docs, col("lang"), col("doc_id"), col("n_tokens"), budgets)
    val byLang = kept.groupBy("lang")
      .agg(sum(col("n_tokens")).as("tok"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // budgets are hard ceilings
    assert(byLang("en")._1 <= 5000L && byLang("de")._1 <= 2000L)
    // and are actually used (not trivially empty): at least 60% filled
    assert(byLang("en")._1 > 3000L && byLang("de")._1 > 1200L,
      s"en=${byLang("en")} de=${byLang("de")}")
    // unbudgeted strata pass through whole
    val frAll = docs.filter(col("lang") === "fr").count()
    assert(byLang("fr")._2 == frAll)
    // deterministic: identical kept set on a second run
    val a = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = graft.functions.Mix.tokenBudget(
        docs, col("lang"), col("doc_id"), col("n_tokens"), budgets)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("sequence packing: offsets are a gapless per-shard stream, pack ids consistent") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val packed = graft.functions.Mix.packSequences(
        docs, col("doc_id"), col("n_tokens"), seqLen = 128L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    assert(packed.length == docs.count())
    packed.groupBy(_._3).foreach { case (_, rows) =>
      // within a shard, sorted offsets tile the stream exactly: each doc
      // starts where the previous one ended
      val sorted = rows.sortBy(_._4)
      sorted.foldLeft(0L) { case (expectedOffset, (_, n, _, off, pid)) =>
        assert(off == expectedOffset, s"gap at offset $off")
        assert(pid == off / 128L)
        expectedOffset + n
      }
    }
    // deterministic across runs
    val again = graft.functions.Mix.packSequences(
        docs, col("doc_id"), col("n_tokens"), seqLen = 128L)
      .collect().map(r => (r.getLong(0), r.getLong(4))).toMap
    assert(packed.forall { case (id, _, _, _, pid) => again(id) == pid })
  }

  test("token-budget fan-out is value-invariant: fanout 256 == fanout 16 == 4096") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val budgets = Map("en" -> 5000L, "de" -> 2000L)
    def run(fanout: Int) = graft.functions.Mix.tokenBudget(
        docs, col("lang"), col("doc_id"), col("n_tokens"), budgets, fanout)
      .select("doc_id", "cum_tokens")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val f16 = run(16)
    assert(f16 == run(256) && f16 == run(4096))
  }

  test("sequence packing at 256 shards: 2-hex-digit shard, still a gapless stream") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val packed = graft.functions.Mix.packSequences(
        docs, col("doc_id"), col("n_tokens"), seqLen = 128L, shards = 256)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(packed.length == docs.count())
    packed.foreach { case (id, _, shard, _) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val expect = Integer.parseInt(hex.take(2), 16)
      assert(shard == expect, s"doc $id shard $shard != md5-prefix $expect")
    }
    packed.groupBy(_._3).foreach { case (_, rows) =>
      rows.sortBy(_._4).foldLeft(0L) { case (expected, (_, n, _, off)) =>
        assert(off == expected, s"gap at offset $off"); expected + n
      }
    }
  }

  test("temperature resample flattens shares toward uniform, conserves total, deterministic") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("lang"))
    val before = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = graft.functions.Mix.temperatureResample(docs, col("lang"), col("doc_id"))
    val after = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = before.values.sum.toDouble
    // total conserved up to sixteenth-quantization
    assert(math.abs(after.values.sum - n) / n < 0.1, s"total ${after.values.sum} vs $n")
    // the dominant stratum shrinks, the smallest grows
    val top = before.maxBy(_._2)._1
    val bottom = before.minBy(_._2)._1
    assert(after(top) < before(top), s"$top ${before(top)} -> ${after(top)}")
    assert(after(bottom) > before(bottom), s"$bottom ${before(bottom)} -> ${after(bottom)}")
    // flattening: share distance to uniform strictly decreases
    def dist(m: Map[String, Long]) = {
      val tot = m.values.sum.toDouble
      m.values.map(v => math.abs(v / tot - 1.0 / m.size)).sum
    }
    assert(dist(after) < dist(before))
    // deterministic: identical (doc, copy) multiset on a second run
    val a = out.select("doc_id", "copy").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = graft.functions.Mix.temperatureResample(docs, col("lang"), col("doc_id"))
      .select("doc_id", "copy").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
    // alpha = 1 is the identity mix: factor 1 for every stratum, each
    // row exactly once with copy = 0
    val id = graft.functions.Mix.temperatureResample(docs, col("lang"), col("doc_id"), alpha = 1.0)
    assert(id.count() == docs.count())
    assert(id.filter(col("copy") =!= 0L).count() == 0)
  }

  test("quality-percentile filter keeps ceil(frac*n) best-scored rows per stratum") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("score"))
    val kept = graft.functions.Mix.topFractionByScore(
      docs, col("lang"), col("score"), col("doc_id"), keepFraction = 0.3)
    val keptByLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val allByLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    allByLang.foreach { case (l, n) =>
      assert(keptByLang(l) == math.ceil(n * 0.3).toLong, s"$l: ${keptByLang.get(l)} of $n")
    }
    // kept floor >= dropped ceiling per stratum (ties may straddle only at equal score)
    val dropped = docs.join(kept.select(col("doc_id").as("k")), col("doc_id") === col("k"), "left_anti")
    val minKept = kept.groupBy("lang").agg(min(col("score")).as("mn")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val maxDropped = dropped.groupBy("lang").agg(max(col("score")).as("mx")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    maxDropped.foreach { case (l, mx) => assert(minKept(l) >= mx, s"$l kept=${minKept(l)} dropped=$mx") }
    // keepFraction = 1 is the identity
    assert(graft.functions.Mix.topFractionByScore(
      docs, col("lang"), col("score"), col("doc_id"), 1.0).count() == docs.count())
    // the broadcast-threshold scale path agrees with the exact cut up
    // to boundary ties (same score straddling the threshold)
    val approx = graft.functions.Mix.topFractionByScoreApprox(
      docs, col("lang"), col("score"), keepFraction = 0.3)
    val approxByLang = approx.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    allByLang.foreach { case (l, n) =>
      val exact = math.ceil(n * 0.3)
      assert(math.abs(approxByLang(l) - exact) <= math.max(2, n * 0.05),
        s"$l: approx ${approxByLang(l)} vs exact $exact of $n")
    }
    // the approx cut is score-downward-closed: its floor differs from
    // the exact cut's floor by at most one distinct score step
    val minApprox = approx.groupBy("lang").agg(min(col("score"))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    minKept.foreach { case (l, mk) =>
      assert(math.abs(minApprox(l) - mk) <= 3,
        s"$l approx floor ${minApprox(l)} vs exact floor $mk")
    }
  }

  test("stripHtml: scripts/styles/comments/tags go, entities unescape one level, spaces collapse") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val cases = Seq(
      ("<p>hello <b>world</b></p>", "hello world"),
      ("a<script>if (1 < 2) { x(); }</script>b", "a b"),
      ("x<style type=\"text/css\">p { color: red }</style>y", "x y"),
      ("keep <!-- drop this -->rest", "keep rest"),
      ("&lt;tag&gt; &amp;amp; &quot;q&quot; &#39;s&#39;", "<tag> &amp; \"q\" 's'"),
      ("   lots \n\t of\r\nspace   ", "lots of space"),
      ("", ""),
      ("no markup at all", "no markup at all"))
    val got = cases.map(_._1).toDF("t")
      .select(graft.functions.TextFunctions.stripHtml(col("t")).as("c"))
      .collect().map(_.getString(0))
    cases.map(_._2).zip(got).foreach { case (want, g) => assert(g == want, s"'$g' != '$want'") }
  }

  test("extractUrls + normalizeUrl: every cleaning step fires") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val cases = Seq(
      ("go to HTTPS://A.COM/P?utm_source=x&utm_id=2&q=1#top now",
        Seq("https://a.com/p?q=1")),
      ("(see http://b.org/path/).", Seq("http://b.org/path")),
      ("bare http://c.net/?utm_a=1 end", Seq("http://c.net")),
      ("two http://x.io/1 and https://y.io/2/", Seq("http://x.io/1", "https://y.io/2")),
      ("no urls at all", Seq()))
    val got = cases.map(_._1).toDF("t")
      .select(graft.functions.TextFunctions.extractUrls(col("t")).as("us"))
      .select(transform(col("us"),
        u => graft.functions.TextFunctions.normalizeUrl(u)).as("n"))
      .collect().map(_.getSeq[String](0).toSeq)
    cases.map(_._2).zip(got).foreach { case (want, g) => assert(g == want, s"$g != $want") }
  }

  test("extractHost + hostSuffixes + domain blocklist: subdomains block, TLDs never do") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val hosts = Seq("cdn.img.bad.com", "localhost", "good.org")
      .toDF("h")
      .select(graft.functions.TextFunctions.hostSuffixes(col("h")).as("s"))
      .collect().map(_.getSeq[String](0).toSeq)
    assert(hosts(0) == Seq("cdn.img.bad.com", "img.bad.com", "bad.com")) // no bare "com"
    assert(hosts(1) == Seq("localhost"))
    assert(hosts(2) == Seq("good.org"))
    val docs = Seq(
      (1L, "see https://cdn.bad.com/x ok"),     // subdomain of blocked bad.com
      (2L, "see https://bad.com/x ok"),          // exact hit
      (3L, "see https://notbad.com/x ok"),       // NOT a suffix match (label boundary)
      (4L, "see https://good.org/x and http://also.fine.net/y"),
      (5L, "no links here"))
      .toDF("doc_id", "text")
    val bl = Seq("bad.com").toDF("domain")
    val kept = graft.functions.TextFunctions
      .dropBlockedDomains(docs, "doc_id", "text", bl)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(3L, 4L, 5L))
  }

  test("corpus-frequency scores: rare tokens raise both rarity and cross-entropy") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Seq(
      (1L, "the the the the"),            // only common tokens
      (2L, "the the the zyzzyva"),        // one rare token
      (3L, "zyzzyva quetzal xylophone q") // mostly rare tokens
    ).toDF("doc_id", "text")
    val scored = graft.functions.TextFunctions
      .corpusFrequencyScores(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("rarity"), r.getAs[Double]("cross_entropy"))))
      .toMap
    assert(scored(1L)._1 == 4 && scored(2L)._1 == 4 && scored(3L)._1 == 4)
    // rarity and cross-entropy rank the docs identically: 3 > 2 > 1
    assert(scored(3L)._2 > scored(2L)._2 && scored(2L)._2 > scored(1L)._2)
    assert(scored(3L)._3 > scored(2L)._3 && scored(2L)._3 > scored(1L)._3)
    // integer rarity is exactly reproducible arithmetic: 'the' appears
    // 7 times in the corpus, 'zyzzyva' twice (docs 2 and 3)
    assert(scored(1L)._2 == 4 * (1000000L / 7))
    assert(scored(2L)._2 == 3 * (1000000L / 7) + 1000000L / 2)
  }

  test("new mix/score operators are total on empty inputs, and alpha tunes flattening") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val empty = Seq.empty[(Long, String, Long)].toDF("doc_id", "lang", "n_tokens")
    assert(graft.functions.Mix.temperatureResample(
      empty, col("lang"), col("doc_id")).count() == 0)
    assert(graft.functions.Mix.topFractionByScore(
      empty, col("lang"), col("n_tokens"), col("doc_id"), 0.5).count() == 0)
    assert(graft.functions.Mix.topFractionByScoreApprox(
      empty, col("lang"), col("n_tokens"), 0.5).count() == 0)
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.functions.TextFunctions.corpusFrequencyScores(
      emptyDocs, "doc_id", "text").count() == 0)
    // smaller alpha flattens harder (pow path, alpha != 0.5)
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("lang"))
    def distToUniform(alpha: Double): Double = {
      val m = graft.functions.Mix.temperatureResample(docs, col("lang"), col("doc_id"), alpha)
        .groupBy("lang").count().collect().map(r => r.getLong(1)).toSeq
      val tot = m.sum.toDouble
      m.map(v => math.abs(v / tot - 1.0 / m.size)).sum
    }
    assert(distToUniform(0.3) < distToUniform(0.8))
  }

  test("mix operators fail fast: bad shard counts and pre-existing output columns") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    intercept[IllegalArgumentException] {
      graft.functions.Mix.packSequences(docs, col("doc_id"), col("n_tokens"), 128L, shards = 10)
    }
    intercept[IllegalArgumentException] {
      graft.functions.Mix.tokenBudget(docs, col("lang"), col("doc_id"),
        col("n_tokens"), Map("en" -> 1L), fanout = 17)
    }
    intercept[IllegalArgumentException] {
      graft.functions.Mix.tokenBudget(docs.withColumn("cum_tokens", lit(0L)),
        col("lang"), col("doc_id"), col("n_tokens"), Map("en" -> 1L))
    }
    intercept[IllegalArgumentException] {
      graft.functions.Mix.packSequences(docs.withColumn("pack_id", lit(0L)),
        col("doc_id"), col("n_tokens"), 128L)
    }
  }

  test("binned range join == naive non-equi join, and plans an equality join not a BNLJ") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf)
    val iv = spark.range(0, 100).select(col("id").as("interval_id"),
      expr("timestamp_seconds(1704067200 + id * 7200)").as("w_start"),
      expr("timestamp_seconds(1704067200 + id * 7200 + 2700)").as("w_end"))
    val binned = graft.operators.RangeJoin.byTime(ev, "ts", iv, "w_start", "w_end", 3600L)
      .select(col("event_id"), col("interval_id"))
    val naive = ev.join(iv, col("ts") >= col("w_start") && col("ts") < col("w_end"))
      .select(col("event_id"), col("interval_id"))
    val b = binned.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val n = naive.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(b == n, s"missing=${(n -- b).size} extra=${(b -- n).size}")
    assert(b.nonEmpty)
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"binned range join fell back to a nested loop:\n$plan")
    // while the naive formulation IS the nested loop the operator avoids
    assert(naive.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
  }

  test("AQE splits a skewed sort-merge join partition at runtime (skew=true in plan)") {
    import org.apache.spark.sql.functions._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force sort-merge
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64k",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "16k")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one hot key holding 75% of the left side → its shuffle partition
      // dwarfs the median and AQE must split it
      val left = spark.range(200000)
        .select(when(col("id") < 150000, 1L).otherwise(col("id")).as("k"),
          col("id").as("v"))
      val right = spark.range(2000).select(col("id").as("k"), (col("id") * 2).as("w"))
      val j = left.join(right, "k")
      // collect() executes THIS queryExecution, so the adaptive plan we
      // inspect below is the final one (count() would plan separately)
      assert(j.collect().length == 150000) // only the hot key (1) matches the right side
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"AQE did not mark the join skewed:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("native dsir_buckets equals the declarative md5 uni+bigram construction") {
    import org.apache.spark.sql.functions._
    graft.functions.expressions.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, sf)
    val both = docs.select(
      call_function("dsir_buckets", col("text"), lit(8192)).as("native"),
      graft.functions.Mix.uniBigramBucketsReference(col("text"), 8192).as("ref"))
    assert(both.filter(col("native") =!= col("ref")).count() == 0)
    // edge shapes: empty text (one empty token), single token, runs of
    // spaces (empty tokens kept — split(' ') semantics)
    import spark.implicits._
    val edges = Seq("", "one", "a b", "a  b", " lead", "trail ").toDF("text")
      .select(
        call_function("dsir_buckets", col("text"), lit(64)).as("native"),
        graft.functions.Mix.uniBigramBucketsReference(col("text"), 64).as("ref"))
    assert(edges.filter(col("native") =!= col("ref")).count() == 0)
  }

  test("heavy hitters: exact vs naive top-k on a vocabulary larger than capacity") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // Zipf-ish synthetic corpus: 20 heavy tokens + 5000 singletons, far
    // more distinct tokens than the MG capacity
    val heavy = (0 until 20).flatMap(i => Seq.fill(200 - i)(s"h$i"))
    val noise = (0 until 5000).map(i => s"n$i")
    val words = scala.util.Random.shuffle(heavy ++ noise)
    val docs = words.grouped(50).map(_.mkString(" ")).toSeq.toDF("text")
      .repartition(8)
    val got = graft.functions.TextFunctions
      .topTokensExact(docs, "text", k = 10, capacity = 64)
    val naive = docs.select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("t")).limit(10)
    assert(got.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      naive.collect().map(r => (r.getString(0), r.getLong(1))).toSeq)
    // plan shape: bounded-candidate broadcast + TakeOrdered top-k, never
    // a full-vocabulary shuffle sort
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("native token_grams equals the declarative split / zip_with constructions") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    graft.functions.expressions.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, sf).select("text")
      .union(Seq("", "one", "a b", "a  b", " lead", "trail ").toDF("text"))
    val tok = split(col("text"), " ")
    val declBigrams = when(size(tok) >= 2,
      zip_with(slice(tok, lit(1), size(tok) - 1), slice(tok, lit(2), size(tok) - 1),
        (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))
    val both = docs.select(
      call_function("token_grams", col("text"), lit(1)).as("n1"),
      tok.as("d1"),
      call_function("token_grams", col("text"), lit(2)).as("n2"),
      declBigrams.as("d2"))
    assert(both.filter(col("n1") =!= col("d1") || col("n2") =!= col("d2"))
      .count() == 0)
  }

  test("Misra-Gries candidates keep every token above the n/capacity bar") {
    val n = 10000
    val rng = new scala.util.Random(7)
    // one dominant token (12%), a mid tier, and a long noise tail
    val stream = (0 until n).map { _ =>
      val r = rng.nextDouble()
      if (r < 0.12) "dom" else if (r < 0.3) s"mid${rng.nextInt(5)}"
      else s"noise${rng.nextInt(3000)}"
    }
    val c = 32
    val out = graft.functions.TextFunctions.misraGries(stream.iterator, c).toSet
    val exact = stream.groupBy(identity).view.mapValues(_.size)
    exact.filter(_._2 > n / c).keys.foreach { t =>
      assert(out.contains(t), s"$t (freq ${exact(t)}) must survive MG at capacity $c")
    }
    assert(out.size <= c)
  }

  test("merged MG sketch is bounded by capacity alone, independent of partition count") {
    import spark.implicits._
    // many more partitions than capacity would ever tolerate as a
    // multiplier: the r8 shape (candidates <= capacity x partitions)
    // would yield up to 64*24 candidates; the merged sketch must stay
    // <= capacity with every global heavy hitter inside (VERDICT r8 #2)
    val heavy = (0 until 10).flatMap(i => Seq.fill(500 - i)(s"h$i"))
    val noise = (0 until 8000).map(i => s"n$i")
    val words = new scala.util.Random(11).shuffle(heavy ++ noise)
    val c = 64
    val toks = words.toDF("t").repartition(24).as[String]
    val (sketch, n) = graft.functions.TextFunctions.mgCandidates(toks, c)
    assert(n == words.size.toLong)
    assert(sketch.size <= c, s"merged sketch has ${sketch.size} counters > capacity $c")
    val exact = words.groupBy(identity).view.mapValues(_.size)
    exact.filter(_._2 > words.size / c).keys.foreach { t =>
      assert(sketch.containsKey(t),
        s"$t (freq ${exact(t)}) must survive the merge tree at capacity $c")
    }
  }

  test("mgMerge preserves the additive-error heavy-hitter guarantee") {
    val rng = new scala.util.Random(13)
    val mk = () => (0 until 4000).map { _ =>
      val r = rng.nextDouble()
      if (r < 0.15) "dom" else if (r < 0.3) s"mid${rng.nextInt(4)}"
      else s"noise${rng.nextInt(2500)}"
    }
    val (s1, s2) = (mk(), mk())
    val c = 24
    def sk(xs: Seq[String]) = {
      val m = new java.util.HashMap[String, java.lang.Long](c * 2)
      xs.foreach(t => graft.functions.TextFunctions.mgAdd(m, t, c))
      m
    }
    val merged = graft.functions.TextFunctions.mgMerge(sk(s1), sk(s2), c)
    assert(merged.size <= c)
    val all = s1 ++ s2
    val exact = all.groupBy(identity).view.mapValues(_.size)
    exact.filter(_._2 > all.size / c).keys.foreach { t =>
      assert(merged.containsKey(t),
        s"$t (freq ${exact(t)}) must survive the sketch merge at capacity $c")
    }
  }

  test("DSIR: en-target importance weights rank English docs above the rest") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val scores = graft.functions.Mix.dsirScores(
      docs, docs.filter(col("lang") === "en"), "doc_id", "text")
    assert(scores.count() == docs.count()) // every source doc scored
    val byLang = scores.join(docs.select(col("doc_id").as("doc"), col("lang")), "doc")
      .groupBy("lang").agg(avg(col("logw")).as("m")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val others = byLang.filter(_._1 != "en").values
    assert(others.forall(_ < byLang("en")),
      s"mean logw must peak on the target language: $byLang")
    // weights are a pure function of the input — two runs agree exactly
    val again = graft.functions.Mix.dsirScores(
      docs, docs.filter(col("lang") === "en"), "doc_id", "text")
    assert(scores.exceptAll(again).isEmpty && again.exceptAll(scores).isEmpty)
  }

  test("DSIR totals count target-only buckets (external, non-subset targets)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val target = docs.filter(col("lang") === "en").select("doc_id", "text")
    // an external exemplar whose tokens never occur in the corpus: its
    // grams land (almost surely) in buckets no source doc touches. The
    // only correct effect is through T — every doc's logw must shift
    // strictly DOWN; with the old left-join totals the external grams
    // vanished and logw was unchanged (review r8 #5)
    val external = Seq((999999L,
      Seq.fill(60)("zzqx9v7k3m1 qqy8w2j4r6t").mkString(" "))).toDF("doc_id", "text")
    val base = graft.functions.Mix.dsirScores(docs, target, "doc_id", "text")
      .select(col("doc"), col("logw").as("lw0"))
    val aug = graft.functions.Mix.dsirScores(docs, target.union(external),
      "doc_id", "text").select(col("doc"), col("logw").as("lw1"))
    val joined = base.join(aug, "doc")
    assert(joined.filter(col("lw1") >= col("lw0")).count() == 0,
      "external target mass must lower every doc's logw through T")
  }

  test("DSIR Gumbel resample: deterministic, sized, and target-enriched") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val target = docs.filter(col("lang") === "en")
    val n = docs.count()
    val sel = graft.functions.Mix.dsirResample(
      docs, target, "doc_id", "text", keepFraction = 0.3, exact = true)
    assert(sel.count() == math.ceil(n * 0.3).toLong)
    // enrichment: the selected slice is more English than the corpus
    val enFrac = target.count().toDouble / n
    val selEn = sel.join(docs.select(col("doc_id").as("doc"), col("lang")), "doc")
      .filter(col("lang") === "en").count().toDouble / sel.count()
    assert(selEn > enFrac,
      f"selected en fraction $selEn%.3f must exceed corpus $enFrac%.3f")
    // Gumbel keys are md5-deterministic: same selection on a re-run
    val again = graft.functions.Mix.dsirResample(
      docs, target, "doc_id", "text", keepFraction = 0.3, exact = true)
    assert(sel.select("doc").exceptAll(again.select("doc")).isEmpty)
    // the percentile-threshold scale path approximates the exact cut
    val approx = graft.functions.Mix.dsirResample(
      docs, target, "doc_id", "text", keepFraction = 0.3)
    val k = math.ceil(n * 0.3)
    assert(math.abs(approx.count() - k) <= math.max(2, n * 0.05))
  }

  test("gopherRules: each rule fires on its adversarial document") {
    import org.apache.spark.sql.functions._
    // 68 words, mean len 3.5, stop types {the, and, of, that, to} — clean
    val good = "the quick brown fox jumps over the lazy dog and all of that was fine to see " * 4
    val cases = Seq(
      ("good", good),
      ("short", "the cat"),                                    // word count < 50
      ("longwords", Seq.fill(60)("Pneumonoultramicroscopics").mkString(" ")), // mean len > 10
      ("symbols", good + " " + Seq.fill(20)("#").mkString(" ")),      // hash ratio > 0.1
      ("bullets", Seq.fill(10)("- the item here now").mkString("\n")),  // all lines bulleted
      ("ellipsis", Seq.fill(10)("the line trails off...").mkString("\n")), // all lines ...
      ("numeric", Seq.fill(60)("12345").mkString(" ") + " the"),   // alpha fraction < 0.8
      ("nostop", "potato carrot turnip radish " * 15))           // no Gopher stopword
    val df = spark.createDataFrame(cases).toDF("name", "text")
      .select(col("name"),
        graft.functions.TextFunctions.gopherRules(col("text")).as("g"))
      .select(col("name"), col("g.*"))
    val byName = df.collect().map(r => r.getString(0) -> r).toMap
    val keepIdx = df.columns.indexOf("keep")
    assert(byName("good").getBoolean(keepIdx), "clean doc must keep")
    def failsOn(name: String, flag: String): Unit = {
      val r = byName(name)
      val idx = df.columns.indexOf(flag)
      assert(!r.getBoolean(idx), s"$name must fail $flag")
      assert(!r.getBoolean(keepIdx), s"$name must not keep")
    }
    failsOn("short", "r_word_count")
    failsOn("longwords", "r_mean_word_len")
    failsOn("symbols", "r_symbol_ratio")
    failsOn("bullets", "r_bullet")
    failsOn("ellipsis", "r_ellipsis")
    failsOn("numeric", "r_alpha")
    failsOn("nostop", "r_stopwords")
  }

  test("qualityBuckets: equal counts, deterministic, score-ordered") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), length(col("text")).as("score"))
    val b = graft.functions.Mix.qualityBuckets(
      docs, col("lang"), col("score"), col("doc_id"))
    // equal-count split per stratum (ntile: sizes differ by at most 1)
    val sizes = b.groupBy("lang", "bucket").count().collect()
      .groupBy(_.getString(0)).values
    sizes.foreach { g =>
      val ns = g.map(_.getLong(2))
      assert(ns.max - ns.min <= 1, ns.mkString(","))
    }
    // bucket 1 holds the lowest scores: per lang, max(score@1) <= min(score@3)
    val ext = b.groupBy("lang")
      .agg(max(when(col("bucket") === 1, col("score"))).as("hi1"),
           min(when(col("bucket") === 3, col("score"))).as("lo3"))
      .collect()
    ext.foreach(r => assert(r.getInt(1) <= r.getInt(2), r.toString))
    // deterministic: identical assignment on a re-run
    val a1 = b.select("doc_id", "bucket").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val a2 = graft.functions.Mix.qualityBuckets(
        docs, col("lang"), col("score"), col("doc_id"))
      .select("doc_id", "bucket").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(a1 == a2)
  }

  test("compressionRatio: repetitive text compresses below prose, junk near 1") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    graft.functions.expressions.GraftFunctions.register(spark)
    val prose = "the quick brown fox jumps over a lazy dog while seven curious " +
      "magpies inspect bright copper kettles beside the quiet harbour wall and " +
      "children trade stories about distant mountains rivers gardens and the " +
      "peculiar habits of travelling merchants who arrive each autumn evening"
    val junk = new scala.util.Random(99).alphanumeric.take(300).mkString
    val cases = Seq(
      (1L, prose),
      (2L, "spam " * 100), // boilerplate
      (3L, junk),          // high-entropy
      (4L, ""))
    val out = cases.toDF("id", "t")
      .select(col("id"), graft.functions.TextFunctions.compressionRatio(col("t")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(2L) < 0.1, s"boilerplate ratio ${out(2L)}")     // compresses hard
    assert(out(1L) > out(2L), "prose compresses less than spam")
    assert(out(3L) > out(1L), "high-entropy junk compresses worse than prose")
    assert(out(4L) == 1.0)                                    // empty → 1.0
    // clean stage: compression method drops both tails; flags audit
    val docs = Seq((1L, "a normal readable sentence with usual words in it here"),
      (2L, "spam " * 200)).toDF("doc_id", "text")
    val kept = graft.operators.CleanStage("c", "compression", "text",
      minRatio = 0.25, maxRatio = 1.2).apply(spark, docs)
    assert(kept.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(1L))
    val flagged = graft.operators.CleanStage("c", "compression", "text",
      flags = true).apply(spark, docs)
    assert(flagged.count() == 2 &&
      Seq("comp_ratio", "comp_keep").forall(flagged.columns.contains))
  }

  test("qualityBucketsApprox: windowless scale twin agrees with exact away from cuts") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), length(col("text")).as("score"))
    val exact = graft.functions.Mix.qualityBuckets(
      docs, col("lang"), col("score"), col("doc_id"))
    val approx = graft.functions.Mix.qualityBucketsApprox(
      docs, col("lang"), col("score"))
    // the point of the op: ZERO window/sort in the physical plan — one
    // scan, one percentile_approx aggregate, one broadcast join back
    val plan = approx.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "approx path must not window")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"),
      "cut-point table must broadcast")
    // ≈-equal bucket counts per stratum (GK rank error only)
    val nByLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    approx.groupBy("lang", "bucket").count().collect().foreach { r =>
      val n = nByLang(r.getString(0))
      assert(math.abs(r.getLong(2) - n / 3.0) <= math.max(2, n * 0.05),
        s"${r.getString(0)} bucket ${r.getInt(1)}: ${r.getLong(2)} of $n")
    }
    // row-level agreement with the exact ntile away from the cut
    // points: disagreements are rare, only ever one bucket apart, and
    // sit exactly at a boundary score (a score value that the exact
    // form splits across two buckets, or the sketch's rank-error zone)
    val joined = exact.select(col("doc_id"), col("lang"),
        col("score"), col("bucket").as("be"))
      .join(approx.select(col("doc_id").as("d2"), col("bucket").as("ba")),
        col("doc_id") === col("d2"))
    val n = joined.count()
    val dis = joined.filter(col("be") =!= col("ba"))
    assert(dis.count() <= math.max(2, n * 0.05), s"${dis.count()} of $n disagree")
    assert(dis.filter(abs(col("be") - col("ba")) > 1).count() == 0,
      "disagreements must be adjacent-bucket only")
    // within each (lang, score) the approx bucket is CONSTANT (a pure
    // function of the broadcast cuts), and across scores monotone
    val viol = approx.groupBy("lang", "score")
      .agg(countDistinct(col("bucket")).as("k")).filter(col("k") > 1)
    assert(viol.count() == 0, "same (stratum, score) must map to one bucket")
    // n = 2 and a skew-free single-stratum frame also bucket sanely
    val two = graft.functions.Mix.qualityBucketsApprox(
      docs, lit(1), col("score"), n = 2)
    assert(two.select("bucket").distinct().collect().map(_.getInt(0)).toSet == Set(1, 2))
  }

  test("scriptProfile: counts per script, dominant label across all branches") {
    import org.apache.spark.sql.functions._
    val cases = Seq(
      (1L, "hello world plain latin text"),
      (2L, "Привет мир Привет мир hi"),     // cyrillic dominates
      (3L, "你好世界你好世界你好 ok"),          // han dominates
      (4L, "مرحبا بالعالم مرحبا بالعالم ok"), // arabic dominates
      (5L, "안녕하세요 세계 안녕하세요 ok"),     // hangul dominates
      (6L, "12345 !!!"))                     // none
    val out = spark.createDataFrame(cases).toDF("id", "t")
      .select(col("id"), graft.functions.TextFunctions.scriptProfile(col("t")).as("p"))
      .select(col("id"), col("p.script")).orderBy(col("id"))
      .collect().map(_.getString(1)).toSeq
    assert(out == Seq("latin", "cyrillic", "han", "arabic", "hangul", "none"))
  }

  test("c4Clean: punctuation+length line filter, page flags, rebuild") {
    import org.apache.spark.sql.functions._
    val page = Seq(
      "the first good sentence sits here.",
      "short one.",                        // < 5 words → dropped
      "no terminal punctuation on this line",
      "a second surviving sentence lives right here!",
      "and a third keeps the page over the floor?").mkString("\n")
    val df = spark.createDataFrame(Seq((1L, page),
        (2L, "lorem ipsum dolor.\n" + page),
        (3L, "var x = { a: 1 };\n" + page)))
      .toDF("id", "t")
      .select(col("id"), graft.functions.TextFunctions.c4Clean(col("t")).as("c"))
      .select(col("id"), col("c.*")).orderBy(col("id"))
    val rows = df.collect()
    val clean = rows(0).getString(1)
    assert(clean.split("\n").length == 3 && !clean.contains("short one"))
    assert(rows(0).getBoolean(6), "clean page keeps")          // keep
    assert(rows(1).getBoolean(3) && !rows(1).getBoolean(6))    // lorem flag kills
    assert(rows(2).getBoolean(4) && !rows(2).getBoolean(6))    // brace flag kills
  }
}
