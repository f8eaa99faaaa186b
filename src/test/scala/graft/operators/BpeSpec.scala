package graft.operators

import graft.SparkSpec

/** BPE train/apply contract: the engine's space-encoded string-replace
  * merge application is checked against an independent LIST-based
  * sequential BPE implementation (the textbook formulation), on the
  * corpus and on adversarial overlap cases.
  */
class BpeSpec extends SparkSpec {

  private def q(name: String) = Bpe.defs.find(_.name == name).get.fn

  private def words(dir: String): Map[String, Long] =
    spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("lower(trim(text)) AS t").collect()
      .flatMap(_.getString(0).split("[ \t\n\f\r]+")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap

  /** Textbook left-to-right non-overlapping merge on a symbol list. */
  private def mergeOnce(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Sequential BPE learning over a weighted vocab; returns the merge
    * table and the final per-word tokenizations.
    */
  private def replayLearn(vocab0: Map[String, Long], k: Int)
      : (Seq[(Long, String, String, String, Long)], Map[String, Vector[String]]) = {
    var vocab: Map[String, (Vector[String], Long)] =
      vocab0.map { case (w, c) => w -> (w.map(_.toString).toVector, c) }
    val steps = Seq.newBuilder[(Long, String, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= k && !exhausted) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.values.foreach { case (syms, cnt) =>
        syms.lazyZip(syms.drop(1)).foreach { (x, y) =>
          counts((x, y)) = counts.getOrElse((x, y), 0L) + cnt
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val ((a, b), n) = counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
        steps += ((step.toLong, a, b, a + b, n))
        vocab = vocab.map { case (w, (syms, cnt)) => w -> (mergeOnce(syms, a, b), cnt) }
        step += 1
      }
    }
    (steps.result(), vocab.map { case (w, (syms, _)) => w -> syms })
  }

  test("q109 merges equal a sequential list-based BPE replay") {
    val (exp, _) = replayLearn(words(sf0001), Bpe.Merges)
    val got = q("q109_bpe_train")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(got == exp,
      s"engine merges $got differ from the textbook replay $exp")
    assert(got.map(_._4).distinct.size == Bpe.Merges, "merges must be distinct")
  }

  test("the space-encoded replace equals list-based merging on overlap cases") {
    // 'aaaa' under (a,a): leftmost non-overlap -> [aa, aa]; 'aaa' -> [aa, a];
    // 'abab' under (a,b) -> [ab, ab]; chained: 'aaaa' then (aa,aa) -> [aaaa]
    import spark.implicits._
    val dir = {
      val d = java.io.File.createTempFile("graft-bpe", "")
      d.delete(); d.mkdirs(); d.getAbsolutePath
    }
    // craft a corpus where the top merges are forced: 'aa' then 'aaaa'
    val doc = (Seq.fill(30)("aaaa") ++ Seq.fill(3)("abab") ++ Seq("zq")).mkString(" ")
    Seq((0L, doc, "en", "t"))
      .toDF("doc_id", "text", "lang", "source")
      .selectExpr("doc_id", "text", "lang", "source", "length(text) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val (exp, expTok) = replayLearn(words(dir), Bpe.Merges)
    val got = q("q109_bpe_train")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(got == exp, s"adversarial corpus: $got vs $exp")
    // the first two merges must be the overlap-sensitive chain
    assert(got(0)._2 == "a" && got(0)._3 == "a", s"expected (a,a) first: $got")
    assert(got(1)._2 == "aa" && got(1)._3 == "aa", s"expected (aa,aa) second: $got")
    // apply agrees with the list-based tokenization: 'aaaa' is ONE token
    val applied = q("q110_bpe_apply")(spark, dir).collect()
    assert(applied.length == 1)
    val row = applied(0)
    val wsTok = doc.split(" ").length.toLong
    assert(row.getLong(1) == wsTok)
    val expBpe = doc.split(" ").map(w => expTok(w).length.toLong).sum
    assert(row.getLong(2) == expBpe,
      s"bpe token count ${row.getLong(2)} vs list-based $expBpe")
  }

  test("a vocab with no remaining pairs stops merging early, no crash") {
    // corpus of one two-char word: round 1 merges (a,b); round 2 finds
    // zero adjacent pairs — the loop must truncate the merge table, not
    // throw, and apply must still tokenize ('ab' -> ONE token)
    import spark.implicits._
    val dir = {
      val d = java.io.File.createTempFile("graft-bpe-exh", "")
      d.delete(); d.mkdirs(); d.getAbsolutePath
    }
    Seq((0L, "ab ab ab", "en", "t"))
      .toDF("doc_id", "text", "lang", "source")
      .selectExpr("doc_id", "text", "lang", "source", "length(text) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = q("q109_bpe_train")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    val (exp, expTok) = replayLearn(words(dir), Bpe.Merges)
    assert(got == exp, s"truncated chain: $got vs $exp")
    assert(got == Seq((1L, "a", "b", "ab", 3L)))
    val applied = q("q110_bpe_apply")(spark, dir).collect()
    assert(applied.length == 1 && applied(0).getLong(2) == 3L,
      "three 'ab' words tokenize to three single tokens")
    assert(expTok("ab") == Vector("ab"))
  }

  test("a 50-merge chain equals the textbook replay (production-depth golden)") {
    // the cross-engine oracle pins 5 merges (one unrolled CTE per step
    // does not scale to production depths); this golden pins a 50-deep
    // dependent chain against the independent list-based implementation
    // — any drift at ANY step changes every later pick
    val (exp, _) = replayLearn(words(sf0001), 50)
    val got = Bpe.learnSteps(spark, sf0001, 50)
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(exp.size >= 40, s"sf0.001 must sustain a deep chain, got ${exp.size}")
    assert(got == exp)
    assert(got.map(_._4).distinct.size == got.size, "merged symbols distinct")
  }

  test("trainDeep equals the distributed loop at depth 50 and the replay at 500") {
    // the in-memory incremental trainer must be BIT-IDENTICAL to the
    // distributed per-merge loop (same pair statistic, same leftmost
    // application, same total order) — any drift at one step changes
    // every later pick, so depth-50 equality pins the whole algorithm
    val dist = Bpe.learnSteps(spark, sf0001, 50)
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    val fast50 = Bpe.trainDeep(spark, sf0001, 50)
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(fast50 == dist,
      "in-memory trainer must equal the distributed loop step-for-step")
    // production depth: 500 merges against the (quadratic, independent)
    // textbook replay — exhaustion-safe on a small vocab
    val (exp, _) = replayLearn(words(sf0001), 500)
    val fast500 = Bpe.trainDeep(spark, sf0001, 500)
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(fast500 == exp)
    assert(fast500.size > 50, "sf0.001 must sustain a deep chain")
    // a cap at least as large as the vocab is a no-op (exact BPE)
    assert(Bpe.trainDeep(spark, sf0001, 50, Some(1000000))
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq == dist)
  }

  test("the trainer's tie-break is Spark's binary string order, not compareTo") {
    // U+E000 (UTF-8 EE 80 80) sorts BEFORE U+10000 (F0 90 80 80) in
    // byte order — but AFTER it under Java compareTo (surrogates are
    // low code units). The comparator must side with Spark.
    val bmp = ""
    val astral = new String(Character.toChars(0x10000))
    assert(Bpe.utf8Lt(bmp, astral) && !Bpe.utf8Lt(astral, bmp))
    assert(bmp.compareTo(astral) > 0,
      "fixture must actually distinguish the two orders")
  }

  test("q110 equals the list-based apply per doc, with exact fertility") {
    val (_, tok) = replayLearn(words(sf0001), Bpe.Merges)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("doc_id", "lower(trim(text)) AS t").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val got = q("q110_bpe_apply")(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.nonEmpty)
    var anyCompressed = false
    got.foreach { case (id, (nws, nbpe, fert)) =>
      val ws = docs(id).split("[ \t\n\f\r]+").filter(_.nonEmpty)
      assert(ws.length.toLong == nws, s"doc $id ws tokens")
      val exp = ws.map(w => tok(w).length.toLong).sum
      assert(exp == nbpe, s"doc $id bpe tokens $nbpe vs replay $exp")
      assert(fert == nbpe * 1000000L / nws, s"doc $id fertility")
      if (nbpe < ws.map(_.length.toLong).sum) anyCompressed = true
    }
    assert(anyCompressed, "merges must compress at least one doc")
  }
}
