package graft.operators

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import graft.SparkSpec

/** Retrieval family — q88 BM25 top-k, q89 SemDeDup, q90 hybrid RRF.
  *
  * q88 is replayed driver-side from first principles (the LmTfidfSpec
  * method): the distributed inverted-index build + integer micro-unit
  * scorer must match a sequential single-threaded BM25 on every
  * (query, doc, score) triple, including each rounded micro value.
  * q89 is checked against its own declarative contract (removed iff a
  * smaller-id same-cell partner sits at cosine >= tau; dup_of is the
  * MINIMUM such partner). q90's fusion is recomputed from the emitted
  * leg ranks, and its lexical leg is cross-checked against q88's
  * scorer. A plan test pins the probe shape: the query-term set must
  * reach the postings via a broadcast join, never a shuffle.
  */
class RetrievalSpec extends SparkSpec {

  private val wordRe = "[a-z0-9]+".r
  private val queryTerms: Seq[(Long, String)] = Seq(
    1L -> "hash", 1L -> "join",
    2L -> "window", 2L -> "agg", 2L -> "stream",
    3L -> "vector", 3L -> "scan", 3L -> "filter")

  private def microRound(x: Double): Long =
    new JBigDecimal(x).setScale(0, RoundingMode.HALF_UP).longValueExact()

  private def docToks(): Map[Long, Vector[String]] =
    graft.core.Tables(spark, sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        wordRe.findAllIn(r.getString(1).toLowerCase).toVector)
      .toMap

  /** Sequential BM25: (q_id, doc_id) -> (n_hit, bm25_micro). */
  private def bm25Replay(qts: Seq[(Long, String)] = queryTerms)
      : Map[(Long, Long), (Long, Long)] = {
    val toks = docToks()
    val n = toks.size
    val dl: Map[Long, Int] = toks.view.mapValues(_.size).toMap
    val avgdl = dl.values.map(_.toLong).sum.toDouble / n.toDouble
    val tf: Map[(Long, String), Int] =
      toks.toSeq.flatMap { case (id, ws) => ws.map(w => (id, w)) }
        .groupBy(identity).view.mapValues(_.size).toMap
    val df: Map[String, Int] =
      tf.keys.toSeq.groupBy(_._2).view.mapValues(_.size).toMap
    qts.flatMap { case (q, term) =>
      tf.keys.collect { case (id, w) if w == term =>
        val t = tf((id, term)).toDouble
        val idf = math.log(1.0 + ((n - df(term)).toDouble + 0.5) /
          (df(term).toDouble + 0.5))
        val sat = (t * 2.2) /
          (t + 1.2 * (0.25 + 0.75 * dl(id).toDouble / avgdl))
        ((q, id), microRound(idf * sat * 1e6))
      }
    }.groupBy(_._1).map { case (k, vs) =>
      k -> (vs.size.toLong, vs.map(_._2).sum)
    }
  }

  test("q88 matches a sequential BM25 replay on every scored pair") {
    val exp = bm25Replay()
    val topPerQ: Map[Long, Seq[(Long, Long, Long)]] =
      exp.toSeq.map { case ((q, d), (h, sc)) => (q, d, h, sc) }
        .groupBy(_._1).view.mapValues { rows =>
          rows.map { case (_, d, h, sc) => (d, h, sc) }
            .sortBy { case (d, _, sc) => (-sc, d) }.take(5)
        }.toMap
    val got = graft.SparkEntry.queries("q88_bm25_topk")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.nonEmpty)
    got.foreach { case (q, rank, doc, hit, micro) =>
      val (d, h, sc) = topPerQ(q)(rank - 1)
      assert(doc == d && hit == h && micro == sc,
        s"q$q rank $rank: got ($doc,$hit,$micro) want ($d,$h,$sc)")
    }
    assert(got.length == topPerQ.values.map(_.size.min(5)).sum)
  }

  test("q88 probes the postings with a BROADCAST join on the query terms") {
    val plan = graft.SparkEntry.queries("q88_bm25_topk")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"),
      s"query-term probe must broadcast, plan was:\n$plan")
  }

  test("q89 removal decisions satisfy the SemDeDup contract exactly") {
    import org.apache.spark.sql.functions._
    val rows = graft.SparkEntry.queries("q89_semantic_dedup")(spark, sf0001)
      .collect()
    // independent recompute of cells + within-cell cosines, driver-side
    val emb = graft.core.Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toVector).toMap
    def dot(a: Vector[Double], b: Vector[Double]): Double =
      a.lazyZip(b).map(_ * _).foldLeft(0.0)(_ + _)
    def nrm(a: Vector[Double]): Double = math.sqrt(dot(a, a))
    val cents = emb.filter { case (id, _) => id >= 100 && id < 116 }
    val cell: Map[Long, Long] = emb.map { case (id, v) =>
      id -> cents.toSeq.map { case (c, cv) =>
        (dot(v, cv) / (nrm(v) * nrm(cv)), c)
      }.maxBy { case (s, c) => (s, -c) }._2
    }
    val removedExp: Map[Long, Long] = emb.keys.toSeq.flatMap { id =>
      val partners = emb.keys.toSeq.filter(o => o < id &&
        cell(o) == cell(id) &&
        dot(emb(o), emb(id)) / (nrm(emb(o)) * nrm(emb(id))) >= 0.3)
      if (partners.isEmpty) None else Some(id -> partners.min)
    }.toMap
    assert(rows.length == emb.size)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == cell(id), s"cell of $id")
      removedExp.get(id) match {
        case Some(p) =>
          assert(!r.getBoolean(3) && r.getLong(2) == p, s"dup_of of $id")
        case None =>
          assert(r.getBoolean(3) && r.isNullAt(2), s"$id must be kept")
      }
    }
    // the synthetic corpus must exercise BOTH branches or the test is vacuous
    assert(removedExp.nonEmpty && removedExp.size < emb.size)
  }

  test("q90 fusion recomputes from its own leg ranks and orders totally") {
    val rows = graft.SparkEntry.queries("q90_hybrid_rrf")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getInt(3)),
        if (r.isNullAt(4)) None else Some(r.getInt(4)),
        r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (q, rank, doc, lex, sem, micro) =>
      val exp = lex.map(r => microRound(1e9 / (60 + r))).getOrElse(0L) +
        sem.map(r => microRound(1e9 / (60 + r))).getOrElse(0L)
      assert(micro == exp, s"q$q doc $doc rrf_micro")
      assert(lex.nonEmpty || sem.nonEmpty, s"q$q doc $doc retrieved by neither leg")
    }
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length),
        s"q$q ranks not consecutive")
      val resorted = sorted.sortBy { case (_, _, d, _, _, m) => (-m, d) }
      assert(resorted.map(_._3).toSeq == sorted.map(_._3).toSeq,
        s"q$q emitted order must equal (rrf DESC, doc_id)")
    }
    // the fusion must actually fuse: at least one doc carries both ranks
    assert(rows.exists { case (_, _, _, l, s, _) => l.nonEmpty && s.nonEmpty })
  }

  test("q93 matches a sequential greedy-MMR replay, and actually diversifies") {
    import org.apache.spark.sql.functions._
    val emb = graft.core.Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toVector).toMap
    def dot(a: Vector[Double], b: Vector[Double]): Double =
      a.lazyZip(b).map(_ * _).foldLeft(0.0)(_ + _)
    def nrm(a: Vector[Double]): Double = math.sqrt(dot(a, a))
    def cosMicro(a: Long, b: Long): Long =
      microRound((dot(emb(a), emb(b)) / (nrm(emb(a)) * nrm(emb(b)))) * 1e6)
    val expected: Seq[(Long, Long, Long, Long, Int)] =
      Seq(1L, 2L, 3L).flatMap { qid =>
        val cand = emb.keys.toSeq.filter(_ != qid)
          .map(d => d -> cosMicro(qid, d))
          .sortBy { case (d, rel) => (-rel, d) }.take(12)
        val rel = cand.toMap
        var sel = Vector.empty[(Long, Long, Long, Int)] // doc, rel, mmr, pick
        for (pick <- 1 to 5) {
          val scored = cand.collect {
            case (d, r) if !sel.exists(_._1 == d) =>
              val maxSim =
                if (sel.isEmpty) 0L
                else sel.map(s => cosMicro(d, s._1)).max
              (d, r, 7 * r - (if (pick == 1) 0L else 3 * maxSim))
          }
          val (d, r, m) = scored.minBy { case (d, _, m) => (-m, d) }
          sel :+= ((d, r, m, pick))
        }
        sel.map { case (d, r, m, p) => (qid, d, r, m, p) }
      }
    val got = graft.SparkEntry.queries("q93_mmr_rerank")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))
    assert(got.toSeq == expected)
    // non-vacuity: diversification must change SOME pick relative to the
    // pure-relevance top-5, else the test corpus proves nothing
    val pureTop5 = Seq(1L, 2L, 3L).flatMap { qid =>
      emb.keys.toSeq.filter(_ != qid).map(d => d -> cosMicro(qid, d))
        .sortBy { case (d, rel) => (-rel, d) }.take(5).map(_._1)
    }
    assert(got.map(_._2).toSeq != pureTop5)
  }

  test("q94 matches a sequential two-pass PRF replay, and expansion engages") {
    val toks = docToks()
    val n = toks.size
    val tf: Map[(Long, String), Int] =
      toks.toSeq.flatMap { case (id, ws) => ws.map(w => (id, w)) }
        .groupBy(identity).view.mapValues(_.size).toMap
    val df: Map[String, Int] =
      tf.keys.toSeq.groupBy(_._2).view.mapValues(_.size).toMap
    def idfMicro(term: String): Long =
      microRound(math.log(1.0 + ((n - df(term)).toDouble + 0.5) /
        (df(term).toDouble + 0.5)) * 1e6)
    // pass 1 + top-5 feedback docs
    val pass1 = bm25Replay()
    val fb: Map[Long, Seq[Long]] =
      pass1.toSeq.map { case ((q, d), (_, sc)) => (q, d, sc) }
        .groupBy(_._1).view.mapValues {
          _.map { case (_, d, sc) => (d, sc) }
            .sortBy { case (d, sc) => (-sc, d) }.map(_._1).take(5)
        }.toMap
    // expansion: top-3 terms by fbtf * idf_micro, original terms excluded
    val origTerms: Map[Long, Set[String]] =
      queryTerms.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expanded: Seq[(Long, String)] = fb.toSeq.flatMap { case (q, docs) =>
      docs.flatMap(d => toks(d)).groupBy(identity).toSeq
        .collect { case (term, occ) if !origTerms(q)(term) =>
          (term, occ.size.toLong * idfMicro(term))
        }
        .sortBy { case (term, sc) => (-sc, term) }.take(3)
        .map { case (term, _) => (q, term) }
    }
    assert(expanded.size == 9, "each query must gain 3 expansion terms")
    // pass 2 over the expanded sets, top-5
    val pass2 = bm25Replay(queryTerms ++ expanded)
    val want: Map[Long, Seq[(Long, Long, Long)]] =
      pass2.toSeq.map { case ((q, d), (h, sc)) => (q, d, h, sc) }
        .groupBy(_._1).view.mapValues { rows =>
          rows.map { case (_, d, h, sc) => (d, h, sc) }
            .sortBy { case (d, _, sc) => (-sc, d) }.take(5)
        }.toMap
    val got = graft.SparkEntry.queries("q94_prf_expansion")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.nonEmpty)
    got.foreach { case (q, rank, doc, hit, micro) =>
      assert(want(q)(rank - 1) == ((doc, hit, micro)),
        s"q$q rank $rank: got ($doc,$hit,$micro) want ${want(q)(rank - 1)}")
    }
    // non-vacuity: the expanded ranking must differ from pass 1's top-5
    val p1Top = fb.toSeq.sortBy(_._1).flatMap(_._2)
    assert(got.sortBy(r => (r._1, r._2)).map(_._3).toSeq != p1Top)
  }

  test("q90's lexical leg agrees with the q88 scorer") {
    val exp = bm25Replay()
    val lexTop: Map[Long, Seq[Long]] =
      exp.toSeq.map { case ((q, d), (_, sc)) => (q, d, sc) }
        .groupBy(_._1).view.mapValues {
          _.map { case (_, d, sc) => (d, sc) }
            .sortBy { case (d, sc) => (-sc, d) }.map(_._1).take(20)
        }.toMap
    val rows = graft.SparkEntry.queries("q90_hybrid_rrf")(spark, sf0001)
      .collect()
    rows.foreach { r =>
      if (!r.isNullAt(3)) {
        val q = r.getLong(0); val doc = r.getLong(2); val lr = r.getInt(3)
        assert(lexTop(q)(lr - 1) == doc, s"q$q lex_rank $lr should be doc $doc")
      }
    }
  }
}
