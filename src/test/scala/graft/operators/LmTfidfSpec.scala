package graft.operators

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import graft.SparkSpec

/** q73 (bigram LM scoring) and q74 (TF-IDF top terms) — exact driver-side
  * replay of the whole computation at sf0.001. The distributed result must
  * match a single-threaded from-first-principles implementation row for
  * row, including every integer micro-nat: the micro-nat rounding is the
  * determinism contract that lets the driver hash-compare a log-space
  * score across engines, so the replay recomputes it with the same
  * HALF_UP decimal rounding Spark's round() uses.
  */
class LmTfidfSpec extends SparkSpec {

  private val wordRe = "[a-z0-9]+".r

  /** Spark round() semantics: decimal HALF_UP (half away from zero). */
  private def microNats(x: Double): Long =
    new JBigDecimal(x).setScale(0, RoundingMode.HALF_UP).longValueExact()

  private def docTokens(): Map[Long, Vector[String]] =
    graft.core.Tables(spark, sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        wordRe.findAllIn(r.getString(1).toLowerCase).toVector)
      .toMap

  test("q73 matches a sequential bigram-LM replay on every doc") {
    val toks = docTokens()
    val bigrams = toks.toSeq.flatMap { case (id, ws) =>
      ws.sliding(2).collect { case Seq(a, b) => (id, a, b) }
    }
    val c12 = bigrams.groupBy(t => (t._2, t._3)).view.mapValues(_.size).toMap
    val c1 = bigrams.groupBy(_._2).view.mapValues(_.size).toMap
    val v = toks.values.flatten.toSet.size
    val expected: Map[Long, (Long, Long)] = toks.map { case (id, ws) =>
      val mns = ws.sliding(2).collect { case Seq(a, b) =>
        val p = (c12((a, b)) + 1).toDouble / (c1(a) + v).toDouble
        microNats(math.log(p) * 1e6)
      }.toVector
      id -> (mns.size.toLong, mns.sum)
    }
    val got = graft.SparkEntry.queries("q73_bigram_lm")(spark, sf0001)
      .collect()
    assert(got.length == toks.size)
    got.foreach { r =>
      val id = r.getLong(0)
      val (nExp, mnExp) = expected(id)
      assert(r.getLong(1) == nExp, s"n_bigrams doc $id")
      assert(r.getLong(2) == mnExp, s"lm_micro_nats doc $id")
      if (nExp == 0) assert(r.isNullAt(3), s"empty doc $id must score NULL")
      else assert(r.getDouble(3) == mnExp.toDouble / 1e6 / nExp.toDouble,
        s"avg_logprob doc $id")
    }
  }

  test("q111 is exactly q73's scored set gated at the discrete 20th percentile") {
    // derive the expected kept set from q73's OWN output (the shared-CTE
    // contract driver-checked): rank metric = integer micro-nats per
    // bigram with toward-zero division, cutoff = percentile_disc(0.2)
    // (smallest value whose cumulative fraction >= 0.2), gate >= cutoff
    val scored = graft.SparkEntry.queries("q73_bigram_lm")(spark, sf0001)
      .collect().filter(_.getLong(1) > 0)
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(2) / r.getLong(1)))
    assert(scored.nonEmpty)
    val sorted = scored.map(_._4).sorted
    val cut = sorted(math.ceil(0.2 * sorted.length).toInt - 1)
    val expKept = scored.filter(_._4 >= cut).map(_._1).toSet
    val got = graft.SparkEntry.queries("q111_lm_filter_apply")(spark, sf0001)
      .collect()
    assert(got.map(_.getLong(0)).toSet == expKept, "kept-set membership")
    got.foreach { r =>
      assert(r.getLong(3) == r.getLong(2) / r.getLong(1),
        s"avg_mn must be the integer division, doc ${r.getLong(0)}")
      assert(r.getLong(3) >= cut, s"below-cutoff doc ${r.getLong(0)} kept")
    }
    // at least the target fraction dropped-or-tied: kept <= n, dropped
    // strictly below cutoff is <= 20% of scored by percentile_disc
    val dropped = scored.length - got.length
    assert(dropped > 0, "the filter must drop someone (non-vacuity)")
    assert(dropped <= math.ceil(0.2 * scored.length).toInt,
      "percentile_disc(0.2) can drop at most the bottom fifth")
  }

  test("q74 matches a sequential TF-IDF replay (top-3, total order)") {
    val toks = docTokens()
    val n = toks.size
    val tf: Map[(Long, String), Int] =
      toks.toSeq.flatMap { case (id, ws) => ws.map(w => (id, w)) }
        .groupBy(identity).view.mapValues(_.size).toMap
    val df: Map[String, Int] =
      tf.keys.toSeq.groupBy(_._2).view.mapValues(_.size).toMap
    val idfMicro: Map[String, Long] = df.map { case (w, d) =>
      w -> microNats((math.log((n + 1).toDouble / (d + 1).toDouble) + 1.0) * 1e6)
    }
    val expected: Seq[(Long, String, Long, Long, Long, Int)] =
      tf.keys.toSeq.groupBy(_._1).toSeq.flatMap { case (id, keys) =>
        keys.map { case (_, w) =>
          (w, tf((id, w)).toLong, df(w).toLong, tf((id, w)) * idfMicro(w))
        }.sortBy { case (w, _, _, score) => (-score, w) }
          .take(3).zipWithIndex
          .map { case ((w, t, d, sc), i) => (id, w, t, d, sc, i + 1) }
      }.sortBy(t => (t._1, t._6))
    val got = graft.SparkEntry.queries("q74_tfidf")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getInt(5)))
      .toSeq
    assert(got == expected)
    // every non-empty doc surfaces, capped at 3 contiguous ranks
    val byDoc = got.groupBy(_._1)
    assert(byDoc.keySet == toks.filter(_._2.nonEmpty).keySet)
    byDoc.values.foreach(rs => assert(rs.map(_._6).sorted == (1 to rs.size)))
  }
}
