package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Clustering]] — properties the oracle hash alone cannot localize:
  * a from-first-principles driver-side replay of the full Lloyd chain
  * (quantize → seed → assign → integer-mean update ×2 → final assign),
  * non-vacuity (the iterations actually move assignments), Lloyd's
  * objective monotonicity, the empty-cluster carry-over path, and the
  * broadcast shape of the assignment plan.
  */
class ClusteringSpec extends SparkSpec {

  import spark.implicits._

  private def q() =
    graft.SparkEntry.queries("q101_kmeans_cells")(spark, sf0001)

  /** Driver-side integer Lloyd, written independently of the operator:
    * plain Scala collections, same quantization and rounding contract.
    */
  private def replay(vecs: Seq[(Long, Array[Long])], k: Int, iters: Int)
      : Map[Long, (Long, Long)] = {
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def assign(cents: Seq[(Long, Array[Long])]) =
      vecs.map { case (id, v) =>
        val (cid, d) = cents.map { case (c, cv) => (c, d2(v, cv)) }
          .minBy { case (c, d) => (d, c) }
        id -> ((cid, d))
      }.toMap
    def roundDiv(s: Long, n: Long): Long =
      if (s >= 0) (2 * s + n) / (2 * n) else -((-2 * s + n) / (2 * n))
    var cents = vecs.sortBy(_._1).take(k)
    for (_ <- 1 to iters) {
      val asg = assign(cents)
      cents = cents.map { case (cid, old) =>
        val members = vecs.filter(v => asg(v._1)._1 == cid).map(_._2)
        if (members.isEmpty) (cid, old)
        else {
          val n = members.size.toLong
          (cid, old.indices.map(i => roundDiv(members.map(_(i)).sum, n)).toArray)
        }
      }
    }
    assign(cents)
  }

  private def collected(): Seq[(Long, Long, Long)] =
    q().collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("q101 equals an independent driver-side Lloyd replay") {
    val raw = graft.core.Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map { r =>
        val v = r.getSeq[Float](1)
          .map(x => BigDecimal(x.toDouble * 1000000.0)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toArray
        (r.getLong(0), v)
      }.toSeq
    val expect = replay(raw, 8, 2)
    val got = collected()
    assert(got.size == raw.size)
    got.foreach { case (id, cid, d) =>
      assert(expect(id) == ((cid, d)), s"vec $id diverged")
    }
  }

  test("the iterations are non-vacuous: assignments move from the seed step") {
    val vecs = graft.core.Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * lit(1000000.0)).cast("long")).as("qv"))
    val initial = Clustering.lloyd(vecs, 8, 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fin = collected().map(t => t._1 -> t._2).toMap
    assert(initial != fin)
    // Lloyd monotonicity: total within-cluster SSE shrinks (integer
    // rounding could in principle nudge a step, so gate start vs end)
    val sse0 = Clustering.lloyd(vecs, 8, 0)
      .agg(sum("dist2")).head().getLong(0)
    val sse2 = q().agg(sum("dist2")).head().getLong(0)
    assert(sse2 < sse0, s"SSE did not improve: $sse0 -> $sse2")
  }

  test("a centroid with no members carries over unchanged") {
    // duplicate seed coordinates: every iter-1 tie assigns to the lower
    // cid, so centroid 1 is memberless after the first update and must
    // carry over — then WINS points back once centroid 0 has moved
    val data = Seq(
      (0L, Array(0L, 0L)),
      (1L, Array(0L, 0L)),
      (2L, Array(5L, 0L)))
    val vecs = data.toDF("vec_id", "qv")
    val out = Clustering.lloyd(vecs, 2, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val expect = replay(data, 2, 2)
    out.foreach { case (id, cid, d) => assert(expect(id) == ((cid, d))) }
    // the carried-over origin centroid captured the origin points
    assert(out.filter(_._2 == 1L).map(_._1).toSeq == Seq(0L, 1L))
    assert(out.filter(_._2 == 0L).map(_._1).toSeq == Seq(2L))
  }

  test("q102 draws the 10 smallest-priority members of each q101 cell") {
    val cells = collected().map(t => t._1 -> t._2).toMap
    val got = graft.SparkEntry
      .queries("q102_cluster_balanced_sample")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    // balanced: every cell contributes exactly k rows
    assert(got.groupBy(_._1).values.map(_.length).toSet == Set(10))
    // membership: each sampled vec_id belongs to the cell it was drawn for
    got.foreach { case (cid, _, id, _) => assert(cells(id) == cid) }
    // minimality: replay the md5 priority for every member driver-side
    // and check the drawn set per cell is exactly the bottom-10
    def prio(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id#1".getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.map("%02x".format(_)).mkString.substring(0, 15), 16)
    }
    val byCell = cells.groupBy(_._2)
    got.groupBy(_._1).foreach { case (cid, rows) =>
      val expect = byCell(cid).keys.toSeq
        .map(id => (prio(id), id)).sorted.take(10).map(_._2).toSet
      assert(rows.map(_._3).toSet == expect, s"cell $cid sample diverged")
      rows.foreach { case (_, _, id, p) => assert(p == prio(id)) }
    }
  }

  test("q104 prunes exactly the earlier-partner cosine matches within each cell") {
    val cells = collected().map(t => t._1 -> t._2).toMap
    val vecs = graft.core.Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      def fold(xs: Iterator[Double]) = xs.foldLeft(0.0)(_ + _)
      val d = fold(a.indices.iterator.map(i => a(i) * b(i)))
      d / (math.sqrt(fold(a.iterator.map(x => x * x))) *
        math.sqrt(fold(b.iterator.map(x => x * x))))
    }
    val got = graft.SparkEntry.queries("q104_semdedup_cells")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getBoolean(3)))
    assert(got.length == vecs.size)
    got.foreach { case (id, cid, dupOf, kept) =>
      assert(cells(id) == cid, s"vec $id cell drifted from q101")
      val partners = cells.collect {
        case (o, c) if c == cid && o < id &&
          cos(vecs(o), vecs(id)) >= 0.3 => o
      }
      if (partners.isEmpty) assert(kept && dupOf.isEmpty, s"vec $id")
      else assert(!kept && dupOf.contains(partners.min), s"vec $id")
    }
    // non-vacuous both ways
    assert(got.exists(!_._4) && got.exists(_._4))
  }

  test("assignment is broadcast-shaped: no shuffle on the corpus side") {
    val vecs = graft.core.Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * lit(1000000.0)).cast("long")).as("qv"))
    val plan = Clustering.lloyd(vecs, 8, 0).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan.take(2000))
  }

  test("annIndexedKnob at cells=1 is exact brute-force cosine top-3") {
    // the scale-curve helper duplicates q117's probe shape inline; this
    // pins it against first principles so the curve cannot silently
    // drift from the query it claims to measure. With one cell, every
    // vector is a candidate for every query, so the probe must return
    // EXACTLY the brute-force (cos DESC, n_id) top-3 per query.
    val got = Clustering.annIndexedKnob(spark, sf0001, 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val vecs = graft.core.Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = vecs.keys.filter(_ < 8).toSeq.sorted.flatMap { q =>
      vecs.keys.filter(_ != q).toSeq
        .map(n => (n, cos(vecs(q), vecs(n))))
        .sortBy { case (n, c) => (-c, n) }
        .take(3).zipWithIndex
        .map { case ((n, _), i) => (q, i + 1, n) }
    }
    assert(got == want, s"got ${got.take(6)}... want ${want.take(6)}...")
  }

  test("annIndexedKnob candidate work is cell-bounded at cells=8") {
    // with 8 hash cells and nprobe=2, at most 2 cells' vectors per
    // query are candidates — the result must still be 3 ranked rows per
    // query with no self-matches and rank sequences exactly 1..3
    val rows = Clustering.annIndexedKnob(spark, sf0001, 8).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until 8L).toSet)
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == Seq(1, 2, 3))
      assert(rs.forall(_.getLong(2) != q), s"self-match for query $q")
    }
  }
}
