package graft.operators

import java.io.File

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning

import graft.SparkSpec

/** Winnowing (q106) and duplicate-span detection (q107) contract:
  * sequential first-principles replay, the SIGMOD'03 coverage and
  * guarantee properties, hash-layer honesty, and the map-side plan.
  */
class WinnowSpec extends SparkSpec {
  import Winnow.{K, W}

  private def q(name: String) = Winnow.defs.find(_.name == name).get.fn

  /** SQL-semantics trim: strips ONLY spaces, like Spark trim(col) and
    * DuckDB trim() — java.lang.String.trim also strips \t\n\f\r and
    * would diverge from the engine on docs with leading/trailing
    * non-space whitespace.
    */
  private def sqlTrim(s: String): String =
    s.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse

  /** Independent Horner fold of a code-point slice under (b, m) — the
    * straight-line definition the engine's rolling hash must equal.
    */
  private def horner(cps: Array[Int], from: Int, len: Int, b: Long, m: Long): Long =
    (from until from + len).foldLeft(0L)((acc, i) => (acc * b + cps(i)) % m)

  /** Sequential robust winnowing from first principles, over CODE
    * POINTS (the character unit Spark's length/substring and DuckDB's
    * len/substr both count — a UTF-16 replay would silently diverge on
    * astral chars): Karp-Rabin-hash every k-gram, per complete window
    * of w keys keep the min (smallest hash, rightmost position via the
    * inverted-position encoding), dedupe, then attach the two-modulus
    * 61-bit match hash.
    */
  private def replay(text: String): Set[(Long, Long)] = {
    import Winnow.{B1, B2, M1, M2}
    val cps = sqlTrim(text).codePoints().toArray
    val n = cps.length
    if (n < K + W - 1) Set.empty
    else {
      // unpacked form of the engine's min-key selection — "smallest
      // hash, rightmost position" — valid at ANY length, so the same
      // straight-line definition also specifies what chunked winnowing
      // of a > MaxDocLen doc must produce (chunking is exact)
      val np = n - (K - 1)
      val h1s = Array.tabulate(np)(i => horner(cps, i, K, B1, M1))
      (0 until np - (W - 1)).map { j =>
        var best = j
        var i = j + 1
        while (i < j + W) {
          if (h1s(i) <= h1s(best)) best = i
          i += 1
        }
        best
      }.distinct.map { bi =>
        (bi + 1L, h1s(bi) * 1073741824L + horner(cps, bi, K, B2, M2))
      }.toSet
    }
  }

  private def corpusTexts(dir: String): Map[Long, String] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap

  test("q106 equals a sequential driver-side winnowing replay") {
    val out = q("q106_winnow_fingerprints")(spark, sf0001)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val docs = corpusTexts(sf0001)
    assert(docs.size >= 100)
    docs.foreach { case (id, text) =>
      assert(out.getOrElse(id, Set.empty[(Long, Long)]) == replay(text),
        s"doc $id diverges from the sequential replay")
    }
  }

  test("coverage invariant: every complete window holds a selection") {
    val byDoc = q("q106_winnow_fingerprints")(spark, sf0001)
      .collect().groupBy(_.getLong(0))
    val lens = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("doc_id", "length(trim(text)) AS n").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (id, rows) =>
      val ps = rows.map(_.getLong(1)).sorted
      val np = lens(id) - (K - 1)
      // window 1 covers [1, W]; the last window covers [np-W+1, np]; and
      // no stretch of W consecutive positions lacks a selection
      assert(ps.head <= W, s"doc $id: first selection ${ps.head}")
      assert(ps.last >= np - W + 1, s"doc $id: last selection ${ps.last}")
      ps.sliding(2).foreach {
        case Array(a, b) => assert(b - a <= W, s"doc $id: gap ${b - a}")
        case _           =>
      }
    }
  }

  test("a shared substring of length w+k-1 guarantees a shared fingerprint") {
    val shared = "GRAFT SHARED BOILERPLATE SEGMENT NUMBER" // exactly 39
    assert(shared.length == K + W - 1)
    val dir = {
      val d = File.createTempFile("graft-winnow", "")
      d.delete(); d.mkdirs(); d.getAbsolutePath
    }
    import spark.implicits._
    Seq(
      (0L, s"alpha preamble text long enough to winnow $shared alpha tail section here", "en", "a"),
      (1L, s"a completely different document opening $shared with its own distinct ending", "en", "b"),
      (2L, "this control document shares no thirty-char gram with either of the others", "en", "c"))
      .toDF("doc_id", "text", "lang", "source")
      .selectExpr("doc_id", "text", "lang", "source", "length(text) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val fps = q("q106_winnow_fingerprints")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val (a, b, c) = (fps(0L), fps(1L), fps(2L))
    assert((a & b).nonEmpty,
      "docs sharing a w+k-1 substring must share a selected hash")
    assert((c & (a ++ b)).isEmpty,
      "the control doc shares no 30-char gram, so no hash")

    // q107 reports an overlapping span in BOTH sharing docs, positioned
    // over the shared region (and nothing for the control doc)
    val spans = q("q107_dup_spans")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val texts = corpusTexts(dir)
    Seq(0L, 1L).foreach { id =>
      val at = sqlTrim(texts(id)).indexOf(shared) + 1L
      val hit = spans.filter(_._1 == id)
      assert(hit.nonEmpty, s"doc $id: shared region not reported")
      assert(hit.exists(s => s._2 <= at + shared.length - 1 && s._3 >= at),
        s"doc $id: no span overlaps the shared region at $at")
    }
    assert(!spans.exists(_._1 == 2L), "control doc must have no dup span")
  }

  test("q107 dup hits are backed by gram TEXT shared across docs") {
    // 61-bit two-modulus hashes could in principle fabricate a cross-doc
    // "duplicate" by collision; re-derive each selected fingerprint's
    // gram text and check the hash-level dup verdict agrees with the
    // text-level one
    val texts = corpusTexts(sf0001)
    val sel = texts.toSeq.flatMap { case (id, t) =>
      replay(t).map { case (pos, h) =>
        (id, h, sqlTrim(t).substring(pos.toInt - 1, pos.toInt - 1 + K))
      }
    }
    val docsByHash = sel.groupBy(_._2).view.mapValues(_.map(_._1).toSet)
    val docsByGram = sel.groupBy(_._3).view.mapValues(_.map(_._1).toSet)
    val dupHashes = docsByHash.filter(_._2.size >= 2).keySet
    assert(dupHashes.nonEmpty, "sf0.001 must contain cross-doc dups")
    sel.filter(s => dupHashes.contains(s._2)).foreach { case (id, h, gram) =>
      assert(docsByGram(gram).size >= 2,
        s"hash $h dup across docs but gram text is unique — collision")
    }
  }

  /** Sequential q108 replay: ownership by min doc_id, foreign-hit
    * islands, splice. Returns (n_spans, n_removed, clean_text) per doc.
    */
  private def replayApply(texts: Map[Long, String]): Map[Long, (Long, Long, String)] = {
    import Winnow.G
    val fps = texts.map { case (id, t) => id -> replay(t) }
    val owner = fps.toSeq
      .flatMap { case (id, s) => s.map { case (_, h) => (h, id) } }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    texts.map { case (id, t) =>
      val tx = sqlTrim(t)
      val foreign = fps(id).toSeq
        .filter { case (_, h) => owner(h) != id }
        .map(_._1).sorted
      val spans = foreign.foldLeft(List.empty[(Long, Long)]) {
        case ((s, e) :: rest, p) if p - (e - (K - 1)) <= G =>
          (s, p + (K - 1)) :: rest
        case (acc, p) => (p, p + (K - 1)) :: acc
      }.reverse
      val clean = spans.foldRight((tx, List.empty[String])) {
        case ((s, e), (remaining, acc)) =>
          // spans are char ranges on tx; splice right-to-left
          (remaining.substring(0, (s - 1).toInt),
            remaining.substring(math.min(e.toInt, remaining.length)) :: acc)
      } match { case (head, tails) => (head :: tails).mkString }
      id -> (spans.size.toLong,
        spans.map { case (s, e) => e - s + 1 }.sum, clean)
    }
  }

  test("q108 equals a sequential ownership+splice replay") {
    val texts = corpusTexts(sf0001)
    val exp = replayApply(texts)
    val got = q("q108_span_dedup_apply")(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(got.keySet == texts.keySet)
    assert(got.values.exists(_._1 > 0L), "apply must remove something")
    texts.keys.foreach { id =>
      assert(got(id) == exp(id), s"doc $id diverges from the splice replay")
    }
    // evidence consistency: removed chars == length delta, per doc
    got.foreach { case (id, (_, removed, clean)) =>
      assert(sqlTrim(texts(id)).length - clean.length == removed, s"doc $id")
    }
  }

  test("q108 keep-first on the synthetic corpus: one surviving copy") {
    val shared = "GRAFT SHARED BOILERPLATE SEGMENT NUMBER"
    val dir = {
      val d = File.createTempFile("graft-winnow-apply", "")
      d.delete(); d.mkdirs(); d.getAbsolutePath
    }
    import spark.implicits._
    Seq(
      (0L, s"alpha preamble text long enough to winnow $shared alpha tail section here", "en", "a"),
      (1L, s"a completely different document opening $shared with its own distinct ending", "en", "b"),
      (2L, "this control document shares no thirty-char gram with either of the others", "en", "c"))
      .toDF("doc_id", "text", "lang", "source")
      .selectExpr("doc_id", "text", "lang", "source", "length(text) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = q("q108_span_dedup_apply")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(3))).toMap
    assert(rows(0L)._1 == 0L && rows(0L)._2.contains(shared),
      "the owner doc keeps the shared region")
    assert(rows(1L)._1 >= 1L && !rows(1L)._2.contains(shared),
      "the later doc loses the shared region")
    assert(rows(2L)._1 == 0L, "the control doc is untouched")
  }

  test("non-ASCII docs fingerprint by code point (BMP and astral)") {
    // the engine hashes code points (WinnowFingerprints iterates
    // codePointAt; DuckDB's ascii/substr count the same unit) — a doc
    // mixing 2-byte BMP chars and a 4-byte astral char must match the
    // code-point replay exactly; a UTF-16 or byte-level engine would
    // shift every downstream position and hash
    val dir = {
      val d = File.createTempFile("graft-winnow-uni", "")
      d.delete(); d.mkdirs(); d.getAbsolutePath
    }
    val astral = new String(Character.toChars(0x1F600))
    val t0 = s"café naïve résumé $astral " +
      "shared unicode winnow segment body with enough length to fingerprint"
    val t1 = s"another carrier of the same trailing text $astral " +
      "shared unicode winnow segment body with enough length to fingerprint"
    import spark.implicits._
    Seq((0L, t0, "fr", "a"), (1L, t1, "fr", "b"))
      .toDF("doc_id", "text", "lang", "source")
      .selectExpr("doc_id", "text", "lang", "source", "length(text) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = q("q106_winnow_fingerprints")(spark, dir)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    Seq(0L -> t0, 1L -> t1).foreach { case (id, t) =>
      assert(out(id) == replay(t), s"doc $id diverges on unicode text")
    }
    assert((out(0L).map(_._2) & out(1L).map(_._2)).nonEmpty,
      "the shared >= w+k-1 suffix must yield a shared hash across docs")
  }

  test("docs beyond MaxDocLen chunk-winnow exactly; boundary spans found") {
    // over-length docs are chunked (overlap >= w+k-2) and winnowed per
    // chunk — EXACT: each window's selection is window-local, so the
    // union of per-chunk selections over complete windows equals the
    // whole-doc winnow set. Proven here against the straight-line
    // replay (which knows nothing about chunks), and the detect/apply
    // path must find a duplicated span STRADDLING the chunk boundary.
    val dir = {
      val d = File.createTempFile("graft-winnow-long", "")
      d.delete(); d.mkdirs(); d.getAbsolutePath
    }
    val span = (1 to 30).map(i => s"bspan$i").mkString(" ")
    // plant the span across the first chunk boundary (chunk 1 ends at
    // char MaxDocLen): filler to MaxDocLen - 100, span (~200 chars),
    // filler tail — deterministic, non-repeating filler words so the
    // only cross-doc duplication is the span
    def filler(tag: String, chars: Long): String = {
      val sb = new StringBuilder
      var i = 0
      while (sb.length < chars) { sb.append(tag).append(i).append(' '); i += 1 }
      sb.toString.take(chars.toInt)
    }
    val long = (filler("qa", Winnow.MaxDocLen - 100) + " " + span + " " +
      filler("qb", 64 * 1024)).trim
    assert(long.length > Winnow.MaxDocLen)
    val partner = (filler("qc", 3000) + " " + span + " " +
      filler("qd", 3000)).trim
    import spark.implicits._
    Seq((0L, long, "en", "a"), (1L, partner, "en", "b"))
      .toDF("doc_id", "text", "lang", "source")
      .selectExpr("doc_id", "text", "lang", "source", "length(text) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val fps = q("q106_winnow_fingerprints")(spark, dir).collect()
      .groupBy(_.getLong(0))
    val longFps = fps(0L).map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(longFps.exists(_._1 > Winnow.MaxDocLen),
      "re-based fingerprints must extend past the first chunk")
    assert(fps(0L).length == longFps.size &&
        longFps.size == longFps.map(_._1).size,
      "chunk-overlap duplicates must fold to one row per position")
    assert(longFps == replay(long),
      "chunked winnowing must equal the whole-doc straight-line replay")
    assert(fps(1L).map(r => (r.getLong(1), r.getLong(2))).toSet ==
      replay(partner))
    // the duplicated span straddles the boundary: q107 must report a
    // span for the long doc that starts before MaxDocLen and ends after
    val spans = q("q107_dup_spans")(spark, dir).collect()
      .filter(_.getLong(0) == 0L)
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(spans.exists { case (s, e) =>
        s <= Winnow.MaxDocLen && e > Winnow.MaxDocLen },
      s"no boundary-straddling span in ${spans.toSeq}")
    // apply: the partner (doc 1, later id) loses the span; the long doc
    // (owner) ships intact
    val applied = q("q108_span_dedup_apply")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(3)))).toMap
    assert(applied(0L) == ((0L, long)), "owner doc must pass through intact")
    assert(applied(1L)._1 >= 1L && !applied(1L)._2.contains("bspan7 "),
      "partner doc must ship with the duplicated span spliced out")
  }

  test("a three-chunk doc winnows exactly (carry propagates through the middle chunk)") {
    // two boundaries: the middle chunk both SUPPRESSES against chunk
    // 1's carry and PRODUCES the carry for chunk 3 — the full
    // slide/suppress cycle of the in-expression chunking, checked
    // against the chunk-oblivious straight-line replay. Direct
    // expression-level test (no parquet round-trip needed).
    def filler(tag: String, chars: Long): String = {
      val sb = new StringBuilder
      var i = 0
      while (sb.length < chars) { sb.append(tag).append(i).append(' '); i += 1 }
      sb.toString.take(chars.toInt)
    }
    val text = filler("tc", 2 * Winnow.MaxDocLen + 200000)
    assert(text.length > 2 * Winnow.ChunkStride + (K + W - 1),
      "fixture must span three chunks")
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val got = Seq(text).toDF("t")
      .selectExpr("explode(graft_winnow_fingerprints(t)) AS fp")
      .select("fp.pos", "fp.h").as[(Long, Long)].collect().toSet
    val exp = replay(text)
    assert(got.exists(_._1 > 2 * Winnow.ChunkStride),
      "fingerprints must reach the third chunk")
    assert(got == exp,
      s"3-chunk winnow diverged: sizes ${got.size} vs ${exp.size}")
  }

  test("q106 plan: hash shuffles carry doc-level rows only") {
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = q("q106_winnow_fingerprints")(spark, sf0001)
        .queryExecution.executedPlan
      val hashEx = plan.collect {
        case e: ShuffleExchangeExec
            if e.outputPartitioning.isInstanceOf[HashPartitioning] => e
      }
      // exactly the one CpuSpread doc-level repartition — ONE branch,
      // ONE scan (chunking is a conditional chunk-starts explode, not a
      // union of length-split branches, which re-scanned the corpus per
      // branch) — sitting BELOW both fanouts (its subtree holds no
      // Generate), so no exchange ever carries chunk-, gram- or
      // fingerprint-level rows. The chunk-overlap dedup aggregate rides
      // the doc partitioning (subset-satisfied distribution) — pinned
      // by the exchange count staying 1.
      assert(hashEx.size == 1,
        s"expected exactly the doc-spread exchange:\n$plan")
      hashEx.foreach { e =>
        val fansOut = e.collect {
          case g: org.apache.spark.sql.execution.GenerateExec => g
        }
        assert(fansOut.isEmpty,
          s"the doc-spread exchange must precede every explode:\n$plan")
      }
      val generates = plan.collect {
        case g: org.apache.spark.sql.execution.GenerateExec => g
      }
      assert(generates.nonEmpty, "winnow fanout missing from the plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
  }
}
