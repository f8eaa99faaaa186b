package graft.operators

import java.security.MessageDigest

import graft.{SparkEntry, SparkSpec}

/** q79 (int8-quantized ANN pre-rank) and q80 (SimHash Hamming pairs via
  * the 4×16-bit pigeonhole index): recall of the quantized path against
  * the exact q40 baseline, and a BRUTE-FORCE driver replay proving the
  * chunk index loses no hamming≤3 pair on the real corpus.
  */
class QuantizedSimhashSpec extends SparkSpec {

  test("q79 quantized pre-rank recovers q40's exact top-5 (recall >= 0.9)") {
    val exact = SparkEntry.queries("q40_cosine_topk")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val quant = SparkEntry.queries("q79_ann_quantized")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(exact.nonEmpty)
    val recall = exact.intersect(quant).size.toDouble / exact.size
    // m=32 candidates for k=5: int8 rank noise must stay inside the
    // 27-candidate slack; on this corpus the top-5 survives outright
    assert(recall >= 0.9, s"quantized recall $recall < 0.9")
  }

  test("q80 equals a brute-force all-pairs hamming replay (index loses nothing)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val md = MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // replicate the signature: distinct lower tokens, bit b of md5 is
    // bit (3 - b%4) of hex digit b/4, vote = sum(2*bit - 1), sig = vote>0
    val sigs = docs.map { case (id, text) =>
      val toks = text.trim.toLowerCase.split("[ \t\n\f\r]+").distinct
      val votes = Array.fill(64)(0)
      toks.foreach { t =>
        val h = md5hex(t)
        var b = 0
        while (b < 64) {
          val dv = "0123456789abcdef".indexOf(h.charAt(b / 4))
          val bit = (dv / Seq(8, 4, 2, 1)(b % 4)) % 2
          votes(b) += 2 * bit - 1
          b += 1
        }
      }
      id -> votes.map(v => if (v > 0) '1' else '0').mkString
    }.sortBy(_._1)
    val expected = (for {
      i <- sigs.indices.iterator
      j <- (i + 1) until sigs.length
      ham = sigs(i)._2.zip(sigs(j)._2).count { case (a, b) => a != b }
      if ham <= 3
    } yield (sigs(i)._1, sigs(j)._1, ham)).toVector.sorted
    val got = SparkEntry.queries("q80_simhash_pairs")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toVector
    assert(expected.nonEmpty, "corpus has no hamming<=3 pair — replay is vacuous")
    assert(got == expected,
      s"q80 != brute force (${got.length} vs ${expected.length} pairs)")
  }

  test("the native signature equals the declarative formula on edge inputs") {
    // engine-vs-engine: graft_simhash_sig (md5 BYTES, int[64] votes)
    // against the retired 64-conditional-sum aggregate over exploded
    // tokens (md5 HEX + conv parsing) — the exact formula q80 ran
    // before the expression promotion — on inputs the corpus doesn't
    // exercise: a leading tab surviving trim (leading empty token), an
    // empty and an all-space doc (single empty token), astral-plane and
    // combining characters, a doc of one repeated token (distinctness),
    // and single-char tokens
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val docs = Seq(
      1L -> "\tleading tab survives trim",
      2L -> "",
      3L -> "   ",
      4L -> "dup dup dup dup",
      5L -> "😀 emoji é combining",
      6L -> "a b c \n d \r e \f f",
      7L -> "MiXeD CaSe TeXt").toDF("doc_id", "text")
    val native = docs.select(col("doc_id"),
      call_function("graft_simhash_sig", trim(lower(col("text")))).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val tok = docs.select(col("doc_id"),
      explode(array_distinct(split(trim(lower(col("text"))), "[ \t\n\f\r]+")))
        .as("tok"))
      .withColumn("h", md5(col("tok")))
    val grouped = tok.select(
      col("doc_id") +: (0 until 4).map(j =>
        expr(s"cast(conv(substring(h, ${j * 8 + 1}, 8), 16, 10) as bigint)")
          .as(s"g$j")): _*)
    val votes = (0 until 64).map { b =>
      val j = b / 32
      val shift = 4 * (7 - (b / 4) % 8) + 3 - b % 4
      sum(expr(s"2 * (shiftright(g$j, $shift) & 1) - 1")).as(s"v$b")
    }
    val old = grouped.groupBy("doc_id").agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        concat((0 until 64).map(b =>
          when(col(s"v$b") > 0, "1").otherwise("0")): _*).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(native.keySet == old.keySet)
    native.keySet.toSeq.sorted.foreach { id =>
      assert(native(id) == old(id), s"doc $id: ${native(id)} != ${old(id)}")
    }
  }
}
