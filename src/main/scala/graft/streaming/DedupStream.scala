package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming near-duplicate detection — the ingest-time form of q36's
  * MinHash+LSH (SURVEY LLM-ops): flag each arriving document that
  * collides with an EARLIER document on any LSH band, across
  * micro-batches.
  *
  * The batch path computes signatures with a groupBy over exploded
  * shingles; a streaming aggregation would force watermark/output-mode
  * constraints, so here the 8-minhash signature folds PER ROW with
  * higher-order array functions (`transform` + `array_min` over the
  * shingle array — same md5 min-wise family, provably equal to the
  * batch aggregation; DedupStreamSpec asserts signature parity). The
  * only stateful operator is one `flatMapGroupsWithState` keyed by band
  * key holding the first doc_id seen — exactly the state a 100-TB
  * ingest dedup needs (band-key -> representative), bounded by corpus
  * band cardinality; production would add a state-store TTL for
  * sliding-horizon dedup.
  */
object DedupStream {

  /** Word-trigram shingles of `text` (same zip_with shape as
    * Dedup.shinglesOf: lambda-argument-only, no inlined regex).
    */
  private def shingles(textCol: Column): Column = {
    val t = split(trim(textCol), "\\s+")
    val tri = zip_with(
      zip_with(t, slice(t, lit(2), greatest(size(t) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b)),
      slice(t, lit(3), greatest(size(t) - 2, lit(0))),
      (ab, c) => concat(ab, lit(" "), c))
    array_distinct(filter(tri, x => x.isNotNull))
  }

  /** Per-row 8-minhash signature: min(md5(seed:shingle)) per seed — no
    * aggregation, so it runs on a stream without watermarks.
    */
  def signature(textCol: Column): Column =
    transform(sequence(lit(0), lit(7)),
      i => array_min(transform(shingles(textCol),
        s => md5(concat_ws(":", i, s)))))

  /** 4 band keys (2 rows per band) from a signature column. */
  def bandKeys(sig: Column): Column =
    transform(sequence(lit(0), lit(3)),
      b => md5(concat(element_at(sig, b * 2 + 1), element_at(sig, b * 2 + 2))))

  final case class BandHit(doc_id: Long, band_key: String)
  final case class DupFlag(doc_id: Long, dup_of: Long)

  /** @param docs STREAMING (id, text) frame
    * @return streaming (doc_id, dup_of) — one row per (later doc, band)
    *         collision with the band's first-seen doc; a doc colliding on
    *         several bands emits several rows (aggregate downstream if a
    *         single verdict per doc is wanted)
    */
  def nearDupFlags(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs
      .select(col("id").cast("long").as("doc_id"),
        explode(bandKeys(signature(col("text")))).as("band_key"))
      .as[BandHit]
      .groupByKey(_.band_key)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (_: String, hits: Iterator[BandHit], state: GroupState[Long]) =>
          // within one batch the iterator preserves no global order, so
          // the smallest doc_id claims an unclaimed band (deterministic)
          val batch = hits.map(_.doc_id).toSeq.sorted
          val rep = state.getOption.getOrElse(batch.head)
          if (!state.exists) state.update(rep)
          batch.filter(_ != rep).map(d => DupFlag(d, rep)).iterator
      }
      .toDF()
  }
}
