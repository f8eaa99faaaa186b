package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.tagger.{DrugTagger, LookupWaterfall}

/** The C1 lookup waterfall over a STREAM of texts with a static broadcast
  * catalog (SURVEY §2.10's streaming demo shape).
  *
  * The batch waterfall encodes leg short-circuiting with anti-joins whose
  * right side derives from the stream — a stream-stream anti join, which
  * Structured Streaming does not support. Here every leg joins the probe
  * stream against the STATIC catalog independently (stream-static
  * broadcast joins, all supported), and the per-probe short-circuit
  * (exact beats prefix beats fuzzy for the same probe string — identical
  * semantics, since a probe string's exact hit is a property of the
  * static catalog, not of the batch) moves into the per-id state
  * function, along with the (leg, score, probe_pos, key) top-1.
  */
object TaggerStream {

  final case class StreamHit(id: Long, probe: String, probe_pos: Int,
      key: String, generic_name: String, atc_code: String, leg: Int,
      score: Int)
  final case class StreamTag(id: Long, key: String, generic_name: String,
      atc_code: String, match_reason: String)

  /** @param texts   STREAMING (id, text) frame
    * @param catalog static (key, generic_name, atc_code, ...) frame
    * @return streaming (id, key, generic_name, atc_code, match_reason)
    */
  def tagStream(spark: SparkSession, texts: DataFrame, catalog: DataFrame,
      cfg: LookupWaterfall.Config = LookupWaterfall.Config()): DataFrame = {
    import spark.implicits._
    val probes = DrugTagger.probeFrame(texts, cfg)
    val cat = broadcast(catalog.select("key", "generic_name", "atc_code"))

    val exact = probes.join(cat, col("probe") === col("key"))
      .withColumn("leg", lit(1)).withColumn("score", lit(0))
    val prefixCond = cfg.prefixMode match {
      case "char" => col("key").startsWith(substring(col("probe"), 1, cfg.prefixLen)) &&
        col("key") =!= col("probe")
      case _ => col("key").startsWith(concat(col("probe"), lit(" ")))
    }
    val prefix = probes.join(cat, prefixCond)
      .withColumn("leg", lit(2)).withColumn("score", length(col("key")))
    val lev = levenshtein(col("probe"), col("key"), cfg.fuzzyMaxDist)
    val fuzzy = probes.join(cat,
        abs(length(col("probe")) - length(col("key"))) <= cfg.fuzzyMaxDist &&
          lev >= 0 && col("key") =!= col("probe"))
      .withColumn("leg", lit(3)).withColumn("score", lev)

    val hits = exact.unionByName(prefix).unionByName(fuzzy)
      .select(col("id"), col("probe"), col("probe_pos"), col("key"),
        col("generic_name"), col("atc_code"), col("leg"), col("score"))
      .as[StreamHit]

    // flatMapGroupsWithState is used ONLY for arbitrary per-id logic in
    // append mode (a windowed aggregation would force a watermark); the
    // state handle is never written, so the state store stays EMPTY —
    // NoTimeout is safe here because there is nothing to evict, unlike
    // DedupStream whose cross-batch state needs the event-time TTL. All
    // of an id's hits arrive in one micro-batch by construction (probes
    // derive from the text row that carries them).
    hits.groupByKey(_.id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (id: Long, rows: Iterator[StreamHit], state: GroupState[Boolean]) =>
          val all = rows.toList
          // per-probe short-circuit: keep only the best leg per probe
          val bestLegPerProbe = all.groupBy(_.probe).map {
            case (p, hs) => p -> hs.map(_.leg).min
          }
          val surviving = all.filter(h => h.leg == bestLegPerProbe(h.probe))
          surviving
            .sortBy(h => (h.leg, h.score, h.probe_pos, h.key, h.generic_name))
            .headOption
            .map(h => StreamTag(id, h.key, h.generic_name, h.atc_code, "matched"))
            .iterator
      }
      .toDF()
  }
}
