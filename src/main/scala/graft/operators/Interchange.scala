package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}
import graft.sources.Sources

/** Format-interchange operators: the paths data takes INTO and OUT OF the
  * engine beyond the columnar tables (SURVEY §2.1's S-series covers
  * CSV/TSV/parquet; this adds the JSONL corpus interchange every LLM
  * training pipeline speaks).
  */
object Interchange {

  /** Fresh temp dir for a round-trip write, reclaimed at JVM exit: the
    * returned DataFrame reads the dir lazily (possibly long after this
    * call), so eager deletion is impossible — instead ONE shutdown hook
    * (registered on first use, not per invocation — Bench/ScaleBench
    * call these queries dozens of times per JVM) drains a shared queue,
    * bounding the leak at one dir per invocation per JVM instead of
    * accumulating corpus copies across runs forever.
    */
  private val roundtripDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  private lazy val reaperInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete()
      }
      var p = roundtripDirs.poll()
      while (p != null) { rm(p.toFile); p = roundtripDirs.poll() }
    }))

  private def roundtripDir(prefix: String): String = {
    reaperInstalled
    val p = Files.createTempDirectory(prefix)
    roundtripDirs.add(p)
    p.toString
  }

  val defs: Seq[QueryDef] = Seq(

    /* JSONL round-trip, oracle-gated: documents → JSONL (Spark writer,
     * escaped strings, one record per line) → FAILFAST schema-pinned read
     * → compared by the driver against DuckDB reading the ORIGINAL
     * parquet. Green means the JSONL path preserves every value exactly
     * (including empty strings and nulls — the writer drops null fields,
     * the schema-pinned reader restores them), so corpora can enter and
     * leave the engine through JSONL without a parity risk. The write
     * lands in a fresh temp dir per invocation; both steps are
     * distributed (no driver funnel, no coalesce).
     */
    QueryDef(
      "q75_jsonl_roundtrip",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
        val tmp = roundtripDir("graft-jsonl")
        Sources.writeJsonl(d, tmp)
        Sources.readJsonl(s, tmp, d.schema)
          .select("doc_id", "text", "lang", "source", "n_chars")
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, text, lang, source, n_chars
             |FROM documents ORDER BY doc_id""".stripMargin)),

    /* ORC round-trip under the SAME oracle shape as q75: documents →
     * ORC (Spark's built-in columnar writer — the OTHER columnar
     * interchange format warehouse estates speak) → schema-pinned read
     * → compared against DuckDB reading the ORIGINAL parquet. Green
     * means the ORC path preserves every value exactly, so the engine
     * can sit in an ORC-based estate (Hive-era tables, Trino
     * connectors) without a parity risk. Both steps distributed; the
     * schema is pinned on read for the same reason as q75 — inference
     * costs an extra pass at scale and can widen types.
     */
    QueryDef(
      "q98_orc_roundtrip",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
        val tmp = roundtripDir("graft-orc")
        d.write.mode("overwrite").orc(tmp)
        s.read.schema(d.schema).orc(tmp)
          .select("doc_id", "text", "lang", "source", "n_chars")
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, text, lang, source, n_chars
             |FROM documents ORDER BY doc_id""".stripMargin))
  )
}
