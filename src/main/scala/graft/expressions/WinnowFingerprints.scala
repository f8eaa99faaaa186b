package graft.expressions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the whole per-document robust-winnow
  * selection (Schleimer, Wilkerson & Aiken, SIGMOD'03) — string in,
  * `array<struct<pos: long, h: long>>` of selected fingerprints out.
  *
  * This is the promotion the q80 profile declined and the winnow
  * profile demands: the round-10 declarative formulation (a 13-pass
  * zip_with chain) was correct and shuffle-free, but every pass runs
  * interpreted with boxed longs — at ~1.5 M grams per sf0.1 run the
  * per-element interpretation overhead, not the hash function, was the
  * measured floor (swapping md5 for the cheap polynomial hash inside
  * the same chain moved the floor by ~nothing). One native expression
  * does the entire selection in primitive arrays with zero intermediate
  * allocation per gram:
  *
  *  - ONE rolling Karp-Rabin update per position (Karp & Rabin, IBM
  *    JRD'87): `h1(p+1) = ((h1(p) − c_p·B1^{K−1})·B1 + c_{p+K−1}) mod
  *    M1` — O(1) per gram where the declarative chain's doubling was
  *    O(log K), and the round-9 md5 was a full digest + substring +
  *    hex-parse per gram;
  *  - the window minimum by monotonic deque — O(1) amortized per
  *    position where the zip_with min chain was O(log W) passes;
  *  - the confirm hash h2 only at SELECTED positions (~2/(w+1) of
  *    grams), exactly like the declarative form.
  *
  * The selected set is definitionally identical to the SQL formula the
  * DuckDB oracle runs (per-position Horner fold, window min of the
  * packed key, distinct): a rolling hash maintains the same residue of
  * the same polynomial, the deque computes the same min, and repeats of
  * a selected key are always CONSECUTIVE (two windows selecting the
  * same packed key overlap on its position, and every window between
  * them contains it too), so emit-on-change equals global distinct.
  * `WinnowSpec` pins both: a sequential from-first-principles replay
  * and the driver's DuckDB value hash.
  *
  * Codegen: like [[NormalizeBasic]], the generated code calls the
  * static helper on the UTF8String directly, so the projection stays
  * inside whole-stage codegen; the helper is one virtual call per DOC
  * (not per gram).
  */
case class WinnowFingerprints(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints requires a string argument, got ${child.dataType}")

  override def dataType: DataType = WinnowFingerprints.OutType
  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.WinnowFingerprints.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {

  /** gram length in chars (code points). */
  val K = 30
  /** winnow window: positions per window; guarantee length = W+K-1. */
  val W = 10
  /** selection-hash modulus: the Mersenne prime 2^31−1. */
  val M1 = 2147483647L
  /** selection-hash base. */
  val B1 = 131L
  /** confirm-hash modulus: the largest prime below 2^30. */
  val M2 = 1073741789L
  /** confirm-hash base. */
  val B2 = 137L
  /** position field width of the packed key: 2^20 positions. */
  val PosMod = 1048576L
  /** max CHUNK length the packed key can encode — longer docs are
    * chunked inside [[compute]] (see Winnow scaladoc).
    */
  val MaxDocLen = PosMod - 1

  val OutType: ArrayType = ArrayType(
    StructType(Seq(
      StructField("pos", LongType, nullable = false),
      StructField("h", LongType, nullable = false))),
    containsNull = false)

  private def powMod(b: Long, e: Int, m: Long): Long = {
    var r = 1L; var bb = b % m; var ee = e
    while (ee > 0) { if ((ee & 1) == 1) r = r * bb % m; bb = bb * bb % m; ee >>= 1 }
    r
  }
  /** B1^(K−1) mod M1 — the rolling removal multiplier. */
  private val BK1 = powMod(B1, K - 1, M1)

  private val Empty = new GenericArrayData(Array.empty[Any])

  /** chunk overlap in chars for over-length docs: >= W+K-2 guarantees
    * every window of the whole doc is fully contained in some chunk
    * (W+K-1 leaves one char of slack — shared with the oracle CTE).
    */
  val ChunkOverlap: Int = K + W - 1
  /** chunk start stride: chunks are [[MaxDocLen]] code points long. */
  val ChunkStride: Int = (MaxDocLen - ChunkOverlap).toInt

  /** static entry point shared by interpreted + generated code paths.
    *
    * Docs up to [[MaxDocLen]] code points winnow in one pass (the
    * packed (hash, position) key has a 20-bit position field). LONGER
    * docs are chunked INSIDE the expression: overlapping [[ChunkStride]]
    * windows of [[MaxDocLen]] code points, each winnowed with the same
    * rolling/deque machinery on chunk-local positions, emissions
    * re-based to doc-global offsets. The decomposition is EXACT, not an
    * approximation — a window's selection (min hash, rightmost tie) is
    * a pure function of its own grams, and with overlap >= W+K-2 every
    * whole-doc window lies fully inside some chunk, so the union of
    * per-chunk selections over complete windows IS the whole-doc winnow
    * set. Cross-chunk duplicate emissions (a boundary position selected
    * by windows on both sides) can only involve CONSECUTIVE chunks (the
    * windows selecting one position span < 2W+K chars << stride), so a
    * tiny carry set — the previous chunk's emissions at or past the
    * current chunk's start, <= ~2W entries — suppresses them and the
    * output is the exact per-position set union, matching the oracle's
    * chunked-CTE DISTINCT. Only ONE chunk's code-point array is live at
    * a time (the overlap is carried by arraycopy), so memory stays
    * O(MaxDocLen) per doc regardless of doc length — chunking INSIDE
    * the expression keeps the query plan's one-generate shape (no
    * chunk-explode, no post-hoc dedup aggregate; a plan-level union of
    * length-split branches measured 2-3x on q106 via double corpus
    * scans, and a chunk-starts explode + dedup aggregate cost ~70% on
    * the same query).
    */
  def compute(s: UTF8String): ArrayData = {
    val str = s.toString
    val cu = str.length
    val out = new ArrayBuffer[Any]()
    // fast path: whole doc fits one winnow pass (n <= MaxDocLen implies
    // cu could still exceed it only via surrogate pairs — counted below)
    val maxLen = MaxDocLen.toInt
    // code points, matching Spark/DuckDB ascii()+substr character
    // semantics (length() counts code points on both engines); filled
    // chunk by chunk — one chunk array live at a time
    val cap = math.min(cu, maxLen)
    val codes = new Array[Int](cap)
    var ci = 0 // UTF-16 cursor into str
    var n = 0 // code points in the current chunk
    var base = 0L // global 0-based code-point offset of codes(0)
    // fill the first chunk
    while (ci < cu && n < cap) {
      val cp = str.codePointAt(ci)
      codes(n) = cp
      n += 1
      ci += Character.charCount(cp)
    }
    if (n < K + W - 1) return Empty
    var carry = new ArrayBuffer[Long]() // emissions >= next chunk start
    var done = false
    while (!done) {
      val nextBase = base + ChunkStride
      // winnow codes[0, n): chunk-local positions 1..n-(K-1)
      val np = n - (K - 1)
      val dqPos = new Array[Int](4 * W)
      val dqKey = new Array[Long](4 * W)
      var head = 0
      var tail = 0 // exclusive
      var lastEmitted = Long.MinValue
      val nextCarry = new ArrayBuffer[Long]()
      // first gram hash by Horner, then one rolling update per position
      var h1 = 0L
      var j = 0
      while (j < K) { h1 = (h1 * B1 + codes(j)) % M1; j += 1 }
      var p = 1
      while (p <= np) {
        val wk = h1 * PosMod + (PosMod - 1L - p)
        // monotonic deque push: drop dominated (larger-key) candidates
        while (tail > head && dqKey(tail - 1) >= wk) tail -= 1
        // live entries peak at W+1 (the push lands before this
        // position's expiry runs); the arrays are sized 4W so this
        // front-compaction fires at most once per ~3W pushes
        if (tail == dqPos.length) {
          System.arraycopy(dqPos, head, dqPos, 0, tail - head)
          System.arraycopy(dqKey, head, dqKey, 0, tail - head)
          tail -= head; head = 0
        }
        dqPos(tail) = p; dqKey(tail) = wk; tail += 1
        // window [p-W+1, p] is complete once p >= W; expire the front
        if (p >= W) {
          while (dqPos(head) < p - W + 1) head += 1
          val sel = dqKey(head)
          if (sel != lastEmitted) {
            lastEmitted = sel
            val selPos = (PosMod - 1L - (sel % PosMod)).toInt
            val gPos = base + selPos
            // suppress an emission the PREVIOUS chunk already made for
            // this global position (same position => same gram => same
            // hash); the carry set is <= ~2W entries
            var dup = false
            var s0 = 0
            while (!dup && s0 < carry.length) {
              if (carry(s0) == gPos) dup = true
              s0 += 1
            }
            if (!dup) {
              var h2 = 0L
              var t = selPos - 1
              val end = selPos - 1 + K
              while (t < end) { h2 = (h2 * B2 + codes(t)) % M2; t += 1 }
              out += new GenericInternalRow(
                Array[Any](gPos, (sel / PosMod) * 1073741824L + h2))
              // carry emissions the NEXT chunk's windows can also select
              // (its positions start at nextBase + 1); a carry entry can
              // never reach the chunk after next — stride >> W
              if (gPos > nextBase) nextCarry += gPos
            }
          }
        }
        // roll: remove codes(p-1), append codes(p+K-1)
        if (p < np) {
          h1 = ((h1 - codes(p - 1) * BK1 % M1 + M1) * B1 + codes(p + K - 1)) % M1
        }
        p += 1
      }
      if (ci >= cu) done = true
      else {
        // slide: keep the last ChunkOverlap code points, refill the rest
        System.arraycopy(codes, n - ChunkOverlap, codes, 0, ChunkOverlap)
        base = base + (n - ChunkOverlap)
        n = ChunkOverlap
        while (ci < cu && n < cap) {
          val cp = str.codePointAt(ci)
          codes(n) = cp
          n += 1
          ci += Character.charCount(cp)
        }
        carry = nextCarry
      }
    }
    new GenericArrayData(out.toArray)
  }
}
