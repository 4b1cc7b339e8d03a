package graft.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Mergeable frequency/cardinality sketches as custom
  * [[TypedImperativeAggregate]]s — the fixed-memory aggregation story for
  * corpus statistics at 100 TB.
  *
  * Exact `groupBy(term).count()` over a 100 TB token stream shuffles the
  * full vocabulary; exact `count(DISTINCT …)` re-shuffles every distinct
  * value. Both sketches here replace that with a SINGLE map-side pass whose
  * partial state is a small fixed-size array per (group × partition): the
  * shuffle carries `depth·width` longs (Count-Min) or `m` bytes-worth of
  * registers (register sketch) no matter how many rows went in, and
  * partials merge by elementwise add / max — associative + commutative, so
  * Spark's partial-aggregation pushdown applies unchanged.
  *
  * Both consume a PRE-HASHED non-negative long column rather than hashing
  * internally: the caller picks the hash (xxhash64 in production, the
  * SQL-mirrorable arithmetic family in the oracle twins), which is what
  * makes every downstream stage of d28/d29 DuckDB-derivable — the same
  * twin idiom as d05b/d06b. Negative hashes throw (the position/register
  * arithmetic mirrors SQL `%`, whose sign-of-dividend semantics would
  * silently scatter negative keys), nulls are skipped like every SQL
  * aggregate.
  */
object SketchAggs {
  /** Modulus of the affine position family — the same Mersenne prime as the
    * minhash mirror family (PipelineQueries.MirrorHashMod), shared so the
    * d28 oracle SQL and this implementation cannot drift independently.
    */
  val CmsPrime = 2147483647L

  /** Count-Min position of hash `h` in row `d`: an affine family over the
    * prime field, reduced to the row width. `h` is reduced mod the prime
    * FIRST so the multiply never overflows a long for any non-negative
    * input (hp < 2^31, 2d+3 small).
    */
  def cmsPos(h: Long, d: Int, width: Int): Int = {
    val hp = h % CmsPrime
    (((2L * d + 3L) * hp + (5L * d + 7L)) % CmsPrime % width).toInt
  }

  /** Register index + rank of hash `h` for an `m`-register sketch
    * (m a power of two): register = h mod m, rank = trailing zeros of
    * h/m plus one, capped at [[MaxRank]]. The cap keeps the harmonic-sum
    * term `2^(MaxRank - rank)` inside a signed long even for the EMPTY
    * register's rank 0 (term 2^62), so the estimator's denominator can be
    * summed EXACTLY in DECIMAL(38,0) — which is what lets DuckDB reproduce
    * the estimate bit-for-bit instead of chasing FP summation order.
    */
  val MaxRank = 62
  def hllRank(h: Long, m: Int): Int = {
    val w = h / m
    math.min(java.lang.Long.numberOfTrailingZeros(w) + 1, MaxRank)
  }

  /** HLL alpha constant (Flajolet et al. 2007) for m ≥ 64. */
  def hllAlpha(m: Int): Double = 0.7213 / (1.0 + 1.079 / m)

  /** The estimator's constant numerator alpha·m²·2^MaxRank; the d29 oracle
    * interpolates exactly this value, so the two engines divide the same
    * numerator by the same exactly-summed denominator.
    */
  def hllNumerator(m: Int): Double = hllAlpha(m) * m * m * math.pow(2.0, MaxRank)

  /** Column factory: `cms_sketch(h, depth, width)` → flattened row-major
    * depth×width counter array.
    */
  def cmsSketch(hash: Column, depth: Int, width: Int): Column =
    ColumnBridge.column(
      CountMinAgg(ColumnBridge.expression(hash),
        org.apache.spark.sql.catalyst.expressions.Literal(depth, IntegerType),
        org.apache.spark.sql.catalyst.expressions.Literal(width, IntegerType))
        .toAggregateExpression())

  /** Column factory: `hist_sketch(value, lo, hi, bins)` → `bins + 2` long
    * counters: index 0 = underflow (v < lo), 1..bins = equi-width bins over
    * [lo, hi), bins+1 = overflow (v ≥ hi). Additive like Count-Min, so
    * stored histogram rows re-aggregate through [[cmsMerge]] unchanged —
    * the quantile member of the sketch family (frequency = cms, distinct =
    * registers, membership = bloom).
    */
  def histSketch(value: Column, lo: Double, hi: Double, bins: Int): Column =
    ColumnBridge.column(
      HistogramAgg(ColumnBridge.expression(value),
        org.apache.spark.sql.catalyst.expressions.Literal(lo, DoubleType),
        org.apache.spark.sql.catalyst.expressions.Literal(hi, DoubleType),
        org.apache.spark.sql.catalyst.expressions.Literal(bins, IntegerType))
        .toAggregateExpression())

  /** In-range mass of a histogram array (excludes under/overflow). */
  def histTotal(hist: Column, bins: Int): Column =
    (1 to bins).map(b => org.apache.spark.sql.functions.element_at(hist, b + 1))
      .reduce(_ + _)

  /** Interpolated quantile from a histogram array — pure Column arithmetic
    * (no UDF), mirrored term-for-term by the d32 oracle SQL.
    *
    * Definition (over IN-RANGE mass only; under/overflow are reported
    * separately, never folded into a bin): with N = in-range count and
    * rank r = ceil(q·N), find the first bin b whose cumulative count
    * reaches r, then linearly interpolate within it:
    * `lo + binw·(b−1 + (r − cum_{b−1}) / h_b)`. Every term is integer
    * counts and one IEEE division/multiply, so DuckDB replays it
    * bit-for-bit. NULL when the histogram is empty. Expression size grows
    * O(bins²) from the unrolled cumulative chain — fine at the ≤64 bins a
    * quantile summary wants; shard the domain beyond that.
    */
  def histQuantile(hist: Column, q: Double, lo: Double, hi: Double,
                   bins: Int): Column = {
    require(q > 0.0 && q <= 1.0, s"quantile q must be in (0, 1], got $q")
    import org.apache.spark.sql.functions.{ceil => sceil, coalesce, element_at, lit, when}
    val h = (1 to bins).map(b => element_at(hist, b + 1))
    val total = h.reduce(_ + _)
    val r = sceil(lit(q) * total.cast("double")).cast("long")
    val binw = (hi - lo) / bins
    var cumPrev: Column = lit(0L)
    val arms = (1 to bins).map { b =>
      val before = cumPrev
      val cum = before + h(b - 1)
      cumPrev = cum
      when(cum >= r && h(b - 1) > 0,
        lit(lo) + lit(binw) * (lit((b - 1).toDouble) +
          (r - before).cast("double") / h(b - 1).cast("double")))
    }
    when(total > 0, coalesce(arms: _*))
  }

  /** Distribution drift between two histogram arrays (same lo/hi/bins
    * model) — the monitoring op a rolling corpus needs: "did today's crawl
    * shift the length/quality distribution?" answered from two stored
    * sketch rows, never the raw data.
    *
    * Total-variation distance over the IN-RANGE bins,
    * TV = ½·Σ|h0ᵢ/N0 − h1ᵢ/N1|, computed with an EXACT integer core:
    * |h0ᵢ/N0 − h1ᵢ/N1| = |h0ᵢ·N1 − h1ᵢ·N0| / (N0·N1), so the sum runs in
    * decimal (order-independent — SQL `SUM` needs no ordering guarantee)
    * and ONE double division at the end produces tv. `drift_bin` is the
    * 1-based bin with the largest absolute cross-multiplied diff, ties to
    * the LOWEST bin (array_position-of-max = SQL first-of-max). NULL when
    * either side has no in-range mass. Under/overflow counters are
    * deliberately outside the distance — report them separately.
    *
    * Returns struct(tv double, drift_bin int, n0 long, n1 long,
    * l1_num decimal(38,0)).
    */
  def histDrift(h0: Column, h1: Column, bins: Int): Column = {
    import org.apache.spark.sql.functions.{abs => sabs, array, array_max, array_position, element_at, lit, struct, when}
    val n0 = histTotal(h0, bins)
    val n1 = histTotal(h1, bins)
    val absDiffs = (1 to bins).map { b =>
      sabs(element_at(h0, b + 1).cast("decimal(38,0)") * n1 -
        element_at(h1, b + 1).cast("decimal(38,0)") * n0)
    }
    val l1 = absDiffs.reduce(_ + _).cast("decimal(38,0)")
    val tv = lit(0.5) * (l1.cast("double") / (n0.cast("double") * n1.cast("double")))
    val diffArr = array(absDiffs: _*)
    val driftBin = array_position(diffArr, array_max(diffArr)).cast("int")
    when(n0 > 0 && n1 > 0,
      struct(tv.as("tv"), driftBin.as("drift_bin"),
        n0.as("n0"), n1.as("n1"), l1.as("l1_num")))
  }

  /** Column factory: `register_sketch(h, m)` → m max-rank registers. */
  def registerSketch(hash: Column, m: Int): Column =
    ColumnBridge.column(
      RegisterSketchAgg(ColumnBridge.expression(hash),
        org.apache.spark.sql.catalyst.expressions.Literal(m, IntegerType))
        .toAggregateExpression())

  /** Column factory: `cms_merge(cms_array)` — elementwise-add re-aggregation
    * of STORED Count-Min arrays (the datacube pattern: persist per-day /
    * per-shard sketches, re-aggregate to any rollup without the raw rows).
    */
  def cmsMerge(sketches: Column): Column =
    ColumnBridge.column(
      CmsMergeAgg(ColumnBridge.expression(sketches)).toAggregateExpression())

  /** Column factory: `register_merge(regs_array)` — elementwise-max
    * re-aggregation of stored register sketches.
    */
  def registerMerge(sketches: Column): Column =
    ColumnBridge.column(
      RegisterMergeAgg(ColumnBridge.expression(sketches)).toAggregateExpression())

  /** Point estimate for hash `h` from a built Count-Min array: min over
    * rows of the counter at that row's position — pure Column arithmetic
    * (no UDF), so probing N candidate keys against a broadcast sketch
    * stays inside codegen.
    */
  def cmsEstimate(cms: Column, hashCol: Column, depth: Int, width: Int): Column = {
    import org.apache.spark.sql.functions._
    val hp = hashCol % lit(CmsPrime)
    val ests = (0 until depth).map { d =>
      val pos = ((lit(2L * d + 3L) * hp + lit(5L * d + 7L)) % lit(CmsPrime)) % lit(width)
      element_at(cms, (lit(d * width) + pos + 1).cast("int"))
    }
    if (depth == 1) ests.head else least(ests: _*)
  }
}

/** `cms_sketch(hash, depth, width)` — Count-Min sketch (Cormode &
  * Muthukrishnan 2005) over a pre-hashed long column. Buffer is one
  * `depth·width` long array; update bumps one counter per row per sketch
  * row, merge is elementwise add, eval returns the flattened counters
  * (row-major) for relational probing via [[SketchAggs.cmsEstimate]].
  * Estimates never undercount: est(k) ≥ true(k), with overshoot bounded by
  * collisions per row (≤ N/width in expectation per row, min over rows).
  */
case class CountMinAgg(child: Expression, depthExpr: Expression,
    widthExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private lazy val depth: Int = depthExpr.eval(null).asInstanceOf[Int]
  private lazy val width: Int = widthExpr.eval(null).asInstanceOf[Int]

  override def children: Seq[Expression] = Seq(child, depthExpr, widthExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType && child.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"cms_sketch requires an int/long hash column, got ${child.dataType}")
    else if (!Seq(depthExpr, widthExpr).forall(e =>
        e.dataType == IntegerType && e.foldable && e.eval(null) != null))
      TypeCheckResult.TypeCheckFailure(
        "cms_sketch depth/width must be non-null int literals")
    else {
      val d = depthExpr.eval(null).asInstanceOf[Int]
      val w = widthExpr.eval(null).asInstanceOf[Int]
      if (d <= 0 || w <= 0)
        TypeCheckResult.TypeCheckFailure(s"cms_sketch depth/width must be positive, got $d x $w")
      else if (d.toLong * w > (1 << 22))
        // 4M counters = 32 MB per buffer; beyond that the "small fixed
        // state" premise is gone and the caller should shard the domain
        TypeCheckResult.TypeCheckFailure(s"cms_sketch state $d x $w exceeds 2^22 counters")
      else TypeCheckResult.TypeCheckSuccess
    }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v match {
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
      }
      if (h < 0)
        throw new IllegalArgumentException(s"cms_sketch: negative hash $h (contract: h >= 0)")
      var d = 0
      while (d < depth) {
        buffer(d * width + SketchAggs.cmsPos(h, d, width)) += 1L
        d += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren(0), depthExpr = newChildren(1), widthExpr = newChildren(2))

  override def prettyName: String = "cms_sketch"
}

/** `cms_merge(cms)` — re-aggregates STORED Count-Min arrays by elementwise
  * add. This is what makes the sketches a LAYOUT primitive, not just an
  * aggregate: persist per-(day, shard) sketch rows once, then answer any
  * coarser rollup (per-day → per-month → global) by merging a handful of
  * small arrays instead of re-scanning the raw stream. Counts are additive,
  * so merged(daily sketches) ≡ sketch(all rows) exactly — d30 pins that
  * identity against both the direct aggregate and DuckDB.
  *
  * Contract: all input arrays in a group must have the same length (same
  * depth×width model) — mismatches throw rather than silently mis-add;
  * null rows are skipped; an empty group yields an empty array.
  */
case class CmsMergeAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cms_merge requires array<bigint> sketches, got $t")
  }

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
      addInto(buffer, arr)
    }
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] =
    addInto(buffer, other)

  private def addInto(buffer: Array[Long], other: Array[Long]): Array[Long] =
    if (other.isEmpty) buffer
    else if (buffer.isEmpty) other.clone()
    else {
      if (buffer.length != other.length)
        throw new IllegalArgumentException(
          s"cms_merge: sketch length mismatch ${buffer.length} vs ${other.length}")
      var i = 0
      while (i < buffer.length) { buffer(i) += other(i); i += 1 }
      buffer
    }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsMergeAgg =
    copy(child = newChildren(0))

  override def prettyName: String = "cms_merge"
}

/** `register_merge(regs)` — re-aggregates stored register sketches by
  * elementwise max (rank maxima commute with grouping, so merged(daily)
  * ≡ direct(all rows) exactly — the cardinality half of the d30 identity).
  * Same contracts as [[CmsMergeAgg]].
  */
case class RegisterMergeAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"register_merge requires array<int> sketches, got $t")
  }

  override def createAggregationBuffer(): Array[Int] = Array.emptyIntArray

  override def update(buffer: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v == null) buffer
    else maxInto(buffer,
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toIntArray())
  }

  override def merge(buffer: Array[Int], other: Array[Int]): Array[Int] =
    maxInto(buffer, other)

  private def maxInto(buffer: Array[Int], other: Array[Int]): Array[Int] =
    if (other.isEmpty) buffer
    else if (buffer.isEmpty) other.clone()
    else {
      if (buffer.length != other.length)
        throw new IllegalArgumentException(
          s"register_merge: sketch length mismatch ${buffer.length} vs ${other.length}")
      var i = 0
      while (i < buffer.length) {
        if (other(i) > buffer(i)) buffer(i) = other(i)
        i += 1
      }
      buffer
    }

  override def eval(buffer: Array[Int]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 4)
    buffer.foreach(bb.putInt)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 4)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): RegisterMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): RegisterMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): RegisterMergeAgg =
    copy(child = newChildren(0))

  override def prettyName: String = "register_merge"
}

/** `hist_sketch(value, lo, hi, bins)` — mergeable equi-width histogram over
  * a numeric column: `bins + 2` long counters (underflow | bins over
  * [lo, hi) | overflow), elementwise-add merge. The distributional member
  * of the sketch family: one map-side pass, fixed `bins + 2`-long state per
  * (group × partition) regardless of row count, re-aggregates through
  * [[CmsMergeAgg]] like any additive counter array (the d30/d32 datacube
  * pattern), and answers quantiles via [[SketchAggs.histQuantile]] with
  * error ≤ one bin width — the honest trade a 100 TB percentile wants
  * instead of an exact full sort.
  *
  * Bucketing: v < lo → underflow; v ≥ hi → overflow; else
  * `1 + floor((v−lo)/(hi−lo)·bins)` clamped to bins (FP edge when v sits
  * just under hi). Exactly this formula — same association order — is what
  * the d32 oracle SQL replays. Nulls are skipped like every SQL aggregate;
  * NaN is skipped too (it belongs to no bucket) and documented as such.
  */
case class HistogramAgg(child: Expression, loExpr: Expression,
    hiExpr: Expression, binsExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private lazy val lo: Double = loExpr.eval(null).asInstanceOf[Double]
  private lazy val hi: Double = hiExpr.eval(null).asInstanceOf[Double]
  private lazy val bins: Int = binsExpr.eval(null).asInstanceOf[Int]

  override def children: Seq[Expression] = Seq(child, loExpr, hiExpr, binsExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (!Seq(DoubleType, FloatType, LongType, IntegerType).contains(child.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"hist_sketch requires a numeric (int/long/float/double) column, got ${child.dataType}")
    else if (!Seq(loExpr, hiExpr).forall(e =>
        e.dataType == DoubleType && e.foldable && e.eval(null) != null) ||
      !(binsExpr.dataType == IntegerType && binsExpr.foldable && binsExpr.eval(null) != null))
      TypeCheckResult.TypeCheckFailure(
        "hist_sketch lo/hi must be non-null double literals and bins a non-null int literal")
    else {
      val (l, h, b) = (loExpr.eval(null).asInstanceOf[Double],
        hiExpr.eval(null).asInstanceOf[Double],
        binsExpr.eval(null).asInstanceOf[Int])
      if (!(l < h)) TypeCheckResult.TypeCheckFailure(s"hist_sketch needs lo < hi, got [$l, $h)")
      else if (b <= 0 || b > (1 << 22))
        TypeCheckResult.TypeCheckFailure(s"hist_sketch bins must be in [1, 2^22], got $b")
      else TypeCheckResult.TypeCheckSuccess
    }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bins + 2)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val raw = child.eval(input)
    if (raw != null) {
      val v = raw match {
        case d: java.lang.Double => d.doubleValue()
        case f: java.lang.Float => f.doubleValue()
        case l: java.lang.Long => l.doubleValue()
        case i: java.lang.Integer => i.doubleValue()
      }
      if (!v.isNaN) {
        val idx =
          if (v < lo) 0
          else if (v >= hi) bins + 1
          else math.min(bins, 1 + math.floor((v - lo) / (hi - lo) * bins).toInt)
        buffer(idx) += 1L
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HistogramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistogramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HistogramAgg =
    copy(child = newChildren(0), loExpr = newChildren(1),
      hiExpr = newChildren(2), binsExpr = newChildren(3))

  override def prettyName: String = "hist_sketch"
}

/** `register_sketch(hash, m)` — HyperLogLog-style max-rank register sketch
  * (Flajolet et al. 2007) over a pre-hashed long column. Buffer is m
  * byte-sized registers (rank ≤ 62 fits a byte); update takes max of the
  * incoming rank, merge is elementwise max, eval returns the registers as
  * an int array. The RAW harmonic estimator (no small/large-range
  * corrections — documented contract; callers needing the corrected bands
  * apply them on the returned registers) is derived relationally from the
  * output so both engines of the d29 twin sum the exact same
  * DECIMAL(38,0) denominator.
  */
case class RegisterSketchAgg(child: Expression, mExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  private lazy val m: Int = mExpr.eval(null).asInstanceOf[Int]

  override def children: Seq[Expression] = Seq(child, mExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType && child.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"register_sketch requires an int/long hash column, got ${child.dataType}")
    else if (mExpr.dataType != IntegerType || !mExpr.foldable || mExpr.eval(null) == null)
      TypeCheckResult.TypeCheckFailure("register_sketch m must be a non-null int literal")
    else {
      val mv = mExpr.eval(null).asInstanceOf[Int]
      if (mv < 16 || mv > (1 << 20) || java.lang.Integer.bitCount(mv) != 1)
        TypeCheckResult.TypeCheckFailure(
          s"register_sketch m must be a power of two in [16, 2^20], got $mv")
      else TypeCheckResult.TypeCheckSuccess
    }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v match {
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
      }
      if (h < 0)
        throw new IllegalArgumentException(s"register_sketch: negative hash $h (contract: h >= 0)")
      val reg = (h % m).toInt
      val rank = SketchAggs.hllRank(h, m)
      if (rank > buffer(reg)) buffer(reg) = rank.toByte
    }
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < buffer.length) {
      if (other(i) > buffer(i)) buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Byte]): Any =
    new GenericArrayData(buffer.map(_.toInt))

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer.clone()
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(newOffset: Int): RegisterSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): RegisterSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): RegisterSketchAgg =
    copy(child = newChildren(0), mExpr = newChildren(1))

  override def prettyName: String = "register_sketch"
}
