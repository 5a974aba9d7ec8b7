package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Minimal blocked bloom filter over 64-bit keys (the crawler's url_hash).
  * Double hashing: probe_i = h1 + i*h2 over `numBits` bits. Deterministic,
  * mergeable (bitwise OR of same-shape filters).
  *
  * Replaces the reference's in-memory `MutableSet<URL>` membership test
  * (reference: SpiderMain.kt:51-58) as the cheap PRE-filter of the crawler's
  * seen-set; the exact `left_anti` join against the seen table remains the
  * source of truth, so the false-positive rate affects only how much work
  * reaches the exact join — never correctness (north_rule: exact-match seen
  * set).
  */
final class Bloom(val numWords: Int, val numHashes: Int) extends Serializable {
  require(numWords > 0 && numWords <= Bloom.MaxWords,
    s"bloom numWords=$numWords outside (0, ${Bloom.MaxWords}] — see Bloom.shapeFor")
  require(numHashes > 0, s"bloom numHashes=$numHashes must be positive")
  val words: Array[Long] = new Array[Long](numWords)
  @inline private def numBits: Long = numWords.toLong * 64L

  // 64-bit finalizer (splitmix64) to derive the second hash stream
  @inline private def remix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def put(h: Long): Unit = {
    val h2 = remix(h)
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Long.remainderUnsigned(h + i.toLong * h2, numBits)
      words((bit >>> 6).toInt) |= 1L << (bit & 63L)
      i += 1
    }
  }

  def mightContain(h: Long): Boolean = {
    val h2 = remix(h)
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Long.remainderUnsigned(h + i.toLong * h2, numBits)
      if ((words((bit >>> 6).toInt) & (1L << (bit & 63L))) == 0L) return false
      i += 1
    }
    true
  }

  def mergeInPlace(other: Bloom): Bloom = {
    require(other.numWords == numWords && other.numHashes == numHashes,
      s"bloom shape mismatch: ($numWords,$numHashes) vs (${other.numWords},${other.numHashes})")
    var i = 0
    while (i < numWords) { words(i) |= other.words(i); i += 1 }
    this
  }

  def serialize(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + numWords * 8)
    bb.putInt(numHashes).putInt(numWords)
    var i = 0
    while (i < numWords) { bb.putLong(words(i)); i += 1 }
    bb.array()
  }
}

object Bloom {
  /** Largest filter one serialized binary buffer can carry:
    * 8 + MaxWords*8 must stay within Int.MaxValue (ByteBuffer/Array
    * limits). 268M words = 2 GiB of bits ≈ 1.7e10 bits — at fpp 0.03
    * that sizes ~2.3e9 expected items. Beyond that a single monolithic
    * filter is the wrong structure anyway (the aggregate would ship 2 GiB
    * partials through the driver): raise fpp, lower expectedItems, or
    * shard the filter by key range. shapeFor REJECTS shapes past this
    * bound instead of silently overflowing Int (the old `.toInt` on the
    * word count saturated, and `numWords * 8` in serialize() went
    * negative — both at exactly the 10^10-item scale the cap documents). */
  val MaxWords: Int = (Int.MaxValue - 8) / 8

  def deserialize(bytes: Array[Byte]): Bloom = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val numHashes = bb.getInt
    val numWords = bb.getInt
    val b = new Bloom(numWords, numHashes)
    var i = 0
    while (i < numWords) { b.words(i) = bb.getLong; i += 1 }
    b
  }

  /** Shape for an expected item count at a target false-positive rate
    * (standard bloom sizing: m = -n ln p / (ln 2)^2, k = m/n ln 2). */
  def shapeFor(expectedItems: Long, fpp: Double): (Int, Int) = {
    val n = math.max(expectedItems, 1L).toDouble
    val m = math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2)))
    val wordsL = math.max(1L, math.ceil(m / 64.0).toLong)
    require(wordsL <= MaxWords,
      s"bloom for $expectedItems items at fpp=$fpp needs $wordsL words (> " +
        s"$MaxWords max) — raise fpp, lower expectedItems, or shard the filter")
    val k = math.max(1, math.round(m / n * math.log(2)).toInt)
    (wordsL.toInt, k)
  }
}

/** Membership probe against a broadcast Bloom — the crawler's cheap
  * pre-filter before the exact seen-set anti-join. The broadcast is
  * deserialized once per executor; the probe itself is a handful of bit
  * reads. CodegenFallback is deliberate: this sits at a filter branch
  * point, not inside a tight arithmetic loop, and the broadcast handle
  * can't cross into generated Java source. */
case class BloomProbeExpr(
    child: Expression,
    bloom: org.apache.spark.broadcast.Broadcast[Bloom])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "bloom_might_contain"
  override protected def nullSafeEval(v: Any): Any =
    bloom.value.mightContain(v.asInstanceOf[Long])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `bloom_agg(hash)` — TypedImperativeAggregate building a Bloom over a
  * LONG hash column; partial aggregation merges per-partition (executor)
  * shards, the final merge happens on the reduce side (the treeAggregate
  * shape of north_star). Emits the serialized filter as BINARY. */
case class BloomAggExpr(
    child: Expression,
    numWords: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Bloom] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Bloom = new Bloom(numWords, numHashes)

  override def update(buffer: Bloom, input: InternalRow): Bloom = {
    val v = child.eval(input)
    if (v != null) buffer.put(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Bloom, input: Bloom): Bloom = buffer.mergeInPlace(input)

  override def eval(buffer: Bloom): Any = buffer.serialize()

  override def serialize(buffer: Bloom): Array[Byte] = buffer.serialize()

  override def deserialize(storageFormat: Array[Byte]): Bloom = Bloom.deserialize(storageFormat)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAggExpr =
    copy(child = newChild)
}
