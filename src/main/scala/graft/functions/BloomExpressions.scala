package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Self-contained blocked-free bloom filter over LONG keys.
  *
  * Build side: `BloomSketch.build` OR-merges fixed-size `long[]` bit
  * arrays with `treeAggregate`, so the filter is constructed
  * distributed (executors each set bits for their partition's keys;
  * the driver only merges ~kilobytes of bitmaps). Probe side:
  * [[BloomMightContainExpr]] carries the finished bitmap as ONE
  * referenced constant (`ctx.addReferenceObj`) — the same discipline
  * as MatVecLitExpr/NearestCentroidExpr: a single expression node,
  * codegen is a tight k-hash loop, no per-term literal trees.
  *
  * Double hashing g_i = h1 + i·h2 (Kirsch–Mitzenmacher) over two
  * independent splitmix64 finalizations of the key. False positives
  * pass the filter and are removed by the exact join that follows, so
  * the composed operator is semantically invisible — which is what
  * lets the oracle be the PLAIN join.
  */
object BloomSketch {

  /** splitmix64 finalizer — a full-avalanche 64-bit mix. */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Bits for ~1% fpp at k = 7 hashes (9.585 bits/key), rounded up to
    * whole words; floor of 64 words keeps tiny build sides sane.
    */
  def sizeWords(nKeys: Long): Int = {
    val bits = math.max(64L * 64L, math.ceil(nKeys * 9.585).toLong)
    (((bits + 63) / 64)).toInt
  }

  val NumHashes = 7

  @inline def setBit(bits: Array[Long], key: Long): Unit = {
    val m = bits.length.toLong * 64L
    val h1 = mix64(key); val h2 = mix64(key ^ 0x5851f42d4c957f2dL) | 1L
    var i = 0
    while (i < NumHashes) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, m)
      bits((pos >>> 6).toInt) |= (1L << (pos & 63L))
      i += 1
    }
  }

  @inline def mightContain(bits: Array[Long], key: Long): Boolean = {
    val m = bits.length.toLong * 64L
    val h1 = mix64(key); val h2 = mix64(key ^ 0x5851f42d4c957f2dL) | 1L
    var i = 0
    while (i < NumHashes) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, m)
      if ((bits((pos >>> 6).toInt) & (1L << (pos & 63L))) == 0L) return false
      i += 1
    }
    true
  }

  /** Distributed build: one pass over the key column, fixed-size
    * bitmap per partition, OR-merge up a tree. `nKeys` sizes the
    * bitmap (caller supplies an exact or estimated build-side count).
    */
  def build(keys: org.apache.spark.sql.Dataset[java.lang.Long], nKeys: Long): Array[Long] = {
    val words = sizeWords(nKeys)
    keys.rdd.treeAggregate(new Array[Long](words))(
      (acc, k) => { if (k != null) setBit(acc, k); acc },
      (a, b) => { var i = 0; while (i < a.length) { a(i) |= b(i); i += 1 }; a })
  }
}

/** `might_contain(bitmap, key)` with the bitmap as a referenced
  * constant. Returns false for keys definitely absent from the build
  * side; true may include ~1% false positives by construction.
  */
case class BloomMightContainExpr(bits: Array[Long], child: Expression)
  extends UnaryExpression {
  override def prettyName: String = "bloom_might_contain"
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an integral key, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val key = input match {
      case l: java.lang.Long    => l.longValue()
      case i: java.lang.Integer => i.longValue()
    }
    BloomSketch.mightContain(bits, key)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.addReferenceObj("bloomBits", bits, "long[]")
      val key = ctx.freshName("key"); val m = ctx.freshName("m")
      val h1 = ctx.freshName("h1"); val h2 = ctx.freshName("h2")
      val i = ctx.freshName("i"); val pos = ctx.freshName("pos")
      val hit = ctx.freshName("hit")
      val mixer = classOf[BloomSketch.type].getName.stripSuffix("$") + "$.MODULE$"
      s"""
      |long $key = (long) $c;
      |long $m = (long) $b.length * 64L;
      |long $h1 = $mixer.mix64($key);
      |long $h2 = $mixer.mix64($key ^ 0x5851f42d4c957f2dL) | 1L;
      |boolean $hit = true;
      |for (int $i = 0; $i < ${BloomSketch.NumHashes}; $i++) {
      |  long $pos = java.lang.Long.remainderUnsigned($h1 + (long) $i * $h2, $m);
      |  if (($b[(int) ($pos >>> 6)] & (1L << ($pos & 63L))) == 0L) { $hit = false; break; }
      |}
      |${ev.value} = $hit;
      |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
