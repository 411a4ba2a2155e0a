package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Codegen'd Bloom-filter membership probe over a driver-built bit set.
  *
  * This is the probe half of the semi-join-reduction pattern Spark itself
  * applies with `InjectRuntimeFilter`/`BloomFilterMightContain` — those are
  * internal and only fire under the optimizer's own heuristics, so the
  * engine exposes the pattern as an explicit operator
  * (`operators.BloomJoin`): at 100 TB a dim side with 100M keys is far too
  * big to broadcast as a hash table (~GBs) but fits a Bloom filter in tens
  * of MBs, and pre-filtering the fact side before its shuffle is the
  * difference between shuffling 100 TB and shuffling the ~hit fraction.
  *
  * Hashing contract (shared with the DataFrame-side builder, which uses
  * plain `xxhash64` so the BUILD stays fully distributed and codegen'd):
  *   h1 = xxhash64(key)            == XXH64.hashLong(key, 42)
  *   h2 = xxhash64(key, 1L)        == XXH64.hashLong(1, h1)
  *   pos_i = floorMod(floorMod(h1, m) + i * floorMod(h2, m), m), i < k
  * The nested-mod form keeps every intermediate below (k+1)*m, so the SQL
  * build side computes identical positions under ANSI mode (no Long
  * overflow) and the probe matches it bit for bit.
  *
  * `words`/`k` are constructor parameters, NOT child expressions: a
  * 2^20-bit filter as an array literal would bloat every plan dump and
  * break codegen splitting; as a parameter it ships to executors inside
  * the serialized expression and enters generated code via a reference
  * object. Null semantics: null key => null (UnaryExpression default) —
  * same as the exact semi-join it fronts, which never matches null keys.
  */
case class BloomMightContain(child: Expression, words: Array[Long], k: Int)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  private def requireLong(): Unit = child.dataType match {
    case LongType => ()
    case other => throw new IllegalArgumentException(
      s"graft_bloom_might_contain expects a bigint key (cast first), got ${other.simpleString(10)}")
  }

  override def nullSafeEval(input: Any): Any = {
    requireLong()
    BloomUtil.mightContain(words, k, input.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    requireLong()
    val ref = ctx.addReferenceObj("bloomWords", words, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.BloomUtil.mightContain($ref, $k, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

/** Static helper shared by interpreted eval, generated code, and specs. */
object BloomUtil {

  /** Double-hashed k-probe membership test; `words` is the m-bit set as
    * little-endian 64-bit words (bit pos => word pos>>6, bit pos&63).
    */
  def mightContain(words: Array[Long], k: Int, v: Long): Boolean = {
    val m = words.length.toLong * 64L
    val h1 = XXH64.hashLong(v, 42L)
    val am = java.lang.Math.floorMod(h1, m)
    val bm = java.lang.Math.floorMod(XXH64.hashLong(1L, h1), m)
    var i = 0
    while (i < k) {
      val pos = java.lang.Math.floorMod(am + i.toLong * bm, m)
      if ((words((pos >>> 6).toInt) & (1L << (pos & 63L).toInt)) == 0L) return false
      i += 1
    }
    true
  }
}
