package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native form of the engine's portable 60-bit hash.
  *
  * The composed form — `conv(substring(md5(x), 1, 15), 16, 10)` — is
  * semantically right but materializes a 32-char hex string, substrings it,
  * and re-parses it digit-by-digit for every value; on hot paths (q23
  * hashes every (doc, token) pair, q42/q48 every id, q16b every key) that
  * is three string allocations per row for 60 bits of output. This
  * expression computes the same number directly from the digest bytes: the
  * first 15 hex digits of an md5 are exactly the top 60 bits of its first
  * 8 bytes read big-endian, i.e. `(bytes[0..7] as u64) >>> 4`.
  *
  * Bit-equality with the composed form (and therefore with the DuckDB twin
  * `CAST('0x' || substr(md5(x),1,15) AS BIGINT)`) is pinned by
  * PHash60Spec over ASCII, unicode, and empty inputs.
  *
  * Null semantics: null in => null out (UnaryExpression default).
  */
case class PHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_phash60"

  // ExpectsInputTypes is private[sql], so validate manually (same approach
  // as CosineSimilarity): a clear message beats a ClassCastException or a
  // Janino compile failure for a SQL caller passing a non-string child.
  private def requireString(): Unit = child.dataType match {
    case org.apache.spark.sql.types.StringType => ()
    case other => throw new IllegalArgumentException(
      s"graft_phash60 expects a string argument (cast first), got ${other.simpleString(10)}")
  }

  override def nullSafeEval(input: Any): Any = {
    requireString()
    PHash60Util.hash60(input.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    requireString()
    defineCodeGen(ctx, ev, c => s"graft.functions.PHash60Util.hash60($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): PHash60 =
    copy(child = newChild)
}

/** Static helper the generated code calls (top-level object => static
  * forwarder on the class, so the Janino-compiled projection links it).
  */
object PHash60Util {
  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  def hash60(s: UTF8String): Long = {
    val md = md5.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val top =
      ((d(0) & 0xFFL) << 56) | ((d(1) & 0xFFL) << 48) |
      ((d(2) & 0xFFL) << 40) | ((d(3) & 0xFFL) << 32) |
      ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) |
      ((d(6) & 0xFFL) << 8) | (d(7) & 0xFFL)
    top >>> 4
  }
}
