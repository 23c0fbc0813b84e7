package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import scala.util.hashing.MurmurHash3

/** 64-bit SimHash over a token array — a custom Catalyst `Expression`
  * (SURVEY §2.13: the "novel sketch" case where a native expression beats a
  * UDF: no SerDe, evaluated per-row inside the operator).
  *
  * Algorithm (Charikar 2002, public): hash each token to 64 bits; for each
  * bit position keep a counter += (+1 if bit set else -1); the sketch's bit
  * j is 1 iff counter j > 0. Near-duplicate docs differ in few bits.
  *
  * Token hash: two murmur3-32 passes (different seeds) concatenated, so the
  * sketch is stable across JVMs/partitions.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val bytes = arr.getUTF8String(i).getBytes
        val h1 = MurmurHash3.bytesHash(bytes, 0x9747b28c)
        val h2 = MurmurHash3.bytesHash(bytes, 0x85ebca6b)
        val h64 = (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
        var j = 0
        while (j < 64) {
          if (((h64 >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) out |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash {
  /** SimHash64 as a Column over an array<string> token column. */
  def simhash64(tokens: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))
  }

  /** Hamming distance between two simhash sketches (native bit ops). */
  def hamming(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.bit_count(a.bitwiseXOR(b))
}
