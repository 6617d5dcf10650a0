package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Token-level expressions replacing interpreted HOF chains in the text
  * operators (same exact semantics as the Column formulations — asserted
  * by differential tests):
  *
  *  - [[TokenSetCount]]: count of array elements contained in a constant
  *    string set (stopword counting, language-marker scoring). The HOF
  *    `size(filter(tokens, t.isin(...)))` evaluates N×|set| comparisons
  *    interpreted; this does one hash probe per token.
  *  - [[Shingles]]: word n-gram shingling. The HOF
  *    `transform(sequence(...), slice+array_join)` allocates per shingle;
  *    this builds each shingle in one pass.
  *  - [[JaccardSim]]: |distinct(A)∩distinct(B)| / |distinct(A)∪distinct(B)|
  *    — matches `size(array_intersect)/size(array_union)` on
  *    distinct inputs.
  */
object TokenExpressions {

  case class TokenSetCount(child: Expression, set: Seq[String])
      extends UnaryExpression {
    override def dataType: DataType = IntegerType
    @transient private lazy val lookup: java.util.HashSet[UTF8String] = {
      val s = new java.util.HashSet[UTF8String](set.size * 2)
      set.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      var c = 0
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        if (!arr.isNullAt(i) && lookup.contains(arr.getUTF8String(i))) c += 1
        i += 1
      }
      java.lang.Integer.valueOf(c)
    }
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val lookupRef = ctx.addReferenceObj("tokenSet", lookup, "java.util.HashSet")
        val i = ctx.freshName("i")
        val c = ctx.freshName("c")
        s"""
           |int $c = 0;
           |for (int $i = 0; $i < $a.numElements(); $i++) {
           |  if (!$a.isNullAt($i) && $lookupRef.contains($a.getUTF8String($i))) $c++;
           |}
           |${ev.value} = $c;
         """.stripMargin
      })
    override protected def withNewChildInternal(newChild: Expression): TokenSetCount =
      copy(child = newChild)
  }

  /** Word n-gram shingles over an array<string>: sliding windows of n
    * tokens joined by a single space; inputs of ≤ n tokens yield one
    * shingle of the whole input (same edge semantics as
    * TextFunctions.shingles).
    */
  case class Shingles(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    private val space = UTF8String.fromString(" ")
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val len = arr.numElements()
      def tok(i: Int): UTF8String =
        if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i)
      if (len <= n) {
        val whole = UTF8String.concatWs(space, Array.tabulate(len)(tok): _*)
        new GenericArrayData(Array[Any](whole))
      } else {
        val out = new Array[Any](len - n + 1)
        var i = 0
        while (i + n <= len) {
          out(i) = UTF8String.concatWs(space, Array.tabulate(n)(j => tok(i + j)): _*)
          i += 1
        }
        new GenericArrayData(out)
      }
    }
    override protected def withNewChildInternal(newChild: Expression): Shingles =
      copy(child = newChild)
  }

  /** Jaccard similarity of two string arrays on their distinct element
    * sets; 0.0 when the union is empty.
    */
  case class JaccardSim(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      java.lang.Double.valueOf(
        JaccardSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        // JaccardOps is TOP-LEVEL so scalac emits a mirror class with a
        // static `compute` forwarder Janino can link (a nested object has
        // no forwarder — calling it failed to compile and silently dropped
        // the whole stage to interpreted execution)
        s"${ev.value} = ${JaccardOps.getClass.getName.stripSuffix("$")}.compute($a, $b);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSim =
      copy(left = l, right = r)
  }

  object JaccardSim {
    /** Shared by interpreted eval and generated code. */
    def compute(a: ArrayData, b: ArrayData): Double = JaccardOps.compute(a, b)
  }

  def tokenSetCount(tokens: Column, set: Seq[String]): Column =
    Bridge.column(TokenSetCount(Bridge.expression(tokens), set))

  def shingleArray(tokens: Column, n: Int): Column =
    Bridge.column(Shingles(Bridge.expression(tokens), n))

  def jaccardSim(a: Column, b: Column): Column =
    Bridge.column(JaccardSim(Bridge.expression(a), Bridge.expression(b)))
}

/** Top-level on purpose: generated (Janino) code calls the static
  * forwarder `graft.expressions.JaccardOps.compute`, which scalac only
  * emits for top-level objects.
  */
object JaccardOps {
  private def toSet(a: ArrayData): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](a.numElements() * 2)
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (!a.isNullAt(i)) s.add(a.getUTF8String(i))
      i += 1
    }
    s
  }

  /** |distinct(A)∩distinct(B)| / |distinct(A)∪distinct(B)|; 0.0 on empty union. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val sa = toSet(a)
    val sb = toSet(b)
    var inter = 0
    val it = sa.iterator()
    while (it.hasNext) if (sb.contains(it.next())) inter += 1
    val union = sa.size + sb.size - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }
}
