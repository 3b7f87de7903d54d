package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 7386 JSON Merge Patch + pretty printing — the two json-extension
  * functions left uncovered after round 2 (reference:
  * /root/reference/extension/json/json_functions/json_merge_patch.cpp,
  * json_pretty.cpp). Driver-verified edge semantics (matched against the
  * DuckDB oracle): a SQL-NULL patch yields NULL; a SQL-NULL target yields
  * the patch VERBATIM (nulls kept); a non-object patch replaces the
  * target wholesale (array nulls kept); object patches merge recursively
  * with null values deleting keys — and a patch object merged into a
  * non-object target merges into {} so its nested nulls are stripped.
  */
object JsonExtra {
  private[functions] val mapper = new ObjectMapper()

  private[functions] def mergePatch(target: JsonNode, patch: JsonNode): JsonNode =
    if (!patch.isObject) patch
    else {
      val result =
        if (target != null && target.isObject) target.deepCopy[ObjectNode]()
        else mapper.createObjectNode()
      val fields = patch.fields()
      while (fields.hasNext) {
        val e = fields.next()
        if (e.getValue.isNull) result.remove(e.getKey)
        else result.set[JsonNode](e.getKey, mergePatch(result.get(e.getKey), e.getValue))
      }
      result
    }

  /** 4-space-indent pretty form (the reference's yyjson pretty layout:
    * `"key": value`, one element per line, `{}`/`[]` stay compact).
    */
  private[functions] def pretty(n: JsonNode, depth: Int, sb: StringBuilder): Unit = {
    val pad = "    " * depth
    val childPad = "    " * (depth + 1)
    if (n.isObject) {
      if (!n.fields().hasNext) { sb.append("{}"); return }
      sb.append("{\n")
      val it = n.fields()
      var first = true
      while (it.hasNext) {
        val e = it.next()
        if (!first) sb.append(",\n")
        first = false
        sb.append(childPad).append(mapper.writeValueAsString(e.getKey)).append(": ")
        pretty(e.getValue, depth + 1, sb)
      }
      sb.append("\n").append(pad).append("}")
    } else if (n.isArray) {
      if (n.isEmpty) { sb.append("[]"); return }
      sb.append("[\n")
      var first = true
      val it = n.elements()
      while (it.hasNext) {
        val v = it.next()
        if (!first) sb.append(",\n")
        first = false
        sb.append(childPad)
        pretty(v, depth + 1, sb)
      }
      sb.append("\n").append(pad).append("]")
    } else sb.append(mapper.writeValueAsString(n))
  }
}

case class JsonMergePatch(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  import JsonExtra._

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "json_merge_patch"

  // custom null semantics (matched to the oracle): NULL patch -> NULL,
  // NULL target -> patch verbatim — so eval is overridden, not nullSafeEval
  override def eval(input: InternalRow): Any = {
    val p = right.eval(input)
    if (p == null) return null
    val t = left.eval(input)
    if (t == null) return p.asInstanceOf[UTF8String].clone()
    val merged = mergePatch(
      mapper.readTree(t.asInstanceOf[UTF8String].toString),
      mapper.readTree(p.asInstanceOf[UTF8String].toString))
    UTF8String.fromString(mapper.writeValueAsString(merged))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class JsonPretty(child: Expression)
  extends UnaryExpression with CodegenFallback {
  import JsonExtra._

  override def dataType: DataType = StringType
  override def prettyName: String = "json_pretty"

  override protected def nullSafeEval(v: Any): Any = {
    val sb = new StringBuilder
    pretty(mapper.readTree(v.asInstanceOf[UTF8String].toString), 0, sb)
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
