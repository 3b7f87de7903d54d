package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.json4s.{JNothing, JObject, JString}
import org.json4s.jackson.JsonMethods

/** SQL statement (de)serialization — the reference's `json_serialize_sql`
  * family (/root/reference/extension/json/json_functions/
  * json_serialize_sql.cpp): serialize a statement's parsed AST to JSON,
  * and execute a serialized statement.
  *
  * Spark mapping, with its one honest divergence stated plainly:
  * `serialize` emits the REAL Catalyst AST (the parser's unresolved
  * logical plan via `TreeNode.toJSON` — faithful, machine-readable, the
  * inspection/shipping use the reference feature serves), alongside the
  * canonical statement text. `executeSerialized` validates the envelope
  * and replays the embedded statement through the parser — Spark exposes
  * no public plan-from-JSON, so execution re-parses rather than
  * rehydrating the AST; the round-trip's RESULT is what the oracle gates.
  */
object SqlSerde {

  /** JSON envelope: {"sql": <text>, "ast": <Catalyst plan JSON>}.
    * Throws ParseException on invalid SQL (the reference returns an
    * error-carrying document; Spark's parser error is richer).
    */
  def serialize(spark: SparkSession, sql: String): String = {
    val plan = org.apache.spark.sql.graft.bridge.parsePlan(spark, sql)
    JsonMethods.compact(JsonMethods.render(JObject(
      "sql" -> JString(sql),
      "ast" -> JsonMethods.parse(plan.toJSON))))
  }

  /** Execute a document produced by [[serialize]]. */
  def executeSerialized(spark: SparkSession, doc: String): DataFrame = {
    val j = JsonMethods.parse(doc)
    val sql = (j \ "sql") match {
      case JString(s) => s
      case _ => throw new IllegalArgumentException(
        "executeSerialized: document has no 'sql' field (not a serialize() envelope)")
    }
    require((j \ "ast") != JNothing,
      "executeSerialized: document has no 'ast' field (not a serialize() envelope)")
    spark.sql(sql)
  }
}
