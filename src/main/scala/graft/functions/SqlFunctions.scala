package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.Bridge

/** SQL registrations for the reference's UDF surface: `norm_body`,
  * `to_bool_safe` and `norm_date` become callable from `spark.sql`
  * exactly as they are from PostgreSQL in the reference
  * (dags/dag_datapelangan.py:88-110 defines them as SQL functions) —
  * but each registration is the SAME composed Catalyst column tree as
  * the [[Normalize]] API, adapted Column→Expression at the registry
  * boundary. Zero JVM UDFs: the SQL function IS the expression tree,
  * so codegen, constant folding and null-propagation all apply, and
  * the SQL and DataFrame surfaces cannot drift apart. */
object SqlFunctions {

  type Desc = (FunctionIdentifier, ExpressionInfo,
    Seq[Expression] => Expression)

  private def unary(name: String)(f: Column => Column): Desc =
    (FunctionIdentifier(name),
      new ExpressionInfo(Normalize.getClass.getName, name),
      (children: Seq[Expression]) => {
        require(children.length == 1, s"$name expects exactly 1 argument")
        Bridge.expression(f(Bridge.column(children.head)))
      })

  val all: Seq[Desc] = Seq(
    unary("norm_body")(Normalize.normBody),
    unary("to_bool_safe")(Normalize.toBoolSafe),
    unary("norm_date")(Normalize.normDate))
}
