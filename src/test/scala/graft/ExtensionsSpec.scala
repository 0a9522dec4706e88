package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.catalyst.expressions.Literal
import org.scalatest.funsuite.AnyFunSuite

/** The two registration surfaces (imperative register / extension
  * injection) share one function list — pin the list's shape, the
  * builders' arity checks, and SQL availability in a live session.
  */
class ExtensionsSpec extends SparkSpec {

  test("function list covers the four engine-native functions with arity enforcement") {
    val names = GraftFunctions.all.map(_._1)
    assert(names == Seq("decimal_dot", "double_dot", "double_bits", "norm_ascii"))
    val byName = GraftFunctions.all.toMap
    // correct arity builds the right Expression class
    assert(byName("decimal_dot")(Seq(Literal(null), Literal(null)))
      .isInstanceOf[graft.functions.DecimalDot])
    assert(byName("double_bits")(Seq(Literal(1.0)))
      .isInstanceOf[graft.functions.DoubleBits])
    assert(byName("norm_ascii")(Seq(Literal("x")))
      .isInstanceOf[graft.functions.NormalizeAscii])
    // wrong arity fails eagerly with the function name in the message
    val e = intercept[IllegalArgumentException](byName("decimal_dot")(Seq(Literal(1))))
    assert(e.getMessage.contains("decimal_dot"))
  }

  test("extension class injects without error and the live session evaluates all four via SQL") {
    // the injection path itself (a fresh extensions container)
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    // live-session SQL availability (Sessions.local registered the same list)
    val r = spark.sql(
      "SELECT decimal_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dd, " +
        "double_dot(array(1.0D), array(2.0D)) AS d2, " +
        "double_bits(1.0D) AS bits, norm_ascii('  Héllo,  World!  ') AS na").collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 2.0)
    assert(r.getLong(2) == java.lang.Double.doubleToLongBits(1.0))
    assert(r.getString(3) == "hllo world")
  }
}
