package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Route-type inference fidelity — expected values produced by executing
  * the reference `infer_route_type_from_accident` cascade
  * (backend/app/services/route_type_mapper.py:13-165) on the same inputs.
  */
class RouteTypeExprsSpec extends SparkSpec {

  private def infer(activity: String, accidentType: String, tags: String): String =
    evalString(RouteTypeExprs.inferFromAccident(
      Option(activity).map(lit).getOrElse(lit(null).cast("string")),
      Option(accidentType).map(lit).getOrElse(lit(null).cast("string")),
      Option(tags).map(lit).getOrElse(lit(null).cast("string"))))

  test("cascade matches reference on harvested vectors") {
    val cases = Seq(
      (null, null, null, "default"),
      ("Climbing", "fall", null, "trad"),
      ("Backcountry Tourer", "avalanche", null, "alpine"),
      ("Climbing", "ice_climbing", null, "ice"),
      ("Climbing", "fall", "Sport Climbing, grade:5.12a", "sport"),
      ("Climbing", "fall", "Traditional Climbing", "trad"),
      ("Climbing", "fall", "Bouldering, V5", "boulder"),
      ("Climbing", "fall", "Alpine/Mountaineering", "alpine"),
      ("Climbing", "fall", "Ice Climbing", "ice"),
      ("Climbing", "fall", "Mixed Climbing", "mixed"),
      ("Climbing", "fall", "Aid Climbing", "aid"),
      ("Climbing", "fall", "grade:5.13", "sport"),
      ("Climbing", "fall", "grade:5.6", "trad"),
      ("Hiker", "fall", null, "default"),
      ("Ski Tourer", "avalanche", null, "alpine"),
      ("Climbing", "rockfall", null, "alpine"),
      ("Scrambler", "fall", null, "default"),
      ("Climbing", "avalanche", null, "alpine"))
    for ((a, t, tg, expected) <- cases)
      assert(infer(a, t, tg) == expected, s"($a, $t, $tg)")
  }

  private def confidence(activity: String, accidentType: String, tags: String): Double =
    evalDouble(RouteTypeExprs.inferenceConfidence(
      Option(activity).map(lit).getOrElse(lit(null).cast("string")),
      Option(accidentType).map(lit).getOrElse(lit(null).cast("string")),
      Option(tags).map(lit).getOrElse(lit(null).cast("string"))))

  test("confidence cascade matches reference (route_type_mapper.py:168-241)") {
    val cases = Seq(
      // explicit tag types → 0.95 (incl. the docstring example)
      ("Climbing", "ice_climbing", "Ice Climbing, Alpine/Mountaineering", 0.95),
      ("Climbing", "fall", "Sport Climbing", 0.95),
      (null, null, "Bouldering, V5", 0.95),
      // specific accident types
      (null, "ice_climbing", null, 0.85),
      (null, "ice", null, 0.85),
      (null, "avalanche", null, 0.80),
      // grade / roped tags (incl. the 'unroped' substring quirk)
      (null, null, "grade:5.9", 0.60),
      ("Climbing", null, "unroped solo", 0.60),
      // generic accident type fires BEFORE activity rules
      ("Climbing", "fall", null, 0.50),
      ("Mountaineer", "rappel", null, 0.50),
      // empty / 'unknown' accident type falls through to activity
      (null, "unknown", "", 0.20),
      ("Mountaineer", "unknown", null, 0.60),
      ("Backcountry Tourer", null, null, 0.60),
      ("Climbing", null, null, 0.40),
      ("Rock Climber", null, null, 0.40),
      ("Hiker", null, null, 0.20),
      (null, null, null, 0.20))
    for ((a, t, tg, expected) <- cases)
      assert(confidence(a, t, tg) == expected, s"($a, $t, $tg)")
  }

  test("reference quirk reproduced: 'unroped' matches the roped→trad rule") {
    // python: `"roped" in "unroped solo"` is True → trad (unroped-solo rule
    // is dead code); the strictRoped variant gives the intended alpine
    assert(infer("Climbing", "fall", "unroped solo") == "trad")
    assert(evalString(RouteTypeExprs.inferFromAccidentStrictRoped(
      lit("Climbing"), lit("fall"), lit("unroped solo"))) == "alpine")
  }

  test("MP type normalization and season filters") {
    assert(evalString(RouteTypeExprs.normalizeMpType(lit("Ice Climbing"))) == "ice")
    assert(evalString(RouteTypeExprs.normalizeMpType(lit("Big Wall"))) == "aid")
    assert(evalString(RouteTypeExprs.normalizeMpType(lit("Toprope"))) == "sport")
    assert(evalString(RouteTypeExprs.normalizeMpType(lit(null).cast("string"))) == "trad")
    // season filter
    val winter = spark.range(1).select(
      RouteTypeExprs.seasonFilter(lit("Ice, Snow"), "winter").as("w"),
      RouteTypeExprs.seasonFilter(lit("Sport"), "winter").as("s"),
      RouteTypeExprs.seasonFilter(lit("Sport"), "rock").as("r")).head()
    assert(winter.getBoolean(0) && !winter.getBoolean(1) && winter.getBoolean(2))
  }
}
