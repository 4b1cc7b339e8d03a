package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Route-type inference and normalization as native `when` chains — the rule
  * cascades stay visible to Catalyst (constant-foldable, codegen'd), unlike
  * an opaque UDF.
  */
object RouteTypeExprs {

  /** Infer canonical route type from an accident's (activity, accident_type,
    * tags) with the reference's priority cascade
    * (ref: `backend/app/services/route_type_mapper.py:13-165`):
    * tags (most specific) → accident_type → activity → "default".
    */
  def inferFromAccident(activity: Column, accidentType: Column, tags: Column): Column = {
    val t = lower(coalesce(tags, lit("")))
    val at = lower(coalesce(accidentType, lit("")))
    val act = lower(coalesce(activity, lit("")))

    val highGrade = (11 to 15).map(i => t.contains(s"5.$i")).reduce(_ || _)
    val lowGrade = (1 to 10).map(i => t.contains(s"5.$i")).reduce(_ || _)

    // Priority 1: tags (route_type_mapper.py:56-110)
    val fromTags =
      when(t.contains("ice climbing") || t.contains("ice climb"), "ice")
        .when(t.contains("mixed climbing") || t.contains("mixed climb"), "mixed")
        .when(t.contains("alpine") || t.contains("mountaineering"), "alpine")
        .when(t.contains("sport climbing") || t.contains("sport climb"), "sport")
        .when(t.contains("trad") || t.contains("traditional climbing"), "trad")
        .when(t.contains("aid climbing") || t.contains("aid climb"), "aid")
        .when(t.contains("boulder"), "boulder")
        // grade heuristics inside tags (py:83-96). NB: python checks 5.11-5.15
        // first; "5.1" containment in the low range also matches "5.1x", which
        // we reproduce faithfully by mirroring the same containment test.
        .when(t.contains("grade:") && highGrade && !t.contains("trad"), "sport")
        .when(t.contains("grade:") && lowGrade && !t.contains("sport"), "trad")
        // Faithful reproduction of `"roped" in tags_lower` — substring
        // containment, so "unroped" ALSO matches and the reference's
        // unroped-solo→alpine rule (route_type_mapper.py:104-108) is dead
        // code. Kept byte-for-byte compatible; see strictRoped variant.
        .when(t.contains("roped"), "trad")
        .when(t.contains("unroped") && t.contains("solo"), "alpine")

    // Priority 2: accident_type (py:112-135)
    val fromType =
      when(at.contains("ice_climbing") || at.contains("ice"), "ice")
        .when(at.contains("avalanche"), "alpine")
        .when(at.contains("rockfall"), "alpine")
        .when(at.contains("roped_climbing"), "trad")
        .when(at.contains("rappel"), "trad")
        .when(at.contains("solo"), "alpine")

    // Priority 3: activity (py:137-162)
    val fromActivity =
      when(act.contains("backcountry"), "alpine")
        .when(act.contains("climber") || act.contains("climbing"), "trad")
        .when(act.contains("mountaineer"), "alpine")
        .when(act.contains("canyoneering"), "trad")
        .when(act.contains("ski"), "alpine")
        .when(Seq("hiker", "motorist", "rescuer", "rider").map(act.contains)
          .reduce(_ || _), "default")

    coalesce(fromTags, fromType, fromActivity, lit("default"))
  }

  /** The likely-INTENDED roped semantics (word-boundary roped, live
    * unroped-solo rule) — NOT the reference behavior; offered for callers
    * who want the bug fixed. The default [[inferFromAccident]] reproduces
    * the reference exactly.
    */
  def inferFromAccidentStrictRoped(activity: Column, accidentType: Column, tags: Column): Column = {
    val t = lower(coalesce(tags, lit("")))
    val base = inferFromAccident(activity, accidentType, tags)
    when(t.contains("unroped") && t.contains("solo"), "alpine").otherwise(base)
  }

  /** F13 confidence variant: how confident the inference cascade is, 0.0-1.0
    * (ref: `backend/app/services/route_type_mapper.py:168-241`). Early-return
    * priority order reproduced exactly; note the generic-accident-type rule
    * (0.50) fires BEFORE any activity rule, and an empty or "unknown"
    * accident_type falls through (Python falsy / explicit != check).
    */
  def inferenceConfidence(activity: Column, accidentType: Column, tags: Column): Column = {
    val t = lower(coalesce(tags, lit("")))
    val at = lower(coalesce(accidentType, lit("")))
    val act = lower(coalesce(activity, lit("")))
    val explicitTags = Seq("ice climbing", "sport climbing", "trad", "alpine",
      "mountaineering", "mixed climbing", "aid climbing", "boulder")
      .map(t.contains).reduce(_ || _)
    when(explicitTags, 0.95)
      .when(at.contains("ice_climbing") || at.contains("ice"), 0.85)
      .when(at.contains("avalanche"), 0.80)
      .when(t.contains("grade:") || t.contains("roped"), 0.60)
      .when(at =!= "" && at =!= "unknown", 0.50)
      .when(act.contains("backcountry") || act.contains("mountaineer"), 0.60)
      .when(act.contains("climber") || act.contains("climbing"), 0.40)
      .otherwise(0.20)
  }

  /** Normalize a raw Mountain-Project style `type` string to the canonical
    * 7 types, default "trad"
    * (ref: `backend/app/api/v1/mp_routes.py:109-150`; simpler batch variant
    * `safety_computation_optimized.py:375-398`).
    */
  def normalizeMpType(rawType: Column): Column = {
    val s = lower(coalesce(rawType, lit("")))
    when(s.contains("ice"), "ice")
      .when(s.contains("mixed"), "mixed")
      .when(s.contains("alpine") || s.contains("snow"), "alpine")
      .when(s.contains("boulder"), "boulder")
      .when(s.contains("aid") || s.contains("big wall"), "aid")
      .when(s.contains("sport") || s.contains("toprope") || s.contains("top rope"), "sport")
      .when(s.contains("trad"), "trad")
      .otherwise("trad")
  }

  /** Season filter used by map serving (ref: `mp_routes.py:312-333`):
    * winter = type contains ice/mixed; rock = neither; both exclude unknown.
    */
  def seasonFilter(rawType: Column, season: String): Column = {
    val s = lower(coalesce(rawType, lit("")))
    val isWinter = s.contains("ice") || s.contains("mixed")
    val notUnknown = s =!= "unknown"
    season match {
      case "winter" => isWinter && notUnknown
      case "rock" => !isWinter && notUnknown
      case _ => notUnknown
    }
  }
}
