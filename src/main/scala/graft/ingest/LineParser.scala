package graft.ingest

import graft.model.MetricPoint
import graft.names.MetricValidator

/** Graphite plaintext line → validated point (reference
  * `server/BaseMetricFactory.java:41-78`): `"name value timestamp"`,
  * non-finite values and ts <= 0 rejected, float timestamps rounded,
  * name validated by [[MetricValidator]]. Pure function — usable from a
  * typed `Dataset[String].flatMap` at the streaming parse boundary
  * (SURVEY.md §1.4) and from plain unit tests.
  */
final class LineParser(
    validator: MetricValidator = MetricValidator(),
    hostPostfixes: Seq[String] = Nil,
    hostDirName: String = "HOST"
) extends Serializable {

  def parse(line: String, updatedSeconds: Int): Option[MetricPoint] = {
    val parts = line.trim.split(" ")
    if (parts.length != 3) return None
    val name = processName(parts(0))
    if (!validator.validate(name)) return None
    val value =
      try parts(1).toDouble
      catch { case _: NumberFormatException => return None }
    if (value.isNaN || value.isInfinite) return None
    val tsRaw =
      try parts(2).toDouble
      catch { case _: NumberFormatException => return None }
    val tsLong = math.round(tsRaw)
    // reject out-of-range instead of letting .toInt WRAP: a millisecond
    // epoch (common client misconfiguration) would otherwise ingest with
    // a garbage wrapped timestamp about half the time and be silently
    // dropped the other half
    if (tsLong <= 0 || tsLong > Int.MaxValue) return None
    val ts = tsLong.toInt
    Some(MetricPoint(name, value, ts,
      new java.sql.Date(ts.toLong * 1000L), updatedSeconds))
  }

  /** S3 — host-metric redirect (reference `BaseMetricFactory.java:80-91`):
    * `a.host-suffix.rest` → `a.HOSTDIR.host-suffix.rest` when the second
    * level ends with a configured postfix.
    */
  def processName(name: String): String = {
    if (hostPostfixes.isEmpty) return name
    val firstDot = name.indexOf('.')
    if (firstDot < 0) return name
    val secondDot = name.indexOf('.', firstDot + 1)
    if (secondDot < 0) return name
    val second = name.substring(firstDot + 1, secondDot)
    if (hostPostfixes.exists(second.endsWith))
      name.substring(0, firstDot + 1) + hostDirName + name.substring(firstDot)
    else name
  }
}
