package graft.tools

/** Print the host-speed factor (current [[graft.Bench.calibrationPhase]]
  * floor over the recorded reference) — stamp SCALE.md measurements with
  * it so cross-day comparisons are self-normalizing. Not part of the
  * driver contract. */
object HostSpeed {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(5)
    val samples = (1 to n).map(_ => graft.Bench.calibrationRun())
    val floor = samples.min
    println(f"HOSTSPEED factor=${floor / graft.Bench.CalibrationRefSec}%.3f " +
      f"floorSec=$floor%.3f refSec=${graft.Bench.CalibrationRefSec}%.3f " +
      s"samples=${samples.map(x => f"$x%.3f").mkString(",")}")
  }
}
