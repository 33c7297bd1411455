package graft.runtime

/** Public checksum algorithms used by identifier samplers. */
object Checksums {

  /** Luhn check digit over a digit string (the IMEI check digit —
    * reference ImeiSampler.java:88-130 implements the same public
    * algorithm).
    */
  def luhnCheckDigit(digits: String): Int = {
    var sum = 0
    var double = true // rightmost body digit is doubled for a check-digit append
    var i = digits.length - 1
    while (i >= 0) {
      var d = digits.charAt(i) - '0'
      if (double) { d *= 2; if (d > 9) d -= 9 }
      sum += d
      double = !double
      i -= 1
    }
    (10 - sum % 10) % 10
  }

  def luhnValid(full: String): Boolean =
    luhnCheckDigit(full.dropRight(1)).toString == full.takeRight(1)

  /** VIN check digit (position 9) per the public ISO 3779 transliteration
    * and weight tables (reference VinSampler.java:190-207 implements the
    * same standard).
    */
  private val vinValues: Map[Char, Int] =
    ("0123456789".zipWithIndex.map { case (c, i) => c -> i } ++
      Map('A' -> 1, 'B' -> 2, 'C' -> 3, 'D' -> 4, 'E' -> 5, 'F' -> 6, 'G' -> 7,
        'H' -> 8, 'J' -> 1, 'K' -> 2, 'L' -> 3, 'M' -> 4, 'N' -> 5, 'P' -> 7,
        'R' -> 9, 'S' -> 2, 'T' -> 3, 'U' -> 4, 'V' -> 5, 'W' -> 6, 'X' -> 7,
        'Y' -> 8, 'Z' -> 9)).toMap
  private val vinWeights = Array(8, 7, 6, 5, 4, 3, 2, 10, 0, 9, 8, 7, 6, 5, 4, 3, 2)

  /** Compute the check character for a 17-char VIN (position 9 ignored). */
  def vinCheckChar(vin17: String): Char = {
    require(vin17.length == 17, s"VIN must be 17 chars: $vin17")
    var sum = 0
    var i = 0
    while (i < 17) {
      if (i != 8) sum += vinValues(vin17.charAt(i)) * vinWeights(i)
      i += 1
    }
    val r = sum % 11
    if (r == 10) 'X' else ('0' + r).toChar
  }

  def vinValid(vin: String): Boolean =
    vin.length == 17 && vinCheckChar(vin) == vin.charAt(8)
}
