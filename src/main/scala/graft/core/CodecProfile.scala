package graft.core

/** Compression/layout profiles — the parquet re-expression of the
  * reference's codec profiles (zcollection/codecs/defaults.py:1-60):
  *
  *  - `local-fast`     -> snappy (cheap CPU, local disks)
  *  - `cloud-balanced` -> zstd, ~128 MiB target files (default)
  *  - `cloud-cold`     -> zstd max level, ~512 MiB target files
  *
  * Zarr's chunk/shard layering collapses naturally onto parquet: row
  * groups are the chunk analogue, files the shard analogue; the profile
  * picks the compressor and the target file size.
  */
final case class CodecProfile(name: String, compression: String, zstdLevel: Int, targetFileBytes: Long)

object CodecProfile {
  val LocalFast: CodecProfile = CodecProfile("local-fast", "snappy", 0, 128L << 20)
  val CloudBalanced: CodecProfile = CodecProfile("cloud-balanced", "zstd", 3, 128L << 20)
  val CloudCold: CodecProfile = CodecProfile("cloud-cold", "zstd", 9, 512L << 20)

  val All: Map[String, CodecProfile] =
    Seq(LocalFast, CloudBalanced, CloudCold).map(p => p.name -> p).toMap

  def apply(name: String): CodecProfile =
    All.getOrElse(name, throw new IllegalArgumentException(
      s"unknown codec profile '$name'; choose from ${All.keys.mkString(", ")}"))
}
