package graft

import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** Test-only `file://` filesystem that never shells out.
  *
  * Hadoop's RawLocalFileSystem (no native lib in this container) FORKS a
  * `chmod` process on every file create/mkdir to apply permissions, and
  * the FileContext path additionally forks `readlink`/`stat` per status
  * call. On this sandbox VM the process-spawn path intermittently goes
  * pathological (observed: a 1-row streaming micro-batch wedged >15 min
  * inside Shell.runCommand, twice). Tests run single-user on a scratch
  * dir — permission bits carry zero information here — so the fix is to
  * make permission maintenance a no-op and keep every state-store /
  * checkpoint / parquet-commit file op a pure java.io call.
  *
  * Registered in SparkTestSession via `spark.hadoop.fs.file.impl`
  * (replacing ChecksumFileSystem — .crc sidecars are also dropped, fine
  * for tests). Production deployments keep the default filesystem. */
class BareLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = ()
}
