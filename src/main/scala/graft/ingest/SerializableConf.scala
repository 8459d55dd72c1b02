package graft.ingest

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/** Serializable carrier for a Hadoop Configuration so effectful partition
  * functions (fetch, sinks, renames) can open FileSystems on executors
  * with the driver's storage settings (s3a credentials providers, etc.).
  * Configuration itself is Writable but not java.io.Serializable.
  */
class SerializableConf(@transient var value: Configuration)
    extends Serializable {

  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
