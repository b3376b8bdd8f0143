"""Filesystem seam for lineage/manifest IO, routed through the Hadoop
FileSystem API (via the Spark JVM gateway).

The lineage layer must work wherever the sinks live: local disks in this
sandbox, HDFS or an object store (s3a://, gs://, abfs://) on the 100 TB
deployment. Raw ``os.*`` calls only work for the first case, so every
manifest read/write and parquet-footer enumeration goes through
``org.apache.hadoop.fs.FileSystem`` resolved from the path's own scheme —
identical code paths for file:/ and s3a:/ URIs (the resume test exercises
file:/ URIs explicitly to prove no raw-os dependency).

Footer row counts come from ``parquet-hadoop``'s ``ParquetFileReader``
(already on Spark's classpath), which on object storage issues ranged GETs
for the footer only.
"""

from __future__ import annotations


def join_path(*parts: str) -> str:
    """URI-safe path join (os.path.join would mangle scheme-qualified
    paths on Windows-style separators and cannot express s3a:// roots)."""
    cleaned = [p.rstrip("/") for p in parts if p]
    return "/".join(cleaned)


class HadoopFS:
    """Thin wrapper over the Hadoop FileSystem of a given path's scheme."""

    def __init__(self, spark, path: str):
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()
        self._Path = self._jvm.org.apache.hadoop.fs.Path
        self._fs = self._Path(path).getFileSystem(self._conf)

    def _p(self, path: str):
        return self._Path(path)

    def exists(self, path: str) -> bool:
        return self._fs.exists(self._p(path))

    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._p(path))

    def read_text(self, path: str) -> str:
        stream = self._fs.open(self._p(path))
        try:
            return self._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()

    def write_text_atomic(self, path: str, text: str) -> None:
        """tmp-write + rename: the same commit unit on HDFS (atomic rename)
        and on object stores (single-object PUT visibility for the tmp,
        then server-side copy — the manifest is small, so the non-atomic
        rename window on S3 is one tiny object)."""
        tmp = path + ".tmp"
        out = self._fs.create(self._p(tmp), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()
        target = self._p(path)
        if self._fs.exists(target):
            self._fs.delete(target, False)
        self._fs.rename(self._p(tmp), target)

    def list_files_recursive(self, path: str, suffix: str = ".parquet"):
        """Yield paths (as strings) of all files under ``path`` with the
        given suffix, any partitionBy nesting depth."""
        it = self._fs.listFiles(self._p(path), True)
        out = []
        while it.hasNext():
            st = it.next()
            p = st.getPath().toString()
            if p.endswith(suffix):
                out.append(p)
        return out

    def parquet_row_count(self, path: str) -> int:
        """Footer-only row count via parquet-hadoop (ranged GET on object
        storage; no data pages read)."""
        HadoopInputFile = self._jvm.org.apache.parquet.hadoop.util.HadoopInputFile
        ParquetFileReader = self._jvm.org.apache.parquet.hadoop.ParquetFileReader
        reader = ParquetFileReader.open(
            HadoopInputFile.fromPath(self._p(path), self._conf)
        )
        try:
            return int(reader.getRecordCount())
        finally:
            reader.close()

    def relativize(self, base: str, path: str) -> str:
        """Path of ``path`` relative to directory ``base`` (both may be
        scheme-qualified; comparison happens on fully-qualified URIs)."""
        base_q = self._fs.makeQualified(self._p(base)).toString().rstrip("/")
        full_q = self._fs.makeQualified(self._p(path)).toString()
        if full_q.startswith(base_q + "/"):
            return full_q[len(base_q) + 1 :]
        return full_q
