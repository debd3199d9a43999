"""Existence probes and archival (reference S9 + §2.9 archival).

The reference probes S3 paths with JVM ``FileSystem.exists`` /
``listStatus`` before reading (``/root/reference/scripts/compute_kpis.py:
79-106``, ``validate_data.py:73-83``) and archives processed inputs by
copy-then-delete into ``archived/<ts>/`` prefixes
(``dags/music_streaming_pipeline.py:721-813``). Both re-expressed against
the Hadoop FileSystem API so they work for any scheme Spark can reach
(file://, s3a://, hdfs://), not just the local FS.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath, jvm


def path_exists(spark: SparkSession, path: str) -> bool:
    """S9: FileSystem.exists — cheap pre-read probe."""
    fs, hpath, _ = _fs(spark, path)
    return bool(fs.exists(hpath))


def list_files(spark: SparkSession, path: str, suffix: str = "") -> list[str]:
    """S9: non-recursive listing of data files under a prefix (used for
    ledger-based incremental discovery)."""
    fs, hpath, _ = _fs(spark, path)
    if not fs.exists(hpath):
        return []
    out = []
    for status in fs.listStatus(hpath):
        p = status.getPath().toString()
        name = status.getPath().getName()
        if status.isFile() and not name.startswith(("_", ".")):
            if p.endswith(suffix):
                out.append(p)
    return sorted(out)


def readable_parquet(spark: SparkSession, path: str) -> bool:
    """Try-read probe (the reference's fallback when listing is not
    authoritative): schema resolution only, no data scan."""
    try:
        spark.read.parquet(path).schema
        return True
    except Exception:
        return False


def archive_files(
    spark: SparkSession, files: list[str], archive_dir: str, batch_ts: str
) -> list[str]:
    """§2.9 archival: move processed inputs under ``archive_dir/<batch_ts>/``
    (rename when same-FS — atomic and cheap; the reference copy-then-deletes).
    Returns the archived destination paths."""
    if not files:
        return []
    fs, _, jvm = _fs(spark, archive_dir)
    dest_root = jvm.org.apache.hadoop.fs.Path(f"{archive_dir}/{batch_ts}")
    fs.mkdirs(dest_root)
    archived = []
    for f in files:
        src = jvm.org.apache.hadoop.fs.Path(f)
        dst = jvm.org.apache.hadoop.fs.Path(dest_root, src.getName())
        try:
            ok = fs.rename(src, dst)
        except Exception as exc:  # py4j wraps Java IO errors in its own type
            raise OSError(f"archive failed: {f} -> {dst.toString()}") from exc
        if not ok:
            raise OSError(f"archive failed: {f} -> {dst.toString()}")
        archived.append(dst.toString())
    return archived
