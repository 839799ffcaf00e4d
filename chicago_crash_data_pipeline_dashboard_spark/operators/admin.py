"""M5 — destructive admin ops over the lake layout.

Reference parity (streamlit_frontend/streamlit_frontend.py:355-412:
preview objects under a prefix, delete the previewed prefix, delete
every object in a bucket while preserving the bucket; :468-483: wipe
the gold DB file, recreated on the next cleaner run). Re-expressed for
a Spark lake: "bucket/prefix" becomes a filesystem prefix under the
bronze/silver/gold roots, and the ops run through the Hadoop
FileSystem API — the same abstraction Spark's own writers use — so one
implementation covers file://, hdfs:// and s3a:// alike (at 100 TB the
delete is a namenode/object-store metadata operation either way; no
data flows through the driver).

The reference UI gates every delete behind a preview + an explicit
confirm checkbox; the engine-level mirror is ``confirm=True`` —
required, defaulting to False, raising before anything is touched.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def _require_confirm(confirm: bool, what: str) -> None:
    if confirm is not True:
        raise ValueError(
            f"{what} is destructive — pass confirm=True explicitly "
            "(reference parity: the frontend requires a confirm "
            "checkbox before every delete)"
        )


def list_prefix(spark: SparkSession, prefix: str) -> list[str]:
    """Preview the objects (files) under a prefix — the reference's
    preview step before a prefix delete (streamlit_frontend.py:340-354
    ``list_objects(bucket, prefix=..., recursive=True)``). Returns
    fully-qualified file paths, sorted; [] for a missing prefix."""
    fs, hpath = _fs_and_path(spark, prefix)
    if not fs.exists(hpath):
        return []
    out = []
    it = fs.listFiles(hpath, True)  # recursive; files only
    while it.hasNext():
        out.append(it.next().getPath().toString())
    return sorted(out)


def remove_prefix(spark: SparkSession, prefix: str, confirm: bool = False) -> int:
    """Delete every object under a prefix (reference "Delete Folder",
    streamlit_frontend.py:360-378). Returns the number of FILES
    removed (the reference reports its per-object ``deleted_count``);
    0 for a missing prefix."""
    _require_confirm(confirm, f"remove_prefix({prefix!r})")
    fs, hpath = _fs_and_path(spark, prefix)
    if not fs.exists(hpath):
        return 0
    n = len(list_prefix(spark, prefix))
    fs.delete(hpath, True)
    return n


def wipe_store(spark: SparkSession, root: str, confirm: bool = False) -> int:
    """Delete ALL objects under a store root while PRESERVING the root
    itself (reference "Delete Entire Bucket",
    streamlit_frontend.py:382-412 — "Bucket structure is preserved
    (will be recreated on next write)"). Returns files removed."""
    _require_confirm(confirm, f"wipe_store({root!r})")
    fs, hpath = _fs_and_path(spark, root)
    if not fs.exists(hpath):
        return 0
    n = len(list_prefix(spark, root))
    for status in fs.listStatus(hpath):
        fs.delete(status.getPath(), True)
    return n


def drop_gold(spark: SparkSession, path: str, confirm: bool = False) -> bool:
    """Remove the gold table entirely — directory and all (reference
    "Wipe Gold DB (ENTIRE FILE)", streamlit_frontend.py:468-483:
    ``os.remove(gold_db_path)``; the table is recreated on the next
    cleaner run, which ``GoldTable.upsert`` mirrors by creating the
    path on first write). Returns True if something was removed,
    False if the table didn't exist (the reference warns "Database
    file doesn't exist")."""
    _require_confirm(confirm, f"drop_gold({path!r})")
    fs, hpath = _fs_and_path(spark, path)
    if not fs.exists(hpath):
        return False
    fs.delete(hpath, True)
    return True
