"""Filesystem operations for non-tabular assets — list and byte-copy.

Behavior parity with the reference's FS_Ops_Dispatcher (reference:
yaetos/env_dispatchers.py:133-254): driver-side file listing with an
optional regex OR glob filter (mutually exclusive), and byte-for-byte
file copy — local via ``shutil.copy2`` (metadata-preserving), S3 via
``boto3`` server-side copy behind the same optional-dependency gate as
deploy.  These are deliberately NOT Spark operations: ferrying models,
images, licence files must not parse, re-encode, or re-partition the
bytes.
"""

from __future__ import annotations

import fnmatch
import glob as gb
import os
import re
import shutil
from pathlib import Path


# one definition of "is this S3": paths arriving here have usually been
# through expand_path, which rewrites s3:// → s3a:// for the hadoop
# connector — both schemes must take the boto3 branch
from yaetos_spark.plans.paths import is_s3_path


def _split_s3(path: str) -> tuple[str, str]:
    rest = re.sub(r"^s3a?://", "", path)
    bucket, _, key = rest.partition("/")
    return bucket, key


def list_files(path: str, regex: str | None = None, globy: str | None = None) -> list[str]:
    """List files under ``path`` filtered by ``regex`` OR ``globy`` —
    never both (reference: yaetos/env_dispatchers.py:137-166).

    Matching semantics differ by backend, mirroring the reference
    exactly: local regex searches the FULL absolute path while S3 regex
    searches only the key suffix under the prefix; local glob is
    ``glob.glob`` (``*`` does not cross ``/``, ``**`` needs
    recursive=True) while S3 glob is ``fnmatch`` on the suffix (``*``
    crosses ``/``, ``**`` is not special) — reference
    env_dispatchers.py:142-157 vs :186-193.  Specs promoted between
    backends should prefer suffix-anchored regex (portable) over glob."""
    if regex and globy:
        raise ValueError("Provide either a regex or a glob pattern, not both.")
    if is_s3_path(path):
        return _list_files_s3(path, regex, globy)
    files: list[str] = []
    if regex:
        try:
            compiled = re.compile(regex)
        except re.error as e:
            raise ValueError(f"Invalid regex pattern: {e}")
        for dirpath, _dirs, filenames in os.walk(path):
            for fname in filenames:
                full = os.path.join(dirpath, fname)
                if compiled.search(full):
                    files.append(full)
    elif globy:
        files = gb.glob(os.path.join(path, globy), recursive=True)
        files = [f for f in files if os.path.isfile(f)]
    else:
        for dirpath, _dirs, filenames in os.walk(path):
            for fname in filenames:
                files.append(os.path.join(dirpath, fname))
    return sorted(files)


def _list_files_s3(path: str, regex: str | None, globy: str | None) -> list[str]:
    """S3 listing via paginated list_objects_v2, filter applied to the
    key suffix under the prefix (reference:
    yaetos/env_dispatchers.py:168-216)."""
    import boto3  # optional dep — gate at call time like deploy

    bucket, prefix = _split_s3(path)
    # preserve the caller's scheme (s3:// or s3a://) so consumers that
    # str.replace the listing root against the input path (copy_raw's
    # in→out mirroring) keep matching
    scheme = "s3a" if path.startswith("s3a://") else "s3"
    s3 = boto3.client("s3")
    compiled = re.compile(regex) if regex else None
    out = []
    for page in s3.get_paginator("list_objects_v2").paginate(Bucket=bucket, Prefix=prefix):
        for obj in page.get("Contents", []):
            suffix = obj["Key"][len(prefix):]
            if compiled and not compiled.search(suffix):
                continue
            if globy and not fnmatch.fnmatch(suffix, globy):
                continue
            out.append(f"{scheme}://{bucket}/{obj['Key']}")
    return sorted(out)


def copy_file(path_in: str, path_out: str) -> None:
    """Byte-for-byte copy, no parse, no re-encode (reference:
    yaetos/env_dispatchers.py:231-254).  Local→local preserves mtime
    via copy2; S3 paths use server-side copy (boto3 gated)."""
    if is_s3_path(path_in) or is_s3_path(path_out):
        _copy_file_s3(path_in, path_out)
        return
    Path(path_out).parent.mkdir(parents=True, exist_ok=True)
    shutil.copy2(path_in, path_out)


def _copy_file_s3(path_in: str, path_out: str) -> None:
    import boto3  # optional dep — gate at call time like deploy

    s3 = boto3.client("s3")
    if is_s3_path(path_in) and is_s3_path(path_out):
        b_in, k_in = _split_s3(path_in)
        b_out, k_out = _split_s3(path_out)
        s3.copy({"Bucket": b_in, "Key": k_in}, b_out, k_out)
    elif is_s3_path(path_out):
        b_out, k_out = _split_s3(path_out)
        s3.upload_file(path_in, b_out, k_out)
    else:
        b_in, k_in = _split_s3(path_in)
        Path(path_out).parent.mkdir(parents=True, exist_ok=True)
        s3.download_file(b_in, k_in, path_out)


def convert_to_linux_eol(path_in: str, path_out: str | None = None) -> bool:
    """CRLF → LF byte rewrite, in place when ``path_out`` is omitted
    (reference: yaetos/windows_utils.py:6-16 — Windows-dev support for
    scripts/SQL files that must run on the cluster)."""
    path_out = path_out or path_in
    with open(path_in, "rb") as fh:
        content = fh.read()
    with open(path_out, "wb") as fh:
        fh.write(content.replace(b"\r\n", b"\n"))
    return True
