"""File / archive downloader with progress and resume-safe atomic writes.

Behavioral parity target: reference nunif/utils/downloader.py:10-105 —
``Downloader`` base with progress callback, ``ArchiveDownloader`` extracting
zip/tar into a target dir (used by waifu2x/download_models.py:8-26), and
corrupted-download cleanup (reference iw3/base_depth_model.py:108-125
deletes and asks for retry).

Works with http(s):// and file:// URLs; in a no-egress environment only
file:// (and pre-seeded caches) function, which the tests use.
"""
from __future__ import annotations

import hashlib
import os
import shutil
import tarfile
import tempfile
import urllib.request
import zipfile
from typing import Callable, Optional

from ..core.logger import logger


class DownloadError(RuntimeError):
    pass


def download_file(url: str, dst_path: str,
                  progress_callback: Optional[Callable] = None,
                  sha256: Optional[str] = None,
                  chunk_size: int = 1 << 20) -> str:
    """Download ``url`` to ``dst_path`` atomically (tmp + rename).

    Returns dst_path.  On checksum mismatch the partial file is deleted and
    DownloadError raised (reference corrupted-file recovery,
    iw3/base_depth_model.py:108-125).
    """
    os.makedirs(os.path.dirname(os.path.abspath(dst_path)) or ".",
                exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(
        os.path.abspath(dst_path)), suffix=".part")
    h = hashlib.sha256() if sha256 else None
    try:
        with os.fdopen(fd, "wb") as f, urllib.request.urlopen(url) as r:
            total = int(r.headers.get("Content-Length") or 0)
            done = 0
            while True:
                chunk = r.read(chunk_size)
                if not chunk:
                    break
                f.write(chunk)
                if h is not None:
                    h.update(chunk)
                done += len(chunk)
                if progress_callback:
                    progress_callback(done, total)
        if h is not None and h.hexdigest() != sha256.lower():
            raise DownloadError(
                f"checksum mismatch for {url}: got {h.hexdigest()}")
        os.replace(tmp, dst_path)
    except Exception:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    logger.info("downloaded %s -> %s", url, dst_path)
    return dst_path


class Downloader:
    """Single-file downloader into a cache dir, skipping existing files."""

    def __init__(self, cache_dir: str,
                 progress_callback: Optional[Callable] = None):
        self.cache_dir = cache_dir
        self.progress_callback = progress_callback

    def get(self, url: str, name: Optional[str] = None,
            sha256: Optional[str] = None) -> str:
        name = name or os.path.basename(url.split("?")[0])
        dst = os.path.join(self.cache_dir, name)
        if os.path.exists(dst):
            return dst
        return download_file(url, dst, self.progress_callback, sha256=sha256)


class ArchiveDownloader(Downloader):
    """Download + extract zip/tar archives (reference ArchiveDownloader,
    used for versioned pretrained-model bundles,
    waifu2x/download_models.py:8-26)."""

    def get_extracted(self, url: str, extract_dir: Optional[str] = None,
                      name: Optional[str] = None,
                      sha256: Optional[str] = None,
                      version: Optional[str] = None) -> str:
        extract_dir = extract_dir or self.cache_dir
        stamp = os.path.join(extract_dir, ".version")
        if version is not None and os.path.exists(stamp):
            with open(stamp) as f:
                if f.read().strip() == str(version):
                    return extract_dir
        archive = self.get(url, name=name, sha256=sha256)
        os.makedirs(extract_dir, exist_ok=True)
        if zipfile.is_zipfile(archive):
            with zipfile.ZipFile(archive) as z:
                _safe_extract_zip(z, extract_dir)
        elif tarfile.is_tarfile(archive):
            with tarfile.open(archive) as t:
                t.extractall(extract_dir, filter="data")
        else:
            raise DownloadError(f"unknown archive format: {archive}")
        if version is not None:
            with open(stamp, "w") as f:
                f.write(str(version))
        return extract_dir


def _safe_extract_zip(z: zipfile.ZipFile, dst: str):
    base = os.path.abspath(dst)
    for info in z.infolist():
        target = os.path.abspath(os.path.join(dst, info.filename))
        if not target.startswith(base + os.sep) and target != base:
            raise DownloadError(f"unsafe path in archive: {info.filename}")
    z.extractall(dst)


def remove_corrupted(path: str) -> bool:
    """Delete a file that failed to load so the next run re-downloads it."""
    try:
        if os.path.isdir(path):
            shutil.rmtree(path)
        else:
            os.unlink(path)
        logger.warning("removed corrupted file: %s", path)
        return True
    except OSError:
        return False
