#!/usr/bin/env python
"""Dataset/checkpoint downloader (reference scripts/download.py:12-167
equivalent).

Fetches the evaluation datasets and pretraining corpus the original
pipeline uses, with resumable HTTP and Google-Drive support, then
untars into `data/`. This build environment has no network egress, so
tests and benchmarks use synthetic data (`gcc_tpu.cli synth-corpus`,
`gcc_tpu.data.tu.save_tu_dataset`); on a connected machine this script
restores the original datasets.

Usage:
  python scripts/download.py --url <http-url> --out data/
  python scripts/download.py --gdrive <file-id> --out data/
"""

from __future__ import annotations

import argparse
import os
import tarfile


def download_http(url: str, out_dir: str) -> str:
    import urllib.request

    os.makedirs(out_dir, exist_ok=True)
    fname = os.path.join(out_dir, url.rstrip("/").rsplit("/", 1)[-1])
    # Resume if partially downloaded.
    start = os.path.getsize(fname) if os.path.exists(fname) else 0
    req = urllib.request.Request(url)
    if start:
        req.add_header("Range", f"bytes={start}-")
    with urllib.request.urlopen(req) as resp, open(fname, "ab") as f:
        while True:
            chunk = resp.read(1 << 20)
            if not chunk:
                break
            f.write(chunk)
    return fname


def download_gdrive(file_id: str, out_dir: str, name: str | None = None) -> str:
    """Google Drive download with the confirm-token dance."""
    import urllib.request
    import http.cookiejar

    os.makedirs(out_dir, exist_ok=True)
    fname = os.path.join(out_dir, name or file_id)
    jar = http.cookiejar.CookieJar()
    opener = urllib.request.build_opener(
        urllib.request.HTTPCookieProcessor(jar)
    )
    url = f"https://docs.google.com/uc?export=download&id={file_id}"
    resp = opener.open(url)
    body = resp.read()
    token = None
    for c in jar:
        if c.name.startswith("download_warning"):
            token = c.value
    if token:
        resp = opener.open(url + f"&confirm={token}")
        body = resp.read()
    with open(fname, "wb") as f:
        f.write(body)
    return fname


def maybe_untar(path: str, out_dir: str) -> None:
    if path.endswith((".tar.gz", ".tgz", ".tar")):
        with tarfile.open(path) as tf:
            tf.extractall(out_dir)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--url")
    ap.add_argument("--gdrive")
    ap.add_argument("--name")
    ap.add_argument("--out", default="data")
    args = ap.parse_args()
    if args.url:
        path = download_http(args.url, args.out)
    elif args.gdrive:
        path = download_gdrive(args.gdrive, args.out, args.name)
    else:
        ap.error("one of --url / --gdrive required")
    maybe_untar(path, args.out)
    print(path)


if __name__ == "__main__":
    main()
