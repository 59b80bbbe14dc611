"""Model distribution: download split tar.gz volumes and reassemble
(reference ``cube/io_utils/repository.py:8-61``)."""

from __future__ import annotations

import os
import tarfile

DOWNLOAD_BASE = "https://github.com/tiberiu44/TTS-Cube-Models/raw/main/models/{0}/model"


def _download_file(url: str, filename: str) -> int:
    import requests

    r = requests.get(url, stream=True)
    if r.status_code != 200:
        raise RuntimeError(f"Error getting {url}, received status_code {r.status_code}")
    with open(filename, "wb") as fp:
        for chunk in r.iter_content(chunk_size=1 << 20):
            if chunk:
                fp.write(chunk)
    return r.status_code


def download_model(local_path: str, model: str, download_base: str | None = None):
    """Fetch model-00..19 volumes, concatenate, extract, clean up."""
    base = (download_base or DOWNLOAD_BASE).format(model)
    file_list = []
    for i in range(20):
        url = f"{base}-{i:02d}"
        target = os.path.join(local_path, f"model-{i:02d}")
        try:
            if _download_file(url, target) != 200:
                break
        except Exception:
            break
        file_list.append(target)
    if not file_list:
        raise RuntimeError(f"no model volumes found for {model}")

    combined = os.path.join(local_path, "model")
    with open(combined, "wb") as out:
        for f in file_list:
            with open(f, "rb") as src:
                while True:
                    buf = src.read(1 << 20)
                    if not buf:
                        break
                    out.write(buf)
    with tarfile.open(combined, "r:gz") as tar:
        tar.extractall(local_path)
    for f in file_list:
        os.unlink(f)
    os.unlink(combined)


def split_volumes(tar_path: str, output_base: str, chunk_size: int = 49 * 1024 * 1024) -> int:
    """Split a tar.gz into `model-NN` volumes (reference export_model.py:44-56)."""
    count = 0
    with open(tar_path, "rb") as src:
        while True:
            chunk = src.read(chunk_size)
            if not chunk:
                break
            with open(f"{output_base}-{count:02d}", "wb") as out:
                out.write(chunk)
            count += 1
    return count
