"""Resumable batch driver (SURVEY.md §5 "Checkpoint / resume": decode
jobs are short and stateless, so resume granularity is the file — a
killed 1024-image job skips completed files on restart).

The manifest is a JSONL append-only log: one record per completed file
with its output path and content digest. Appends are atomic at the OS
level (single short write), so a crash mid-batch loses at most the
in-flight record."""

from __future__ import annotations

import hashlib
import json
import os
import time
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..config import DEFAULT_CONFIG, DecodeConfig


def _digest(data: bytes) -> str:
    return hashlib.sha256(data).hexdigest()[:16]


def load_manifest(path: str) -> Dict[str, str]:
    """input digest -> output path for completed entries."""
    done: Dict[str, str] = {}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue  # torn tail record from a crash
                if rec.get("status") == "ok":
                    done[rec["digest"]] = rec["output"]
    return done


def run_batch_job(
    inputs: Sequence[str],
    output_dir: str,
    manifest_path: Optional[str] = None,
    config: DecodeConfig = DEFAULT_CONFIG,
    chunk_size: int = 64,
    on_device: bool = False,
) -> Dict[str, int]:
    """Decode `inputs` (JPEG file paths) into .npy rasters under
    `output_dir`, resuming from the manifest. Returns counters."""
    import tpujpeg

    os.makedirs(output_dir, exist_ok=True)
    if manifest_path is None:
        manifest_path = os.path.join(output_dir, "manifest.jsonl")
    done = load_manifest(manifest_path)

    counters = {"completed": 0, "skipped": 0, "failed": 0}
    mf = open(manifest_path, "a")

    pending: List[tuple] = []  # (path, digest, bytes)
    for path in inputs:
        with open(path, "rb") as f:
            data = f.read()
        dg = _digest(data)
        if dg in done:
            counters["skipped"] += 1
            continue
        pending.append((path, dg, data))

    for lo in range(0, len(pending), chunk_size):
        chunk = pending[lo : lo + chunk_size]
        datas = [c[2] for c in chunk]
        if on_device:
            # Pipelined: host prep of the next sub-chunks overlaps the
            # device decode (same BatchResult contract).
            res = tpujpeg.decode_batch_pipelined(
                datas, config, chunk_size=min(chunk_size, 64)
            )
        else:
            res = tpujpeg.decode_batch(datas, config)
        for slot, (path, dg, _) in enumerate(chunk):
            if slot in res.errors:
                counters["failed"] += 1
                rec = {
                    "status": "error",
                    "digest": dg,
                    "input": path,
                    "error": str(res.errors[slot]),
                    "ts": time.time(),
                }
            else:
                out_path = os.path.join(
                    output_dir,
                    os.path.splitext(os.path.basename(path))[0]
                    + f".{dg[:8]}.npy",
                )
                np.save(out_path, np.asarray(res.images[slot]))
                counters["completed"] += 1
                rec = {
                    "status": "ok",
                    "digest": dg,
                    "input": path,
                    "output": out_path,
                    "ts": time.time(),
                }
            mf.write(json.dumps(rec) + "\n")
            mf.flush()
    mf.close()
    return counters
