"""Resumable batch driver (SURVEY.md §5 checkpoint/resume)."""

import json
import os

import numpy as np

from corpus import make_jpeg, pil_decode

from tpujpeg.parallel import manifest as manifest_lib


def _write_corpus(tmp_path, n=5):
    paths = []
    for i in range(n):
        p = tmp_path / f"img{i}.jpg"
        p.write_bytes(make_jpeg(64, 48, seed=i, subsampling=2))
        paths.append(str(p))
    return paths


def test_batch_job_completes_and_resumes(tmp_path):
    paths = _write_corpus(tmp_path)
    out = str(tmp_path / "out")
    c1 = manifest_lib.run_batch_job(paths, out)
    assert c1 == {"completed": 5, "skipped": 0, "failed": 0}

    # Outputs decode correctly.
    outs = sorted(os.listdir(out))
    npys = [f for f in outs if f.endswith(".npy")]
    assert len(npys) == 5
    ref = pil_decode(open(paths[0], "rb").read())
    first = [f for f in npys if f.startswith("img0.")][0]
    np.testing.assert_array_equal(np.load(os.path.join(out, first)), ref)

    # Second run: everything skipped.
    c2 = manifest_lib.run_batch_job(paths, out)
    assert c2 == {"completed": 0, "skipped": 5, "failed": 0}


def test_batch_job_resumes_after_partial_manifest(tmp_path):
    paths = _write_corpus(tmp_path)
    out = str(tmp_path / "out")
    mpath = str(tmp_path / "out" / "manifest.jsonl")
    manifest_lib.run_batch_job(paths[:2], out)
    # Simulate a crash with a torn trailing record.
    with open(mpath, "a") as f:
        f.write('{"status": "ok", "dig')
    c = manifest_lib.run_batch_job(paths, out)
    assert c["skipped"] == 2 and c["completed"] == 3


def test_batch_job_isolates_corrupt_file(tmp_path):
    paths = _write_corpus(tmp_path, n=2)
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"not a jpeg at all")
    out = str(tmp_path / "out")
    c = manifest_lib.run_batch_job(paths + [str(bad)], out)
    assert c == {"completed": 2, "skipped": 0, "failed": 1}
    recs = [
        json.loads(l)
        for l in open(os.path.join(out, "manifest.jsonl"))
        if l.strip()
    ]
    assert sum(r["status"] == "error" for r in recs) == 1


def test_batch_job_on_device_path(tmp_path):
    paths = _write_corpus(tmp_path, n=3)
    out = str(tmp_path / "out")
    c = manifest_lib.run_batch_job(paths, out, on_device=True)
    assert c == {"completed": 3, "skipped": 0, "failed": 0}
    import glob

    f = sorted(glob.glob(os.path.join(out, "img0.*.npy")))[0]
    np.testing.assert_array_equal(
        np.load(f), pil_decode(open(paths[0], "rb").read())
    )
