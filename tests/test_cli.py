"""CLI end-to-end smoke: the command surface had no coverage while its
ray-init plumbing was refactored through _ray_up — each command runs in
a real subprocess (its own Ray session, its own shutdown path)."""

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd):
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.run(
        [sys.executable, "-m", "auctus_ray.cli", *args],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=300,
    )


def test_cli_end_to_end(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    shutil.copy("/root/testdata/sf0.001/region.parquet", src)
    shutil.copy("/root/testdata/sf0.001/nation.parquet", src)

    # sniff (non-Ray path: exercises the guarded finally block too)
    r = _run(["ingest", str(src / "region.parquet")], str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout.splitlines()[-1])["format"] == "parquet"

    # discover -> profile -> persistent sketch catalog
    r = _run(
        ["discover", "--root", str(src), "--catalog", "cat", "--no-sample"],
        str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "profiled 2" in r.stdout

    # catalog join search over the persisted sketches
    r = _run(
        ["catalog-joinsearch", "--catalog", "cat",
         "--input", str(src / "nation.parquet"), "--column", "n_name",
         "-k", "5"],
        str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    hits = json.loads(r.stdout.splitlines()[-1])
    assert hits[0]["dataset_id"] == "localdir.nation"
    assert hits[0]["containment"] == 1.0

    # combined augmentation search
    r = _run(
        ["catalog-augsearch", "--catalog", "cat",
         "--input", str(src / "nation.parquet"), "-k", "4"],
        str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rows = json.loads(r.stdout.splitlines()[-1])
    assert {x["aug_type"] for x in rows} == {"join", "union"}

    # profile document JSON
    r = _run(
        ["profile-doc", "--input", str(src / "region.parquet"),
         "--no-sample"],
        str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    doc = json.loads(r.stdout)
    assert doc["nb_rows"] == 5
