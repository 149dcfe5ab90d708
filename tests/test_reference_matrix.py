"""The one-command reproduction harness (scripts/run_reference_matrix.py)
must keep emitting the reference's exact output.csv schema and a
BASELINE side-by-side — golden-schema + end-to-end smoke tests so the
harness can't rot while the real datasets remain unavailable."""

import csv
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the reference's committed result schema, output.csv:1 — byte-exact
REFERENCE_HEADER = (
    "Model,Mode,Percentage,Hit Ratio@10,Precision@10,Recall@10,NDCG@10,"
    "Hit Ratio@20,Precision@20,Recall@20,NDCG@20,"
    "Hit Ratio@40,Precision@40,Recall@40,NDCG@40"
)


def test_header_matches_reference_schema():
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import run_reference_matrix as m

    assert m.HEADER == REFERENCE_HEADER


def test_baseline_rows_match_baseline_md():
    """Spot-check the hardcoded side-by-side numbers against BASELINE.md."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import run_reference_matrix as m

    assert m.BASELINE_ROWS[("HGNN", "cold_start", 1)][2] == 0.20149
    assert m.BASELINE_ROWS[("SGL", "missing", 10)][3] == 0.25358
    text = open(os.path.join(REPO, "BASELINE.md")).read()
    for key, vals in m.BASELINE_ROWS.items():
        assert str(vals[2]) in text, (key, vals)


def test_one_cell_end_to_end(tmp_path):
    """Run a single synthetic cold_start cell through the real harness
    CLI and validate the artifacts it writes."""
    out = str(tmp_path / "matrix")
    env = dict(os.environ)
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_reference_matrix.py"),
         "--dataset", "synthetic", "--models", "LightGCN",
         "--experiments", "cold_start", "--max_epoch", "2", "--out", out,
         "--force_cpu", "2"],
        capture_output=True, text=True, timeout=300, env=env, cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    with open(os.path.join(out, "output.csv")) as f:
        rows = list(csv.reader(f))
    assert ",".join(rows[0]) == REFERENCE_HEADER
    assert rows[1][0] == "LightGCN" and rows[1][1] == "cold_start"
    # 12 metric cells, all parseable and in [0, 1]
    metrics = [float(v) for v in rows[1][3:]]
    assert len(metrics) == 12 and all(0.0 <= v <= 1.0 for v in metrics)
    md = open(os.path.join(out, "RESULTS.md")).read()
    assert "| LightGCN | cold_start | 1 |" in md
