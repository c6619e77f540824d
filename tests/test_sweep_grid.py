"""tools/sweep_grid.py — the Results-grid campaign harness (VERDICT r4
missing #3). Formatting and cell bookkeeping are unit-tested here; the
full campaign is exercised on hardware (docs/quality_evidence.md)."""

import json
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from tools.sweep_grid import cell_key, format_csv, format_markdown  # noqa: E402


def _cell(loss, k, d, g, fid, is_):
    return {"loss": loss, "k": k, "lr_dis": d, "lr_gen": g, "fid": fid,
            "is": is_, "loss_gen": 0.1, "loss_dis": -0.2, "e_kxx": 0.5,
            "steps": 100, "seconds": 1.0}


def test_format_markdown_blocks_and_best_cell():
    lr = [2e-4, 5e-4]
    cells = {}
    for i, (d, g) in enumerate([(a, b) for a in lr for b in lr]):
        cells[cell_key("rep", 64, d, g)] = _cell("rep", 64, d, g,
                                                 10.0 - i, 5.0 + i)
    md = format_markdown(cells, ["rep"], [64], lr, lr, "random-feature")
    assert "## loss `rep`, k = 64" in md
    # best cell is the last one (fid 7.0) at lr_D=5e-4, lr_G=5e-4
    assert "**Best `rep` cell:** FID 7.00" in md
    assert "lr_D=0.0005" in md
    # missing cells render as em-dash
    md2 = format_markdown({}, ["rep"], [64], lr, lr, "x")
    assert "—" in md2


def test_format_csv_sorted_rows():
    cells = {cell_key("rmb", 32, 1e-3, 2e-4): _cell("rmb", 32, 1e-3,
                                                    2e-4, 3.0, 2.0),
             cell_key("rep", 32, 2e-4, 2e-4): _cell("rep", 32, 2e-4,
                                                    2e-4, 4.0, 1.0)}
    csv = format_csv(cells)
    lines = csv.strip().splitlines()
    assert lines[0].startswith("loss,k,lr_dis,lr_gen,fid,is")
    assert lines[1].startswith("rep,")  # sorted by loss first
    assert lines[2].startswith("rmb,")


def test_cells_jsonl_resume_roundtrip(tmp_path):
    """cells.jsonl lines parse back into the same key space the harness
    uses for resume."""
    c = _cell("rep", 64, 5e-4, 2e-4, 1.23, 4.56)
    p = tmp_path / "cells.jsonl"
    with open(p, "a") as f:
        f.write(json.dumps(c) + "\n")
    with open(p) as f:
        back = json.loads(f.readline())
    assert cell_key(back["loss"], back["k"], back["lr_dis"],
                    back["lr_gen"]) == cell_key("rep", 64, 5e-4, 2e-4)


@pytest.mark.parametrize("flag", ["--help"])
def test_cli_parses(flag):
    r = subprocess.run([sys.executable,
                        os.path.join(_REPO, "tools", "sweep_grid.py"),
                        flag], capture_output=True, text=True, timeout=120)
    assert r.returncode == 0
    assert "lr_D x lr_G x act_k" in r.stdout or "grid" in r.stdout