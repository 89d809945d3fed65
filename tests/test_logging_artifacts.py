"""RunLogger rich-artifact parity (reference distill.py:386-394).

The reference logs wandb Images, Histograms, and Html sentence tables on
every eval; RunLogger must route those to wandb when present and degrade
to JSONL artifact records otherwise.  A fake wandb module stands in for
the real one (air-gapped host).
"""

import json
import sys
import types

import numpy as np

from multimodal_dataset_distillation_tpu.utils.logging import RunLogger


class _Rec:
    def __init__(self, kind, payload):
        self.kind = kind
        self.payload = payload


def _fake_wandb(calls):
    m = types.ModuleType("wandb")
    m.Image = lambda x, caption=None: _Rec("image", x)
    m.Histogram = lambda v: _Rec("histogram", np.asarray(v))
    m.Html = lambda h: _Rec("html", h)

    def init(project=None, config=None, name=None):
        m.run = types.SimpleNamespace(name=name or "fake-run")
        return m.run

    m.init = init
    m.log = lambda d, step=None: calls.append((d, step))
    m.finish = lambda: calls.append(("finish", None))
    return m


def _read_jsonl(path):
    with open(path) as f:
        return [json.loads(line) for line in f]


def test_rich_artifacts_with_wandb(tmp_path, monkeypatch):
    calls = []
    monkeypatch.setitem(sys.modules, "wandb", _fake_wandb(calls))
    lg = RunLogger(name="t", disable_wandb=False, log_dir=str(tmp_path))

    img = np.zeros((8, 8, 3), np.uint8)
    png = tmp_path / "grid.png"
    png.write_bytes(b"fake")
    lg.log_image("Synthetic_Images/grid", str(png), step=3)
    lg.log_image("Synthetic_Images/raw", img, step=3)
    lg.log_histogram("Synthetic_Pixels", np.arange(10.0), step=3)
    lg.log_html("Synthetic_Sentences", "a<br>b", step=3, path="s.txt")
    lg.log({"Grand_Loss": 1.0}, step=4)
    lg.finish()

    kinds = {}
    for d, step in calls:
        if d == "finish":
            continue
        for k, v in d.items():
            if isinstance(v, _Rec):
                kinds[k] = v.kind
    assert kinds["Synthetic_Images/grid"] == "image"
    assert kinds["Synthetic_Images/raw"] == "image"
    assert kinds["Synthetic_Pixels"] == "histogram"
    assert kinds["Synthetic_Sentences"] == "html"

    recs = _read_jsonl(tmp_path / "t.jsonl")
    by_key = {k: v for r in recs for k, v in r.items() if k != "step"}
    assert by_key["Synthetic_Images/grid"]["path"].endswith("grid.png")
    assert by_key["Synthetic_Pixels"]["_type"] == "histogram"
    assert by_key["Synthetic_Pixels"]["n"] == 10
    assert by_key["Synthetic_Sentences"]["path"] == "s.txt"


def test_rich_artifacts_jsonl_fallback(tmp_path):
    lg = RunLogger(name="t2", disable_wandb=True, log_dir=str(tmp_path))
    lg.log_image("g", np.zeros((4, 4, 3)), step=0)
    lg.log_histogram("h", [1.0, 2.0], step=0)
    lg.log_html("s", "x<br>y", step=0)
    lg.finish()
    recs = _read_jsonl(tmp_path / "t2.jsonl")
    types_seen = {k: v["_type"] for r in recs for k, v in r.items()
                  if isinstance(v, dict)}
    assert types_seen == {"g": "image", "h": "histogram", "s": "html"}
